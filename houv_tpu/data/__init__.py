from houv_tpu.data.mvp import (
    MVPRegistrationDataset,
    MVPCompletionDataset,
    ModelNetDataset,
    load_h5,
    random_pose_np,
    synthesize_registration_pairs,
    synthesize_completion_set,
    synthesize_modelnet_set,
    write_mvp_rg_fixture,
    write_mvp_cp_fixture,
)
from houv_tpu.data.pipeline import batch_iterator, shard_ranges

__all__ = [
    "MVPRegistrationDataset",
    "MVPCompletionDataset",
    "ModelNetDataset",
    "load_h5",
    "random_pose_np",
    "synthesize_registration_pairs",
    "synthesize_completion_set",
    "synthesize_modelnet_set",
    "write_mvp_rg_fixture",
    "write_mvp_cp_fixture",
    "batch_iterator",
    "shard_ranges",
]
