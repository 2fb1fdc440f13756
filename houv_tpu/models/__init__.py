"""Model registry.

Replaces the reference's string-keyed importlib dispatch
(``importlib.import_module('.%s' % args.model_name, 'models')``,
registration/train.py:64, completion/train.py:57) with an explicit
registry keyed by the same model_name strings the reference configs use.
"""

from houv_tpu.models.pcn import PCN, PCNEncoder, PCNEncoderLabel, PCNDecoder
from houv_tpu.models.ecg import ECG, EFEncoder, ECGDecoder, DenseConv
from houv_tpu.models.vrcnet import (
    VRCNet,
    SAModule,
    SKSAModule,
    SKNResUnit,
    SASKNResEncoder,
    MSAPSKNDecoder,
    Folding,
    LinearResBlock,
)
from houv_tpu.models.vrcnet_knn import VRCNetKNN, KNNDecoder
from houv_tpu.models.voxelnet import Asymm3DSpconv
from houv_tpu.models.dcp import DCP, DGCNN, Pointer
from houv_tpu.models.deepgmr import DeepGMR, GMRBackbone, get_rri
from houv_tpu.models.idam import IDAM, GNN
from houv_tpu.models.alignment import (
    AlignmentClassifier,
    VoxAsym,
    alignment_bce_loss,
    make_aligned_pairs,
)
from houv_tpu.models.embedding import (
    InstanceEmbedding,
    TransformerRegressor,
    TransformerCompletion,
    PCNTransformer,
    triplet_loss,
)
from houv_tpu.models.pointnet2 import (
    PointSAModule,
    PointFPModule,
    points_sampler,
)
from houv_tpu.models.voxelnet import SparseBasicBlock

_REGISTRY = {
    # completion (reference completion/models/*.py)
    "pcn": PCN,
    "ecg": ECG,
    "vrcnet": VRCNet,
    "vrcnet_knn": VRCNetKNN,
    # registration (reference registration/models/*.py)
    "dcp": DCP,
    "deepgmr": DeepGMR,
    "idam": IDAM,
    # experimental / preprocessing models
    "alignment_spconv": AlignmentClassifier,   # registration/models/spconv.py
    "voxel_asym": VoxAsym,                     # completion cfgs/spconv.yaml
    "transformer": TransformerCompletion,      # completion/models/transformer.py
    "model_embedding": InstanceEmbedding,      # completion/models/model_embedding.py
}


def get_model(name: str, **kwargs):
    """Instantiate a model by its reference config model_name."""
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
    return cls(**kwargs)


__all__ = [
    "get_model",
    "PCN", "ECG", "VRCNet", "VRCNetKNN", "DCP", "DeepGMR", "IDAM",
    "PCNEncoder", "PCNEncoderLabel", "PCNDecoder", "EFEncoder", "ECGDecoder",
    "DenseConv", "SAModule", "SKSAModule", "SKNResUnit", "SASKNResEncoder",
    "MSAPSKNDecoder", "Folding", "LinearResBlock", "KNNDecoder",
    "Asymm3DSpconv", "DGCNN", "Pointer", "GMRBackbone", "get_rri", "GNN",
    "AlignmentClassifier", "VoxAsym", "alignment_bce_loss",
    "make_aligned_pairs", "InstanceEmbedding", "TransformerRegressor",
    "PCNTransformer", "triplet_loss", "PointSAModule", "PointFPModule",
    "points_sampler", "SparseBasicBlock",
]
