"""Train the rescoring classifier on candidate-pool rows.

Consumes the npz from scripts/make_rescore_dataset.py, splits train/val
by PAIR (no leakage of a pair's candidates across the split), and fits
AlignmentTrainer. Checkpoints land in
log/alignment_spconv_cd_rescorer_pool/best_acc_network.ckpt — pass that
to scripts/rescore_gate.py.

Usage: python scripts/train_rescorer_pool.py [npz] [nepoch]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np

from houv_tpu.train.aux import AlignmentTrainer, PoolCandidateDataset
from houv_tpu.train.config import Config
from houv_tpu.utils.cache import enable_compilation_cache
from houv_tpu.utils.logging_utils import setup_logging

enable_compilation_cache()


def main():
    npz = sys.argv[1] if len(sys.argv) > 1 else "log/rescore_pool_train.npz"
    nepoch = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    flag = sys.argv[3] if len(sys.argv) > 3 else "rescorer_pool"

    z = np.load(npz)
    pairs = z["pair"]
    uniq = np.unique(pairs)
    val_pairs = set(uniq[:: max(len(uniq) // 10, 1)][:len(uniq) // 10 + 1])
    val_mask = np.isin(pairs, list(val_pairs))
    arrays = {k: z[k] for k in ("src_moved", "tgt", "lbl")}
    train_rows = {k: v[~val_mask] for k, v in arrays.items()}
    val_rows = {k: v[val_mask] for k, v in arrays.items()}
    print(f"{len(pairs)} rows -> train {len(train_rows['lbl'])} "
          f"(pos {train_rows['lbl'].mean():.3f}) / "
          f"val {len(val_rows['lbl'])} (pos {val_rows['lbl'].mean():.3f})")

    cfg = Config(
        model_name="alignment_spconv", dataset="mvp_rg", num_points=2048,
        batch_size=16, lr=1e-4, nepoch=nepoch, work_dir="log/",
        flag=flag, compute_dtype="bfloat16",
        epoch_interval_to_val=2, manual_seed=2021,
    )
    trainer = AlignmentTrainer(cfg)
    setup_logging(trainer.log_dir)
    train_ds = PoolCandidateDataset(train_rows, balance=True, augment=True)
    # val balanced too: on the raw 1:7 candidate distribution an always-
    # negative predictor scores 87% acc and would win best-ckpt selection
    val_ds = PoolCandidateDataset(val_rows, balance=True)
    trainer.fit(train_ds, val_ds)
    print("best ckpt:",
          os.path.join(trainer.log_dir, "best_acc_network.ckpt"))


if __name__ == "__main__":
    main()
