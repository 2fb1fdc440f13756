"""Generate the candidate-pool rescorer training set on chip.

For each structured-fixture pair: solve at the gate protocol keeping all
restarts, rotation-NMS-extract n_cand candidates, move src by each, and
label by GT rotation error (<5 deg = aligned). The saved rows are exactly
the distribution the rescoring classifier sees at inference
(solvers/rescore.py pipeline stages 1-3).

Usage: python scripts/make_rescore_dataset.py [n_pairs] [out.npz]
Env: RESCORE_CANDS (default 8), RESCORE_ANGLE (default 10),
     RESCORE_SEED (default 23 — the gate fixture uses seed 11).
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.solvers import HOUVConfig
from houv_tpu.solvers.rescore import (
    apply_candidates,
    extract_candidates,
    houv_candidate_pools,
    oracle_logits,
)
from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    out = sys.argv[2] if len(sys.argv) > 2 else "log/rescore_pool_train.npz"
    n_cand = int(os.environ.get("RESCORE_CANDS", "8"))
    angle_deg = float(os.environ.get("RESCORE_ANGLE", "10"))
    seed = int(os.environ.get("RESCORE_SEED", "23"))

    data = synthesize_registration_pairs(
        n, n_points=2048, max_angle_deg=90.0, max_trans=0.5, seed=seed,
        shape_mode="structured", rot_mix=True,
    )
    cfg = HOUVConfig(
        kernel=64, steps=500, angle_passes=4, retry_mode="always",
        nn_refresh_schedule=((300, 5, 4), (150, 5, 2), (50, 2)),
    )
    src_all = jnp.asarray(data["rotated_src"])
    tgt_all = jnp.asarray(data["rotated_tgt"])
    gt_all = jnp.asarray(data["transforms"])

    rows_moved, rows_tgt, rows_lbl, rows_err, rows_loss, rows_pair = \
        [], [], [], [], [], []
    chunk = 32
    t0 = time.perf_counter()
    for s in range(0, n, chunk):
        src, tgt = src_all[s:s + chunk], tgt_all[s:s + chunk]
        gt = gt_all[s:s + chunk]
        pools = houv_candidate_pools(
            src, tgt, jax.random.fold_in(jax.random.PRNGKey(seed), s), cfg)
        cand_loss, cand_r, cand_t = extract_candidates(
            pools[0], pools[1], pools[2], n_cand, angle_deg)
        moved = apply_candidates(src, cand_r, cand_t)  # (B, C, N, 3)
        err = -np.asarray(oracle_logits(cand_r, gt))   # (B, C) deg
        b, c = err.shape
        rows_moved.append(np.asarray(moved, np.float32).reshape(
            b * c, *moved.shape[2:]))
        rows_tgt.append(np.repeat(np.asarray(tgt, np.float32), c, axis=0))
        rows_lbl.append((err < 5.0).astype(np.float32).reshape(-1))
        rows_err.append(err.reshape(-1))
        rows_loss.append(np.asarray(cand_loss, np.float32).reshape(-1))
        rows_pair.append(np.repeat(np.arange(s, s + b), c))
        print(f"pairs {s}..{s + b}: {time.perf_counter() - t0:.0f}s "
              f"pos-rate {np.mean(rows_lbl[-1]):.3f}", flush=True)

    arrays = {
        "src_moved": np.concatenate(rows_moved),
        "tgt": np.concatenate(rows_tgt),
        "lbl": np.concatenate(rows_lbl),
        "rot_err": np.concatenate(rows_err),
        "cand_loss": np.concatenate(rows_loss),
        "pair": np.concatenate(rows_pair),
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez_compressed(out, **arrays)
    lbl = arrays["lbl"]
    print(f"saved {out}: {len(lbl)} rows, {lbl.mean() * 100:.1f}% positive,"
          f" wall {time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
