"""A/B the HOUV solver's per-dispatch pair batch on the real chip.

The flagship bench solves 16 pairs per dispatch (B*K = 1024 replica
rows through the fused NN kernel). If the step is pipeline-bound rather
than FLOP-bound (BENCH_NOTES r3 "NN-select" section), a larger per-
dispatch batch may amortize fixed per-pass overhead.

Usage: python scripts/bench_houv_batch.py [n_pairs ...]
Defaults: 8 16 32. Prints pairs/s for each (kernel=64, 500 steps,
1 angle pass — same settings as bench.py's flagship entry).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.solvers import HOUVConfig
from houv_tpu.solvers.houv import houv_solve_chunked
from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    cfg = HOUVConfig(kernel=64, steps=500, angle_passes=1)
    for n_pairs in sizes:
        data = synthesize_registration_pairs(
            n_pairs, n_points=2048, max_angle_deg=45.0, seed=2021
        )
        src = jnp.asarray(data["rotated_src"])
        tgt = jnp.asarray(data["rotated_tgt"])
        out = houv_solve_chunked(src, tgt, jax.random.PRNGKey(2021), cfg)
        float(out["rmse"].sum())  # sync (compile + warm path)
        t0 = time.perf_counter()
        out = houv_solve_chunked(src, tgt, jax.random.PRNGKey(1), cfg)
        float(out["rmse"].sum())
        dt = time.perf_counter() - t0
        print(f"n_pairs={n_pairs:3d}  {dt:7.2f}s  "
              f"{n_pairs / dt:6.3f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
