"""Chip probe of nn_refresh_schedule candidates at the bench protocol.

Same fixture and timing as bench.py's flagship metric (16 pairs, <=45deg,
kernel=64, 500 steps, 1 angle pass, shipped chunked API; second solve is
the timed one) so numbers are directly comparable to the flagship.

Usage: python scripts/bench_schedule.py "400:5:2,100:2" "300:8:4,150:4:2,50:2" ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.solvers import HOUVConfig
from houv_tpu.solvers.houv import evaluate_solution, houv_solve_chunked
from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def parse(s: str):
    if ":" not in s:
        return dict(nn_refresh=int(s))
    sched = tuple(tuple(int(v) for v in p.split(":")) for p in s.split(","))
    return dict(nn_refresh_schedule=sched)


def main():
    n_pairs = 16
    data = synthesize_registration_pairs(
        n_pairs, n_points=2048, max_angle_deg=45.0, seed=2021
    )
    src = jnp.asarray(data["rotated_src"])
    tgt = jnp.asarray(data["rotated_tgt"])
    gt = jnp.asarray(data["transforms"])
    for s in sys.argv[1:]:
        cfg = HOUVConfig(kernel=64, steps=500, angle_passes=1, **parse(s))
        out = houv_solve_chunked(src, tgt, jax.random.PRNGKey(2021), cfg)
        float(out["rmse"].sum())
        t0 = time.perf_counter()
        out = houv_solve_chunked(src, tgt, jax.random.PRNGKey(1), cfg)
        float(out["rmse"].sum())
        dt = time.perf_counter() - t0
        r_err, t_err = evaluate_solution(out["transform"], gt)
        re = np.asarray(r_err)
        print(
            "%-24s %6.2f pairs/s  rot med %5.2f mean %5.2f max %6.2f  "
            "trans mean %.4f" % (
                s, n_pairs / dt, np.median(re), re.mean(), re.max(),
                float(np.asarray(t_err).mean()),
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
