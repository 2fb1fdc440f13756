"""Chip A/B of HOUVConfig.nn_refresh: solver ms/step + quality.

Times a 100-step houv_pass_segment at the flagship shape for each
refresh cadence, then runs a full-budget solve on the structured fixture
and reports rotation-error stats — the knob is only shippable if the
lagged correspondences keep the gate numbers.

Usage: python scripts/bench_nn_refresh.py [n_pairs] [refresh ...]
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
from houv_tpu.solvers.houv import (
    evaluate_solution,
    houv_opt_init,
    houv_pass_segment,
    houv_solve_chunked,
    init_params,
)
from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    refreshes = [int(a) for a in sys.argv[2:]] or [1, 2, 4]
    data = synthesize_registration_pairs(
        n_pairs, n_points=2048, max_angle_deg=45.0, seed=2021
    )
    src = jnp.asarray(data["rotated_src"])
    tgt = jnp.asarray(data["rotated_tgt"])
    pose = jnp.asarray(data["transforms"])

    for refresh in refreshes:
        cfg = HOUVConfig(kernel=64, steps=500, angle_passes=1,
                         nn_refresh=refresh)
        params = init_params(jax.random.PRNGKey(0), n_pairs, cfg.kernel)
        opt_state = houv_opt_init(params, cfg)
        p, o = houv_pass_segment(src, tgt, params, opt_state, 0, cfg, 100)
        sync(p["v_c"])
        t0 = time.perf_counter()
        p, o = houv_pass_segment(src, tgt, params, opt_state, 0, cfg, 100)
        sync(p["v_c"])
        ms = (time.perf_counter() - t0) / 100 * 1e3
        print(f"refresh={refresh}: {ms:.2f} ms/step", flush=True)

        t0 = time.perf_counter()
        out = houv_solve_chunked(src, tgt, jax.random.PRNGKey(0), cfg)
        r_err, t_err = evaluate_solution(out["transform"], pose)
        r = np.asarray(r_err)
        wall = time.perf_counter() - t0
        print(
            f"refresh={refresh}: solve {wall:.1f}s "
            f"({n_pairs / wall:.3f} pairs/s 1-pass), rot med "
            f"{np.median(r):.2f} mean {r.mean():.2f} max {r.max():.2f}, "
            f"trans mean {float(jnp.mean(t_err)):.4f}, "
            f"rmse mean {float(jnp.mean(out['rmse'])):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
