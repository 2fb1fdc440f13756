"""Op-level device trace of the HOUV solver segment (flagship metric).

Runs one 100-step houv_pass_segment under jax.profiler and aggregates
device op times (scripts/trace_agg.py). Complements profile_houv.py's
ablation timing with exact per-op attribution.

Usage: python scripts/profile_houv_trace.py [n_pairs] [trace_dir]
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
from houv_tpu.solvers.houv import (
    houv_opt_init,
    houv_pass_segment,
    init_params,
)
from houv_tpu.utils.cache import enable_compilation_cache
from trace_agg import aggregate_trace

enable_compilation_cache()


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/houv_trace"
    data = synthesize_registration_pairs(
        n_pairs, n_points=2048, max_angle_deg=45.0, seed=2021
    )
    src = jnp.asarray(data["rotated_src"])
    tgt = jnp.asarray(data["rotated_tgt"])
    cfg = HOUVConfig(kernel=64, steps=500, angle_passes=1)
    params = init_params(jax.random.PRNGKey(0), n_pairs, cfg.kernel)
    opt_state = houv_opt_init(params, cfg)

    p, o = houv_pass_segment(src, tgt, params, opt_state, 0, cfg, 100)
    sync(p["v_c"])
    t0 = time.perf_counter()
    p, o = houv_pass_segment(src, tgt, params, opt_state, 0, cfg, 100)
    sync(p["v_c"])
    print(f"steady state {(time.perf_counter() - t0) / 100 * 1e3:.2f} ms/step "
          f"({n_pairs * cfg.kernel} replicas, 2048 pts)", flush=True)

    with jax.profiler.trace(trace_dir):
        p, o = houv_pass_segment(src, tgt, params, opt_state, 0, cfg, 100)
        sync(p["v_c"])
    # NOTE: per-op totals below are over 100 steps — divide by 100.
    aggregate_trace(trace_dir)


if __name__ == "__main__":
    main()
