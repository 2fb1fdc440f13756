"""Profile the HOUV solver step composition on the real chip.

Times houv_pass_segment (the 100-step jitted segment bench.py exercises)
and then ablates pieces to attribute the per-step cost:
  - full objective (gather mode, trunc)
  - NN-indices only (chamfer_indices fwd, no loss rebuild)
  - loss rebuild only (indices precomputed, so gathers+einsums+trim+Adam)

Usage: python scripts/profile_houv.py [n_pairs]
"""

import sys
import time

sys.path.insert(0, ".")

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

enable_compilation_cache()


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    data = synthesize_registration_pairs(
        n_pairs, n_points=2048, max_angle_deg=45.0, seed=2021
    )
    src = jnp.asarray(data["rotated_src"])
    tgt = jnp.asarray(data["rotated_tgt"])
    cfg = HOUVConfig(kernel=64, steps=500, angle_passes=1)
    params = init_params(jax.random.PRNGKey(0), n_pairs, cfg.kernel)
    opt_state = houv_opt_init(params, cfg)

    # full segment (100 steps)
    p, o = houv_pass_segment(src, tgt, params, opt_state, 0, cfg, 100)
    sync(p["v_c"])
    t0 = time.perf_counter()
    p, o = houv_pass_segment(src, tgt, params, opt_state, 0, cfg, 100)
    sync(p["v_c"])
    ms = (time.perf_counter() - t0) / 100 * 1e3
    print(f"full step: {ms:.2f} ms  "
          f"({n_pairs * cfg.kernel} replicas, 2048 pts)", flush=True)

    # NN kernel alone, amortized over an in-jit loop
    from houv_tpu.ops.chamfer import chamfer_indices

    bk = n_pairs * cfg.kernel
    a = jnp.tile(tgt[:, None], (1, cfg.kernel, 1, 1)).reshape(bk, 2048, 3)
    b = jnp.tile(src[:, None], (1, cfg.kernel, 1, 1)).reshape(bk, 2048, 3)

    @jax.jit
    def nn_loop(a, b):
        def body(i, acc):
            i1, i2 = chamfer_indices(a + 0.0 * acc, b)
            return acc + i1.sum() + i2.sum()

        return jax.lax.fori_loop(0, 20, body, jnp.int32(0))

    sync(nn_loop(a, b))
    t0 = time.perf_counter()
    sync(nn_loop(a, b))
    print(f"NN kernel (both dirs): {(time.perf_counter() - t0) / 20 * 1e3:.2f}"
          " ms", flush=True)

    # profiler trace of the full segment
    if len(sys.argv) > 2 and sys.argv[2] == "trace":
        with jax.profiler.trace("/tmp/houv_trace"):
            p, o = houv_pass_segment(src, tgt, params, opt_state, 0, cfg, 20)
            sync(p["v_c"])
        print("trace written to /tmp/houv_trace", flush=True)


if __name__ == "__main__":
    main()
