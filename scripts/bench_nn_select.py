"""Chip micro-bench: nn_select_pallas (matched-coordinate emit) vs the
chamfer_indices + one-hot-gather path, at the solver's flagship shape
(B=16 pairs x K=64 restarts, 2048x2048 points).

Usage: python scripts/bench_nn_select.py [tile]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bsz, k, n, m = 16, 64, 2048, 2048
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (bsz, n, 3), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), (bsz * k, m, 3))

    from houv_tpu.ops.chamfer import chamfer_indices, nn_select_pallas
    from houv_tpu.ops.gather import gather_rows

    @jax.jit
    def select_loop(a, b):
        def body(i, acc):
            c1, c2 = nn_select_pallas(a + 0.0 * acc, b, tile=tile)
            return acc + c1.sum() + c2.sum()

        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

    def make_gather_loop(mxu):
        @jax.jit
        def gather_loop(a, b):
            a_rep = jnp.broadcast_to(
                a[:, None], (bsz, k, n, 3)
            ).reshape(bsz * k, n, 3)

            def body(i, acc):
                i1, i2 = chamfer_indices(a_rep + 0.0 * acc, b,
                                         mxu_scores=mxu)
                c1 = gather_rows(b, i1)
                c2 = gather_rows(a_rep, i2)
                return acc + c1.sum() + c2.sum()

            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

        return gather_loop

    def make_idx_loop(mxu):
        @jax.jit
        def idx_loop(a, b):
            a_rep = jnp.broadcast_to(
                a[:, None], (bsz, k, n, 3)
            ).reshape(bsz * k, n, 3)

            def body(i, acc):
                i1, i2 = chamfer_indices(a_rep + 0.0 * acc.astype(
                    jnp.float32), b, mxu_scores=mxu)
                return acc + i1.sum() + i2.sum()

            return jax.lax.fori_loop(0, 10, body, jnp.int32(0))

        return idx_loop

    @jax.jit
    def idx_shared_loop(a, b):
        def body(i, acc):
            i1, i2 = chamfer_indices(a + 0.0 * acc.astype(jnp.float32), b)
            return acc + i1.sum() + i2.sum()

        return jax.lax.fori_loop(0, 10, body, jnp.int32(0))

    @jax.jit
    def gather_shared_loop(a, b):
        def body(i, acc):
            i1, i2 = chamfer_indices(a + 0.0 * acc, b)
            c1 = gather_rows(b, i1)
            c2 = gather_rows(
                a, i2.reshape(bsz, k * m)
            ).reshape(bsz * k, m, 3)
            return acc + c1.sum() + c2.sum()

        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

    for name, f in (
        ("idx-diff", make_idx_loop(False)),
        ("idx-shared", idx_shared_loop),
        ("idx-mxu", make_idx_loop(True)),
        ("select", select_loop),
        ("gather-diff", make_gather_loop(False)),
        ("gather-shared", gather_shared_loop),
        ("gather-mxu", make_gather_loop(True)),
    ):
        t0 = time.perf_counter()
        r = f(a, b)
        sync(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(f(a, b))
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{name}: {ms:.2f} ms/pass (compile+first {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
