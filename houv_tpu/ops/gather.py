"""Fast exact row gather for TPU: one-hot matmul with a hi/lo bf16 split.

XLA's native row gather (``take_along_axis`` along axis 1) lowers poorly on
TPU for the solver's shapes — ~16 ms for (1024, 2048) indices into
(·, 2048, 3) tables (BENCH_NOTES r2/r3). Expressing the gather as a
``one_hot(idx) @ table`` contraction instead runs in ~5 ms: the one-hot is
fused into the dot (never materialized) and the contraction maps onto the
matmul path.

A single bf16 pass would round the gathered values to 8 mantissa bits, so
the table is split into two bf16 planes — hi = bf16(x), lo = bf16(x - hi) —
concatenated in the (lane-padded anyway) channel dim: ONE matmul of
identical cost gathers both planes and ``hi + lo`` reconstructs f32 to
~2^-17 relative. NOTE: XLA's excess-precision folding rewrites
``x - f32(bf16(x))`` to zero, killing the lo plane — the optimization
barrier around ``hi`` is load-bearing.

Used by the HOUV solver's scatter-free objective (solvers/houv.py), where
the two row gathers were the single largest step cost after the NN kernel
(VERDICT r2 next-round #1); replaces the reference's post-kernel index use
(utils/metrics/CD/chamfer3D/chamfer3D.cu returns indices; the CUDA solver
path regathers with them, registration/train_utils.py:417-439).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gather_rows_onehot(table: Array, idx: Array) -> Array:
    """(B, M, C) table × (B, L) int32 row indices -> (B, L, C) f32, exact
    to ~2^-17 relative (hi/lo bf16 reconstruction)."""
    b, m, c = table.shape
    table = table.astype(jnp.float32)
    # barrier: prevents XLA from folding (table - f32(hi)) to 0 under
    # --xla_allow_excess_precision (bf16->f32->bf16 round-trip elision)
    hi = jax.lax.optimization_barrier(table.astype(jnp.bfloat16))
    lo = (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    planes = jnp.concatenate([hi, lo], axis=-1)          # (B, M, 2C) bf16
    onehot = (
        idx[..., None] == jnp.arange(m, dtype=idx.dtype)[None, None, :]
    ).astype(jnp.bfloat16)                               # fused into the dot
    out = jnp.einsum(
        "blm,bmc->blc", onehot, planes,
        preferred_element_type=jnp.float32,
    )
    return out[..., :c] + out[..., c:]


# One-hot kNN-neighbor gathers start beating take_along_axis well below
# this, but each one-hot dot is extra compiled code; gate to the hot sizes.
_EDGE_ONEHOT_MIN_MACS = 1 << 27


def gather_edge_features(x: Array, idx: Array) -> Array:
    """kNN neighbor gather: (B, U, C) × (B, M, k) int -> (B, M, k, C).

    On TPU at large volumes the gather runs as a one-hot matmul: XLA's
    row gather + its scatter-add adjoint were the top non-matmul ops in
    the vrcnet_knn step profile (22.8 ms fwd+bwd at (16, 3072, k16, c64)
    vs 8.0 for the one-hot dot — BENCH_NOTES r3). bf16 tables take a
    single exact plane; f32 tables go through the hi/lo split
    (``gather_rows_onehot``, ~2^-17 relative). Elsewhere (CPU, small
    sizes) it stays ``take_along_axis``.
    """
    b, m, k = idx.shape
    u, c = x.shape[1], x.shape[2]
    flat_idx = idx.reshape(b, m * k).astype(jnp.int32)
    macs = b * m * k * u * c
    if jax.default_backend() == "tpu" and macs >= _EDGE_ONEHOT_MIN_MACS:
        if x.dtype == jnp.bfloat16:
            onehot = (
                flat_idx[..., None] == jnp.arange(u, dtype=jnp.int32)
            ).astype(jnp.bfloat16)
            out = jnp.einsum(
                "blm,bmc->blc", onehot, x,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)  # exact: one bf16 value per output row
        else:
            out = gather_rows_onehot(x, flat_idx).astype(x.dtype)
    else:
        out = jnp.take_along_axis(x, flat_idx[..., None], axis=1)
    return out.reshape(b, m, k, c)


def gather_rows(table: Array, idx: Array, use_onehot: bool | None = None
                ) -> Array:
    """Row gather with backend dispatch: the one-hot matmul form on TPU,
    plain ``take_along_axis`` elsewhere (CPU gathers are fast; the one-hot
    contraction is not). table (B, M, C), idx (B, L) -> (B, L, C)."""
    if use_onehot is None:
        use_onehot = jax.default_backend() == "tpu"
    if use_onehot:
        return gather_rows_onehot(table, idx)
    return jnp.take_along_axis(
        table, idx[..., None].astype(jnp.int32), axis=1
    )
