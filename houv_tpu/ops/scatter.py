"""Batched scatter-add as MXU matmuls — the chamfer backward's hot op.

XLA lowers ``zeros.at[idx].add(vals)`` on TPU to a serialized scatter; for
the chamfer gradient (2048 updates × thousands of batch rows × every solver
step) that dominates the step time. This kernel instead builds one-hot
tiles on the fly (a VPU compare against an iota) and contracts them with
the update values on the MXU:

    out[b, m, :] = Σ_{i : idx[b, i] == m} vals[b, i, :]

which is exactly the transpose of a batched gather — the semantics of the
reference's atomicAdd-based NmDistanceGradKernel scatter
(utils/metrics/CD/chamfer3D/chamfer3D.cu:155-186).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_TILE_M = 512  # one-hot tile: (N × TILE_M) bf16 must fit VMEM


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _scatter_kernel(idx_ref, vals_ref, out_ref):
    """One batch row per grid step.

    idx_ref (1, N, 1), vals_ref (1, N, C), out_ref (1, TILE_M, C)."""
    tile_m = out_ref.shape[1]
    base = pl.program_id(1) * tile_m
    n = idx_ref.shape[1]
    idx = idx_ref[0, :, 0]                                 # (N,)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, tile_m), 1) + base
    # bf16 one-hot is exact (values 0/1) and halves VMEM + doubles MXU rate;
    # the f32 accumulator keeps the sum exact up to bf16 rounding of vals.
    oh = (idx[:, None] == cols).astype(jnp.bfloat16)       # (N, TILE_M)
    # (TILE_M, C) = ohᵀ @ vals, contraction over N on the MXU.
    out_ref[0, :, :] = jax.lax.dot_general(
        oh, vals_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gather_kernel(idx_ref, src_ref, out_ref):
    """One batch row per grid step: out[i] = src[idx[i]].

    idx_ref (1, TILE_N, 1), src_ref (1, M, C), out_ref (1, TILE_N, C)."""
    tile_n = out_ref.shape[1]
    m = src_ref.shape[1]
    idx = idx_ref[0, :, 0]                                  # (TILE_N,)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_n, m), 1)
    # f32 one-hot: the gathered values feed subtractions (diff = a - nb),
    # where bf16 rounding would corrupt small differences.
    oh = (idx[:, None] == cols).astype(jnp.float32)         # (TILE_N, M)
    out_ref[0, :, :] = jnp.dot(
        oh, src_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_matmul(src: Array, idx: Array,
                       interpret: bool = False) -> Array:
    """(B, M, C) × (B, N) int32 -> (B, N, C): out[b, i] = src[b, idx[b, i]].

    One-hot MXU matmul replacement for take_along_axis row gathers (XLA's
    TPU gather serializes per row). Values pass through bf16 (~0.4%
    rounding) — used on gradient paths where that is far below noise."""
    bsz, m, c = src.shape
    n = idx.shape[1]
    cp = 8
    tile_n = min(_TILE_M, _round_up(n, _LANE))
    np_ = _round_up(n, tile_n)

    idx_3d = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, np_ - n)),
                     constant_values=-1)[..., None]
    src_pad = jnp.pad(src.astype(jnp.float32), ((0, 0), (0, 0), (0, cp - c)))

    out = pl.pallas_call(
        _gather_kernel,
        grid=(bsz, np_ // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, 1), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, cp), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, cp), lambda bi, ni: (bi, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, np_, cp), jnp.float32),
        interpret=interpret,
    )(idx_3d, src_pad)
    return out[:, :n, :c]


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def scatter_add_matmul(idx: Array, vals: Array, m: int,
                       interpret: bool = False) -> Array:
    """(B, N) int32 × (B, N, C) -> (B, m, C) with out[b, i] = Σ vals at idx==i.

    Out-of-range indices are dropped (compare never matches). Values pass
    through bf16 on the MXU: ~0.4% relative rounding, well under gradient
    noise for every consumer (Adam steps)."""
    bsz, n = idx.shape
    c = vals.shape[-1]
    cp = 8  # lane-pad channels
    tile_m = min(_TILE_M, _round_up(m, _LANE))
    mp = _round_up(m, tile_m)

    idx_3d = idx.astype(jnp.int32)[..., None]  # (B, N, 1)
    vals_pad = jnp.pad(vals.astype(jnp.float32), ((0, 0), (0, 0), (0, cp - c)))

    out = pl.pallas_call(
        _scatter_kernel,
        grid=(bsz, mp // tile_m),
        in_specs=[
            pl.BlockSpec((1, n, 1), lambda bi, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cp), lambda bi, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, cp), lambda bi, mi: (bi, mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, mp, cp), jnp.float32),
        interpret=interpret,
    )(idx_3d, vals_pad)
    return out[:, :m, :c]
