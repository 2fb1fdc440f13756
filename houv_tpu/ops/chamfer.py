"""Chamfer distance (bidirectional nearest neighbor) — the framework's hottest op.

TPU-native replacement for the reference CUDA extension
(utils/metrics/CD/chamfer3D/chamfer3D.cu:12-155 ``NmDistanceKernel`` /
``NmDistanceGradKernel`` and the wrapper utils/metrics/CD/chamfer3D/
dist_chamfer_3D.py). Same contract: ``chamfer(a, b) -> (d1, d2, i1, i2)``
with d1[b,i] = min_j ||a[b,i]-b[b,j]||² (squared!), i1 the argmin, and the
gradient flowing only through the matched pairs.

Design (see /opt/skills/guides/pallas_guide.md):
- Forward is the O(N·M) part: a Pallas kernel tiles the query cloud into
  TILE-point blocks (the CUDA kernel streams 512-point shared-memory tiles;
  here the whole reference cloud sits in VMEM as a (3, M) coordinate-major
  tile and the (TILE, M) distance block never leaves VMEM).
- Distances are computed per-coordinate on the VPU:
  (ax-bx)² + (ay-by)² + (az-bz)² with ax:(TILE,1) against bx:(1,M) —
  avoiding a K=3 matmul that would waste the MXU's 128-wide contraction.
- Backward is O(N) gathers/scatter-adds in plain jnp (custom VJP), exactly
  the semantics of ``NmDistanceGradKernel``: both clouds receive gradient
  from both directions.
- A pure-jnp forward (``chamfer_reference``) is the golden model (mirrors
  utils/metrics/CD/chamfer_python.py) and the non-TPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_DEFAULT_TILE = 512
_PAD_SENTINEL = 1e9  # padded reference points sit far away; (2e9)² < f32 max


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pairwise_sqdist(a: Array, b: Array) -> Array:
    """(..., N, 3) × (..., M, 3) -> (..., N, M) squared euclidean distances."""
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.einsum(
        "...nc,...mc->...nm", a, b, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def chamfer_reference(a: Array, b: Array) -> tuple[Array, Array, Array, Array]:
    """Pure-jnp golden chamfer. (B,N,3),(B,M,3) -> d1 (B,N), d2 (B,M), i1, i2."""
    d = pairwise_sqdist(a, b)
    d1 = jnp.min(d, axis=-1)
    i1 = jnp.argmin(d, axis=-1).astype(jnp.int32)
    d2 = jnp.min(d, axis=-2)
    i2 = jnp.argmin(d, axis=-2).astype(jnp.int32)
    return d1, d2, i1, i2


_BATCH_BLOCK = 8  # sublane granularity for the (B, N) outputs


def _nn_kernel(a_ref, bt_ref, d_ref, idx_ref, *, m_valid: int):
    """A (BATCH_BLOCK, TILE)-query block vs each row's full reference cloud.

    a_ref: (BB, TILE, 3) queries; bt_ref: (BB, 3, Mp) coordinate-major refs;
    d_ref/idx_ref: (BB, TILE) min squared distance and argmin index.
    The batch rows are processed in a loop so only one (TILE, Mp) distance
    block is live in VMEM at a time (mirrors the CUDA kernel's 512-point
    shared-memory streaming, but per-row-in-VMEM instead).
    """

    for b in range(_BATCH_BLOCK):  # static unroll: Mosaic reuses the buffers
        a = a_ref[b]          # (TILE, 3)
        bt = bt_ref[b]        # (3, Mp)
        dist = (
            jnp.square(a[:, 0:1] - bt[0:1, :])
            + jnp.square(a[:, 1:2] - bt[1:2, :])
            + jnp.square(a[:, 2:3] - bt[2:3, :])
        )  # (TILE, Mp) on the VPU
        mp = dist.shape[1]
        if m_valid < mp:
            col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
            dist = jnp.where(col < m_valid, dist, jnp.float32(4e18))
        d_ref[b, :] = jnp.min(dist, axis=1)
        idx_ref[b, :] = jnp.argmin(dist, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _nn_one_way_pallas(a: Array, b: Array, tile: int = _DEFAULT_TILE,
                       interpret: bool = False) -> tuple[Array, Array]:
    """For each point of a (B,N,3): min squared distance + index into b (B,M,3)."""
    bsz, n, _ = a.shape
    m = b.shape[1]
    bb = _BATCH_BLOCK
    bp = _round_up(bsz, bb)
    # Output blocks are (bb, tile): tile must be lane-aligned (multiple of 128).
    tile = min(tile, _round_up(n, _LANE))
    np_ = _round_up(n, tile)
    mp = _round_up(m, _LANE)

    a_pad = jnp.pad(
        a.astype(jnp.float32), ((0, bp - bsz), (0, np_ - n), (0, 0))
    )
    # Coordinate-major (B, 3, Mp) so each coordinate is lane-contiguous.
    bt = jnp.swapaxes(b.astype(jnp.float32), 1, 2)
    bt = jnp.pad(
        bt,
        ((0, bp - bsz), (0, 0), (0, mp - m)),
        constant_values=_PAD_SENTINEL,
    )

    grid = (bp // bb, np_ // tile)
    d, idx = pl.pallas_call(
        functools.partial(_nn_kernel, m_valid=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, tile, 3), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 3, mp), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, tile), lambda bi, ni: (bi, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, tile), lambda bi, ni: (bi, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, np_), jnp.float32),
            jax.ShapeDtypeStruct((bp, np_), jnp.int32),
        ],
        interpret=interpret,
    )(a_pad, bt)
    return d[:bsz, :n], idx[:bsz, :n]


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _chamfer_fwd_impl(a: Array, b: Array, use_pallas: bool | None,
                      interpret: bool) -> tuple[Array, Array, Array, Array]:
    if use_pallas is None:
        use_pallas = _use_pallas()
    if use_pallas or interpret:
        d1, i1 = _nn_one_way_pallas(a, b, interpret=interpret)
        d2, i2 = _nn_one_way_pallas(b, a, interpret=interpret)
        return d1, d2, i1, i2
    return chamfer_reference(a, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def chamfer(a: Array, b: Array, use_pallas: bool | None = None,
            interpret: bool = False) -> tuple[Array, Array, Array, Array]:
    """Bidirectional squared chamfer: (B,N,3),(B,M,3) -> (d1, d2, i1, i2).

    d1: (B, N) squared distance of each a-point to its nearest b-point,
    i1: (B, N) index of that b-point; d2/i2 symmetric. Gradients flow to both
    clouds through the matched pairs only (matching NmDistanceGradKernel,
    reference chamfer3D.cu:155-186).
    """
    return _chamfer_fwd_impl(a, b, use_pallas, interpret)


def _chamfer_fwd(a, b, use_pallas, interpret):
    out = _chamfer_fwd_impl(a, b, use_pallas, interpret)
    d1, d2, i1, i2 = out
    return out, (a, b, i1, i2)


def _scatter_add(shape_like: Array, idx: Array, upd: Array) -> Array:
    return jax.vmap(lambda acc, i, u: acc.at[i].add(u))(
        jnp.zeros_like(shape_like), idx, upd
    )


def _chamfer_bwd(use_pallas, interpret, res, g):
    a, b, i1, i2 = res
    g1, g2, _, _ = g  # cotangents of integer outputs are float0 — ignored
    b_at_i1 = jnp.take_along_axis(b, i1[..., None], axis=1)   # (B, N, 3)
    a_at_i2 = jnp.take_along_axis(a, i2[..., None], axis=1)   # (B, M, 3)
    ga_direct = 2.0 * g1[..., None] * (a - b_at_i1)
    gb_direct = 2.0 * g2[..., None] * (b - a_at_i2)
    ga = ga_direct + _scatter_add(a, i2, -gb_direct)
    gb = gb_direct + _scatter_add(b, i1, -ga_direct)
    return ga, gb


chamfer.defvjp(_chamfer_fwd, _chamfer_bwd)
