"""Furthest point sampling — TPU-native.

Replacement for the reference CUDA op
(utils/mm3d_pn2/ops/furthest_point_sample/src/furthest_point_sample_cuda.cu
and wrapper furthest_point_sample.py). Same contract: indices (B, K) int32,
first selected index is 0, then iteratively the point furthest from the
selected set (max of running min-distance). Non-differentiable (indices).

Two implementations:

- ``_fps_xla``: the per-step parallel reduction of the CUDA kernel as a
  vectorized (B, N) min/argmax inside ``lax.fori_loop``. Correct
  everywhere, but each of the K sequential steps is a separate XLA loop
  iteration with fixed dispatch overhead — at the champion model's sizes
  (K=2048 plus a 1536/768/384 encoder chain per forward) that overhead
  dominates the whole train step.
- ``_fps_pallas``: the whole K-step loop inside ONE Pallas kernel. The
  (BB, N) running min-distance lives in VMEM/registers for the entire
  loop; each iteration is a handful of VPU passes over an (8, N) tile
  (masked extraction of the last point's coordinates, distance update,
  exact two-reduce argmax with first-occurrence ties like ``jnp.argmax``).
  Selected indices accumulate in a carried (BB, K) buffer written once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

_LANE = 128
_BATCH_BLOCK = 8  # sublane granularity


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fps_kernel(pts_ref, out_ref, *, k: int, n_valid: int):
    """One batch block: the FULL K-step FPS loop in VMEM.

    pts_ref: (BB, 3, Np) f32 coordinate-major points (zero-padded cols);
    out_ref: (BB, Kp) int32 selected indices (first is always 0).
    """
    bb, _, np_ = pts_ref.shape
    kp = out_ref.shape[1]
    x = pts_ref[:, 0, :]
    y = pts_ref[:, 1, :]
    z = pts_ref[:, 2, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, np_), 1)
    # padded cols start at -inf so the argmax can never select them (valid
    # running distances are always >= 0)
    min_d0 = jnp.where(col < n_valid, jnp.float32(1e10), jnp.float32(-1e10))
    kcol = jax.lax.broadcasted_iota(jnp.int32, (bb, kp), 1)
    idx0 = jnp.zeros((bb, kp), jnp.int32)

    def body(i, carry):
        min_d, last, idxs = carry
        mask = (col == last[:, None]).astype(jnp.float32)
        lx = jnp.sum(x * mask, axis=1, keepdims=True)
        ly = jnp.sum(y * mask, axis=1, keepdims=True)
        lz = jnp.sum(z * mask, axis=1, keepdims=True)
        d = (
            jnp.square(x - lx) + jnp.square(y - ly) + jnp.square(z - lz)
        )
        min_d = jnp.minimum(min_d, d)
        m = jnp.max(min_d, axis=1, keepdims=True)
        # exact argmax, first-occurrence ties (matches jnp.argmax)
        nxt = jnp.min(
            jnp.where(min_d == m, col, jnp.int32(np_)), axis=1
        ).astype(jnp.int32)
        idxs = jnp.where(kcol == i, nxt[:, None], idxs)
        return min_d, nxt, idxs

    _, _, idxs = jax.lax.fori_loop(
        1, k, body, (min_d0, jnp.zeros((bb,), jnp.int32), idx0)
    )
    out_ref[...] = idxs


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def _fps_pallas_prim(points: Array, k: int, interpret: bool) -> Array:
    bsz, n, _ = points.shape
    np_ = _round_up(n, _LANE)
    kp = _round_up(k, _LANE)
    bp = _round_up(bsz, _BATCH_BLOCK)
    pts = jnp.transpose(points.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    pts = jnp.pad(pts, ((0, bp - bsz), (0, 0), (0, np_ - n)))
    out = pl.pallas_call(
        functools.partial(_fps_kernel, k=k, n_valid=n),
        grid=(bp // _BATCH_BLOCK,),
        in_specs=[
            pl.BlockSpec((_BATCH_BLOCK, 3, np_), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((_BATCH_BLOCK, kp), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, kp), jnp.int32),
        interpret=interpret,
    )(pts)
    return out[:bsz, :k]


@_fps_pallas_prim.defjvp
def _fps_pallas_jvp(k, interpret, primals, tangents):
    # Indices are non-differentiable (int32 -> float0 tangent). Without
    # this rule, ``nn.remat``'s linearization fails on the pallas_call
    # (no JVP registered) even though no gradient ever flows through it.
    del tangents
    (points,) = primals
    out = _fps_pallas_prim(points, k, interpret)
    import numpy as np

    return out, np.zeros(out.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _fps_pallas(points: Array, k: int, interpret: bool = False) -> Array:
    return _fps_pallas_prim(points, k, interpret)


@functools.partial(jax.jit, static_argnames=("k",))
def _fps_xla(points: Array, k: int) -> Array:
    points = points.astype(jnp.float32)
    bsz, n, _ = points.shape

    def body(i, state):
        min_d, idxs, last = state
        last_pt = jnp.take_along_axis(points, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum(jnp.square(points - last_pt), axis=-1)  # (B, N)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)  # (B,)
        idxs = idxs.at[:, i].set(nxt)
        return min_d, idxs, nxt

    # Derive the carry inits from `points` so they inherit its varying
    # mesh axes — constant inits break the fori_loop carry-type match
    # when this runs inside shard_map (vma mismatch).
    zero_b = (points[:, 0, 0] * 0).astype(jnp.int32)  # (B,) varying zeros
    init = (
        points[:, :, 0] * 0 + jnp.float32(1e10),
        jnp.zeros((bsz, k), jnp.int32) + zero_b[:, None],
        zero_b,
    )
    _, idxs, _ = jax.lax.fori_loop(1, k, body, init)
    return idxs


def furthest_point_sample(points: Array, k: int,
                          use_pallas: bool | None = None,
                          interpret: bool = False) -> Array:
    """(B, N, 3) -> (B, k) int32 indices. First index is always 0
    (matching furthest_point_sampling_kernel's init)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and k >= 8
    if use_pallas:
        return _fps_pallas(points, k, interpret=interpret)
    return _fps_xla(points, k)


@functools.partial(jax.jit, static_argnames=("k",))
def furthest_point_sample_with_dist(dist: Array, k: int) -> Array:
    """FPS over a precomputed (B, N, N) squared-distance matrix
    (reference furthest_point_sample.py:42-74 variant)."""
    bsz, n, _ = dist.shape

    def body(i, state):
        min_d, idxs, last = state
        d = jnp.take_along_axis(dist, last[:, None, None], axis=1)[:, 0, :]
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        idxs = idxs.at[:, i].set(nxt)
        return min_d, idxs, nxt

    zero_b = (dist[:, 0, 0] * 0).astype(jnp.int32)  # shard_map-safe inits
    init = (
        dist[:, 0, :] * 0 + jnp.float32(1e10),
        jnp.zeros((bsz, k), jnp.int32) + zero_b[:, None],
        zero_b,
    )
    _, idxs, _ = jax.lax.fori_loop(1, k, body, init)
    return idxs
