"""Furthest point sampling — TPU-native.

Replacement for the reference CUDA op
(utils/mm3d_pn2/ops/furthest_point_sample/src/furthest_point_sample_cuda.cu
and wrapper furthest_point_sample.py). Same contract: indices (B, K) int32,
first selected index is 0, then iteratively the point furthest from the
selected set (max of running min-distance). Non-differentiable (indices).

The per-step parallel reduction of the CUDA kernel becomes a vectorized
(B, N) min/argmax inside ``lax.fori_loop`` — each of the K steps is one
fused VPU pass over the whole batch, so the sequential dependence costs K
tiny steps rather than K kernel launches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("k",))
def furthest_point_sample(points: Array, k: int) -> Array:
    """(B, N, 3) -> (B, k) int32 indices. First index is always 0
    (matching furthest_point_sampling_kernel's init)."""
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

    init = (
        jnp.full((bsz, n), jnp.float32(1e10)),
        jnp.zeros((bsz, k), jnp.int32),
        jnp.zeros((bsz,), jnp.int32),
    )
    _, idxs, _ = jax.lax.fori_loop(1, k, body, init)
    return idxs


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

    init = (
        jnp.full((bsz, n), jnp.float32(1e10)),
        jnp.zeros((bsz, k), jnp.int32),
        jnp.zeros((bsz,), jnp.int32),
    )
    _, idxs, _ = jax.lax.fori_loop(1, k, body, init)
    return idxs
