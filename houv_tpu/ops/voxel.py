"""Voxelization — TPU-native.

Replaces (a) the numpy per-sample voxelization in the reference datasets
(``getVoxel``, registration/dataset.py:264-288; ``point_to_voxel``,
completion/dataset.py:126-142) and (b) the input side of the vendored
spconv/scatter ops (utils/mm3d_pn2/ops/voxel/). Here voxelization is a
batched, jit-compiled segment reduction — it runs on device instead of in
CPU dataloader workers.

Grid convention matches the reference exactly: with fixed volume
[min_b, max_b] and grid size G, intervals = (max_b - min_b)/(G-1) and
grid_ind = floor((clip(x) - min_b)/intervals), so indices span [0, G-1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("grid_size",))
def voxel_grid_indices(
    xyz: Array,
    grid_size: int = 50,
    min_bound: float = -0.5,
    max_bound: float = 0.5,
) -> Array:
    """(..., N, 3) points -> (..., N, 3) int32 voxel indices in [0, grid_size-1]."""
    interval = (max_bound - min_bound) / (grid_size - 1)
    clipped = jnp.clip(xyz, min_bound, max_bound)
    idx = jnp.floor((clipped - min_bound) / interval).astype(jnp.int32)
    return jnp.clip(idx, 0, grid_size - 1)


def _flatten_idx(grid_ind: Array, g: int) -> Array:
    return (grid_ind[..., 0] * g + grid_ind[..., 1]) * g + grid_ind[..., 2]


@functools.partial(jax.jit, static_argnames=("grid_size",))
def voxelize_mean(
    xyz: Array,
    grid_size: int = 50,
    min_bound: float = -0.5,
    max_bound: float = 0.5,
) -> tuple[Array, Array]:
    """Mean point per occupied voxel, packed like the reference ``getVoxel``.

    (B, N, 3) -> (voxel_points (B, N, 3), counts (B,)). Occupied-voxel means
    are packed into the first `counts[b]` rows ordered by flat voxel index
    (np.unique ordering, matching the reference); remaining rows are zero.
    """
    bsz, n, _ = xyz.shape
    g = grid_size
    grid_ind = voxel_grid_indices(xyz, grid_size, min_bound, max_bound)
    flat = _flatten_idx(grid_ind, g)  # (B, N)

    def single(points, fidx):
        num_vox = g * g * g
        ones = jnp.ones((n,), jnp.float32)
        cnt = jnp.zeros((num_vox,), jnp.float32).at[fidx].add(ones)
        sums = jnp.zeros((num_vox, 3), jnp.float32).at[fidx].add(points)
        occupied = cnt > 0
        count = jnp.sum(occupied, dtype=jnp.int32)
        means = sums / jnp.maximum(cnt, 1.0)[:, None]
        # Pack occupied voxels (in flat-index order) into the first rows.
        rank = jnp.cumsum(occupied.astype(jnp.int32)) - 1  # (num_vox,)
        dest = jnp.where(occupied, rank, n)  # overflow rows dropped
        out = jnp.zeros((n, 3), jnp.float32).at[dest].set(means, mode="drop")
        return out, count

    return jax.vmap(single)(xyz.astype(jnp.float32), flat)


@functools.partial(jax.jit, static_argnames=("grid_size",))
def voxelize_occupancy(
    xyz: Array,
    grid_size: int = 50,
    min_bound: float = -0.5,
    max_bound: float = 0.5,
) -> Array:
    """(B, N, 3) -> (B, G, G, G) float32 binary occupancy grid.

    Dense replacement for the spconv SparseConvTensor input: on a 50³ grid a
    dense one-hot volume is tiny (125k floats) and lets the voxel branch run
    as ordinary XLA convolutions on the MXU (SURVEY.md §7 step 1).
    """
    bsz, n, _ = xyz.shape
    g = grid_size
    flat = _flatten_idx(voxel_grid_indices(xyz, grid_size, min_bound, max_bound), g)

    def single(fidx):
        occ = jnp.zeros((g * g * g,), jnp.float32).at[fidx].max(1.0)
        return occ.reshape(g, g, g)

    return jax.vmap(single)(flat)


@functools.partial(jax.jit, static_argnames=("grid_size",))
def voxelize_features_mean(
    xyz: Array,
    features: Array,
    grid_size: int = 50,
    min_bound: float = -0.5,
    max_bound: float = 0.5,
) -> Array:
    """Scatter point features into a dense grid by voxel-mean.

    (B, N, 3) × (B, N, C) -> (B, G, G, G, C). Dense analogue of the
    reference's dynamic scatter (utils/mm3d_pn2/ops/voxel/scatter_points*).
    """
    bsz, n, c = features.shape
    g = grid_size
    flat = _flatten_idx(voxel_grid_indices(xyz, grid_size, min_bound, max_bound), g)

    def single(fidx, feats):
        num_vox = g * g * g
        cnt = jnp.zeros((num_vox,), jnp.float32).at[fidx].add(jnp.ones((n,)))
        sums = jnp.zeros((num_vox, c), jnp.float32).at[fidx].add(feats)
        means = sums / jnp.maximum(cnt, 1.0)[:, None]
        return means.reshape(g, g, g, c)

    return jax.vmap(single)(flat, features.astype(jnp.float32))
