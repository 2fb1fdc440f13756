"""Sparse 3D convolution — TPU-native gather-GEMM-scatter.

Replacement for the vendored spconv subset (utils/mm3d_pn2/ops/spconv/:
``get_indice_pairs`` + ``indice_conv`` rule-based gather-GEMM-scatter,
``SparseConvTensor`` container in structure.py) used by the champion
completion model's voxel branch (completion/models/
segmentator_3d_asymm_spconv.py).

TPU redesign: instead of building ragged indice pairs with atomics, voxels
live in a FIXED-capacity list (capacity = max points per cloud, 2048 for
MVP) with a validity mask, and neighbor lookup goes through a dense
(B, G³) int32 index grid — a single scatter to build, O(1) gathers per
kernel offset. Each kernel offset then contributes one (V, Cin) × (Cin,
Cout) matmul on the MXU. All shapes static; everything jit/vmap-friendly.

- ``subm_conv``: submanifold conv (output sites = input sites), matching
  spconv.SubMConv3d with arbitrary factorized kernels ((1,3,3), (3,1,3), …).
- ``sparse_conv_down``: strided (2,2,2)/(2,2,1) sparse conv, kernel 3,
  padding 1; output sites are the unique floor-divided input sites (covers
  every site that receives the center tap; a site reachable only through
  an edge tap of an odd coordinate is dropped — negligible on these dense
  50³ point grids, and the fixed-capacity list keeps shapes static).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseGrid:
    """Fixed-capacity sparse voxel tensor (the SparseConvTensor analogue).

    features: (B, V, C) float; coords: (B, V, 3) int32 in [0, grid_size);
    mask: (B, V) bool — valid rows; grid_size: static spatial extent.
    """

    features: Array
    coords: Array
    mask: Array
    grid_size: int = dataclasses.field(metadata=dict(static=True))


def kernel_offsets(kernel_size: tuple[int, int, int]) -> list[tuple[int, int, int]]:
    """Offsets for an odd factorized kernel, centered (padding = k//2)."""
    ranges = [range(-(k // 2), k // 2 + 1) for k in kernel_size]
    return list(itertools.product(*ranges))


def from_point_voxels(
    grid_ind: Array, point_features: Array, grid_size: int
) -> SparseGrid:
    """Point voxel indices + features -> deduplicated SparseGrid (voxel
    feature = mean of its points' features). grid_ind (B, N, 3) int32,
    point_features (B, N, C)."""
    b, n, _ = grid_ind.shape
    c = point_features.shape[-1]
    g = grid_size
    flat = (grid_ind[..., 0] * g + grid_ind[..., 1]) * g + grid_ind[..., 2]

    def single(fidx, feats):
        num_vox = g * g * g
        cnt = jnp.zeros((num_vox,), jnp.float32).at[fidx].add(
            jnp.ones((n,), jnp.float32)
        )
        sums = jnp.zeros((num_vox, c), jnp.float32).at[fidx].add(feats)
        occupied = cnt > 0
        means = sums / jnp.maximum(cnt, 1.0)[:, None]
        rank = jnp.cumsum(occupied.astype(jnp.int32)) - 1
        dest = jnp.where(occupied, rank, n)  # pack into first rows
        out_feat = jnp.zeros((n, c), jnp.float32).at[dest].set(
            means, mode="drop"
        )
        # coords of packed voxels
        zyx = jnp.stack(
            [
                jnp.arange(num_vox, dtype=jnp.int32) // (g * g),
                (jnp.arange(num_vox, dtype=jnp.int32) // g) % g,
                jnp.arange(num_vox, dtype=jnp.int32) % g,
            ],
            axis=-1,
        )
        out_coords = jnp.zeros((n, 3), jnp.int32).at[dest].set(
            zyx, mode="drop"
        )
        count = jnp.sum(occupied, dtype=jnp.int32)
        valid = jnp.arange(n, dtype=jnp.int32) < count
        return out_feat, out_coords, valid

    feats, coords, mask = jax.vmap(single)(
        flat, point_features.astype(jnp.float32)
    )
    return SparseGrid(feats, coords, mask, grid_size)


def build_lookup(sg: SparseGrid) -> Array:
    """(B, G³) int32 grid: row index of the voxel at each site, -1 if empty.
    Shared across all submanifold convs at the same resolution (the
    reference's indice_key reuse)."""
    g = sg.grid_size
    b, v, _ = sg.coords.shape
    flat = (
        sg.coords[..., 0] * g + sg.coords[..., 1]
    ) * g + sg.coords[..., 2]
    flat = jnp.where(sg.mask, flat, g * g * g)  # invalid rows -> dropped
    rows = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32)[None], (b, v))

    def single(f, r):
        return jnp.full((g * g * g,), -1, jnp.int32).at[f].set(r, mode="drop")

    return jax.vmap(single)(flat, rows)


def _gather_neighbors(sg: SparseGrid, lookup: Array,
                      offset: tuple[int, int, int]):
    """Features of each voxel's neighbor at `offset` ((B, V, C), zero when
    absent/out of bounds)."""
    g = sg.grid_size
    nc = sg.coords + jnp.array(offset, jnp.int32)
    in_bounds = jnp.all((nc >= 0) & (nc < g), axis=-1) & sg.mask
    flat = (nc[..., 0] * g + nc[..., 1]) * g + nc[..., 2]
    flat = jnp.where(in_bounds, flat, 0)
    rows = jnp.take_along_axis(lookup, flat, axis=1)  # (B, V)
    valid = in_bounds & (rows >= 0)
    safe_rows = jnp.where(valid, rows, 0)
    feats = jnp.take_along_axis(
        sg.features, safe_rows[..., None], axis=1
    )
    return jnp.where(valid[..., None], feats, 0.0)


def subm_conv(
    sg: SparseGrid,
    lookup: Array,
    weights: Array,
    kernel_size: tuple[int, int, int],
) -> SparseGrid:
    """Submanifold sparse conv: output at input sites only
    (spconv.SubMConv3d semantics). weights: (K, Cin, Cout) with K =
    prod(kernel_size), offset-ordered per ``kernel_offsets``."""
    offsets = kernel_offsets(kernel_size)
    assert weights.shape[0] == len(offsets)
    out = None
    for i, off in enumerate(offsets):
        if off == (0, 0, 0):
            nb = sg.features * sg.mask[..., None]
        else:
            nb = _gather_neighbors(sg, lookup, off)
        term = jnp.einsum(
            "bvc,cd->bvd", nb, weights[i],
        )
        out = term if out is None else out + term
    return SparseGrid(out, sg.coords, sg.mask, sg.grid_size)


def sparse_conv_down(
    sg: SparseGrid,
    lookup: Array,
    weights: Array,
    stride: tuple[int, int, int] = (2, 2, 2),
) -> SparseGrid:
    """Strided sparse conv (kernel 3, padding 1): downsample to
    grid_size' = ceil(G / stride) with output sites = unique(coords //
    stride) (spconv.SparseConv3d analogue; see module docstring for the
    coverage caveat). weights: (27, Cin, Cout)."""
    g = sg.grid_size
    b, v, cin = sg.features.shape
    s = jnp.array(stride, jnp.int32)
    # Single cubic extent covering all (possibly anisotropic-stride) dims.
    out_g = max(-(-g // stride[i]) for i in range(3))

    out_coords_all = sg.coords // s  # (B, V, 3) candidate coarse coords
    flat = (
        out_coords_all[..., 0] * out_g + out_coords_all[..., 1]
    ) * out_g + out_coords_all[..., 2]
    flat = jnp.where(sg.mask, flat, out_g**3)

    def dedupe(f, coords_f):
        num = out_g**3
        occ = jnp.zeros((num,), jnp.bool_).at[f].set(True, mode="drop")
        rank = jnp.cumsum(occ.astype(jnp.int32)) - 1
        count = jnp.sum(occ, dtype=jnp.int32)
        # packed coarse coords
        idx = jnp.arange(num, dtype=jnp.int32)
        zyx = jnp.stack(
            [idx // (out_g * out_g), (idx // out_g) % out_g, idx % out_g],
            axis=-1,
        )
        dest = jnp.where(occ, rank, v)
        out_coords = jnp.zeros((v, 3), jnp.int32).at[dest].set(
            zyx, mode="drop"
        )
        valid = jnp.arange(v, dtype=jnp.int32) < count
        return out_coords, valid

    out_coords, out_mask = jax.vmap(dedupe)(flat, out_coords_all)

    # For each output site and each of the 27 taps, gather the fine voxel at
    # position out*stride + off (offsets in {-1,0,1} around the center of
    # the stride-2 window with padding 1).
    offsets = kernel_offsets((3, 3, 3))
    out_feats = jnp.zeros((b, v, weights.shape[-1]), jnp.float32)
    base = out_coords * s
    for i, off in enumerate(offsets):
        nc = base + jnp.array(off, jnp.int32)
        in_bounds = jnp.all((nc >= 0) & (nc < g), axis=-1) & out_mask
        flat_n = (nc[..., 0] * g + nc[..., 1]) * g + nc[..., 2]
        flat_n = jnp.where(in_bounds, flat_n, 0)
        rows = jnp.take_along_axis(lookup, flat_n, axis=1)
        valid = in_bounds & (rows >= 0)
        nb = jnp.take_along_axis(
            sg.features, jnp.where(valid, rows, 0)[..., None], axis=1
        )
        nb = jnp.where(valid[..., None], nb, 0.0)
        out_feats = out_feats + jnp.einsum("bvc,cd->bvd", nb, weights[i])

    return SparseGrid(out_feats, out_coords, out_mask, out_g)


def to_dense(sg: SparseGrid) -> Array:
    """(B, G, G, G, C) dense volume (SparseConvTensor.dense())."""
    g = sg.grid_size
    b, v, c = sg.features.shape
    flat = (
        sg.coords[..., 0] * g + sg.coords[..., 1]
    ) * g + sg.coords[..., 2]
    flat = jnp.where(sg.mask, flat, g * g * g)

    def single(f, feats):
        return (
            jnp.zeros((g * g * g, c), jnp.float32)
            .at[f].set(feats, mode="drop")
            .reshape(g, g, g, c)
        )

    return jax.vmap(single)(flat, sg.features)


def masked_max(sg: SparseGrid) -> Array:
    """(B, C) max over valid voxels (the reference's dense().max(dim=2))."""
    neg = jnp.where(sg.mask[..., None], sg.features, -jnp.inf)
    out = jnp.max(neg, axis=1)
    # all-empty batch rows (shouldn't happen) -> 0
    return jnp.where(jnp.isfinite(out), out, 0.0)
