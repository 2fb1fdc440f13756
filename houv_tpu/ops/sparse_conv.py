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
  padding 1; output sites follow the EXACT spconv rule (every coarse site
  whose 3³ window touches an input site — see ``downsample_sites``; the
  r1-r4 floor-divide approximation undercounted sites by ~37% on
  voxelized partial clouds and was fixed in r5 at zero cost, the
  fixed-capacity list keeping shapes static either way).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import os

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseGrid:
    """Fixed-capacity sparse voxel tensor (the SparseConvTensor analogue).

    features: (B, V, C) float; coords: (B, V, 3) int32 in [0, grid_size);
    mask: (B, V) bool — valid rows; grid_size: static spatial extent.

    Row-order invariant: both constructors (``from_point_voxels``,
    ``downsample_sites``) emit valid rows ascending in x-major flat id
    with the masked tail last; the banded match conv relies on it to skip
    re-sorting for dx=0 kernels.
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

    def single(fidx, coords, feats):
        # Feature sums accumulate in PACKED (n, c) space, never on the full
        # G³ grid: the grid only carries booleans + an int rank. (The r2
        # version scattered features into a (G³, c) buffer — at c=1024 that
        # is 0.5 GB per cloud and was the vrcnet_knn HBM/compile hog.)
        num_vox = g * g * g
        occupied = jnp.zeros((num_vox,), jnp.bool_).at[fidx].set(
            True, mode="drop"
        )
        rank = jnp.cumsum(occupied.astype(jnp.int32)) - 1  # (G³,)
        dest = rank[fidx]                                  # (n,) packed row
        cnt = jnp.zeros((n,), jnp.float32).at[dest].add(1.0, mode="drop")
        sums = jnp.zeros((n, c), jnp.float32).at[dest].add(
            feats, mode="drop"
        )
        out_feat = sums / jnp.maximum(cnt, 1.0)[:, None]
        # packed voxel coords: every point of a voxel writes the same value
        out_coords = jnp.zeros((n, 3), jnp.int32).at[dest].set(
            coords, mode="drop"
        )
        count = jnp.sum(occupied, dtype=jnp.int32)
        valid = jnp.arange(n, dtype=jnp.int32) < count
        return out_feat * valid[:, None], out_coords, valid

    feats, coords, mask = jax.vmap(single)(
        flat, grid_ind, point_features.astype(jnp.float32)
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


def _gather_all_neighbors(features: Array, lookup: Array,
                          base_coords: Array, base_mask: Array,
                          offsets, grid_size: int):
    """Neighbor features for ALL kernel offsets in one pass (the CPU /
    full-f32 path; the TPU bf16 path is ``_match_conv``).

    One (B, V·K) row lookup + one (B, V·K, C) feature gather + masking —
    instead of K separate gather/einsum pairs (the r2 structure emitted
    ~230 unrolled gather+matmul blocks across the voxel encoder, 649 MB
    of generated TPU code). Returns (B, V, K, C), zeros where absent.
    Source-row validity comes entirely from the lookup (invalid rows are
    -1 there); ``base_mask`` masks the convolved sites.

    features: the SOURCE voxel list the lookup indexes into;
    base_coords/base_mask: the (possibly different-resolution) sites being
    convolved; grid_size: source grid extent.
    """
    g = grid_size
    b, v, _ = base_coords.shape
    k = len(offsets)
    flat = _neighbor_query_flat(base_coords, base_mask, offsets, g)
    rows = jnp.take_along_axis(
        lookup, jnp.maximum(flat, 0).reshape(b, v * k), axis=1
    )
    valid = (flat >= 0) & (rows.reshape(b, v, k) >= 0)
    safe = jnp.where(valid, rows.reshape(b, v, k), 0)
    feats = jnp.take_along_axis(
        features, safe.reshape(b, v * k)[..., None], axis=1
    ).reshape(b, v, k, -1)
    return jnp.where(valid[..., None], feats, 0.0)


def _conv_contract(nb: Array, weights: Array, compute_dtype) -> Array:
    """(B, V, K, C) × (K, C, D) -> (B, V, D). With a bf16 compute dtype the
    inputs stream through the MXU at 4× the f32 rate; accumulation stays
    f32 (preferred_element_type)."""
    if compute_dtype is not None:
        nb = nb.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    return jnp.einsum(
        "bvkc,kcd->bvd", nb, weights, preferred_element_type=jnp.float32
    )


def _flat_coords(coords: Array, mask: Array, g: int, sentinel: int) -> Array:
    """(B, V, 3) int coords -> (B, V) flat ids; masked rows -> sentinel."""
    flat = (coords[..., 0] * g + coords[..., 1]) * g + coords[..., 2]
    return jnp.where(mask, flat, sentinel)


def _match_conv(features: Array, src_flat: Array, query_flat: Array,
                weights: Array, compute_dtype) -> Array:
    """Sparse conv as two MXU einsums — no gather, no lookup grid, no
    scatter in the backward.

    The neighbor gather is a coordinate match: voxel flat ids are unique
    per cloud, so ``match[b, j, u] = (query_flat[b, j] == src_flat[b, u])``
    is a one-hot row and ``match @ features`` IS the gather. XLA fuses the
    compare into the dot operand (never materializing the (B, J, U)
    tensor), the contraction rides the MXU, and the adjoint is the
    transposed matmul — replacing both the ~14 ms XLA row gather and its
    scatter-add backward (~13 ms) with ~3 ms of bf16 matmul at champion
    shapes (BENCH_NOTES r3). Out-of-bounds / masked queries carry a
    sentinel that matches nothing -> zero rows, which also zeroes masked
    source rows (sentinels differ).

    Contraction order adapts to channel widths: gather-then-contract
    (im2col) costs C·(U+D) MACs/site/tap, contract-weights-first costs
    D·(C+U) — pick the smaller (the context block's 1024->128 convs are
    5.7× cheaper weight-first).

    features (B, U, C) [already compute_dtype], src_flat (B, U),
    query_flat (B, V, K), weights (K, C, D) -> (B, V, D) f32.
    """
    b, u, c = features.shape
    _, v, k = query_flat.shape
    d = weights.shape[-1]
    w = weights.astype(compute_dtype)
    match = (
        query_flat[..., None] == src_flat[:, None, None, :]
    ).astype(compute_dtype)                                  # (B, V, K, U)
    if c <= d:  # im2col order
        nb = jnp.einsum(
            "bvku,buc->bvkc", match, features,
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)                              # exact: one hit
        return jnp.einsum(
            "bvkc,kcd->bvd", nb, w, preferred_element_type=jnp.float32
        )
    p = jnp.einsum(
        "buc,kcd->bukd", features, w, preferred_element_type=jnp.float32
    ).astype(compute_dtype)
    return jnp.einsum(
        "bvku,bukd->bvd", match, p, preferred_element_type=jnp.float32
    )


def _scatter_match_down(features: Array, src_coords: Array, src_mask: Array,
                        out_flat: Array, out_g: int, weights: Array,
                        stride: tuple[int, int, int], grid_size: int,
                        compute_dtype) -> Array:
    """Strided sparse conv as a SOURCE-scatter one-hot contraction.

    The im2col-direction match (``_match_conv``) pays K·U one-hot columns
    per output site (27·2048 at champion shapes — the single most
    expensive fusion in the vrcnet_knn step profile). Flipping the
    direction shrinks it: under stride 2 a source coord s reaches only
    o ∈ {s>>1, s>>1+1} per dim (the latter only when s is odd), so each
    source row matches at most J = Π(2 if stride==2 else 3) candidate
    coarse sites — J=8 for (2,2,2) vs K=27, i.e. 3.4× less one-hot MXU
    work at identical semantics:

        y[o] = Σ_j Σ_u 1[t_j[u] = id[o]] · (x[u] · W_{k_j[u]})

    The tap k_j[u] follows from the source parity alone, applied per row
    via a 27-way one-hot einsum over the precomputed (B, U, 27, D) tap
    products (same tensor footprint the im2col path materializes). Every
    factor is an einsum, so the adjoint is transposed matmuls — no
    scatter anywhere. Invalid candidates (even coord with the +1 choice,
    out-of-extent, masked rows) carry sentinel -1 and match nothing.

    features (B, U, C), src_coords (B, U, 3), src_mask (B, U),
    out_flat (B, O) cubic-``out_g``-raster ids (masked rows < -1),
    weights (27, C, D) in ``kernel_offsets((3,3,3))`` order -> (B, O, D).
    """
    w = weights.astype(compute_dtype)
    x = features.astype(compute_dtype)
    dims_ext = [-(-grid_size // stride[i]) for i in range(3)]
    cands = [range(2) if stride[i] == 2 else range(3) for i in range(3)]
    t_list, k_list = [], []
    for combo in itertools.product(*cands):
        o_dims, off_dims = [], []
        valid = src_mask
        for i, e in enumerate(combo):
            si = src_coords[..., i]
            if stride[i] == 2:
                if e == 0:
                    o = si >> 1                      # always in extent
                    off = si & 1                     # center or +1 tap
                else:
                    o = (si >> 1) + 1
                    off = jnp.full_like(si, -1)
                    valid = valid & ((si & 1) == 1) & (o < dims_ext[i])
            else:  # stride-1 dim: submanifold-like, all three taps
                o = si - (e - 1)
                off = jnp.full_like(si, e - 1)
                valid = valid & (o >= 0) & (o < dims_ext[i])
            o_dims.append(o)
            off_dims.append(off)
        t = (o_dims[0] * out_g + o_dims[1]) * out_g + o_dims[2]
        k = ((off_dims[0] + 1) * 3 + off_dims[1] + 1) * 3 + off_dims[2] + 1
        t_list.append(jnp.where(valid, t, -1))
        k_list.append(jnp.where(valid, k, -1))
    t = jnp.stack(t_list, axis=-1)                   # (B, U, J)
    kk = jnp.stack(k_list, axis=-1)                  # (B, U, J)

    xw = jnp.einsum(
        "buc,kcd->bukd", x, w, preferred_element_type=jnp.float32
    ).astype(compute_dtype)                          # (B, U, 27, D)
    sel = (
        kk[..., None] == jnp.arange(w.shape[0], dtype=jnp.int32)
    ).astype(compute_dtype)                          # (B, U, J, 27)
    z = jnp.einsum(
        "bujk,bukd->bujd", sel, xw, preferred_element_type=jnp.float32
    ).astype(compute_dtype)                          # (B, U, J, D)
    match = (
        out_flat[:, :, None, None] == t[:, None, :, :]
    ).astype(compute_dtype)                          # (B, O, U, J) fused
    return jnp.einsum(
        "bouj,bujd->bod", match, z, preferred_element_type=jnp.float32
    )


# A/B escape hatch: HOUV_TPU_DOWN_IM2COL=1 keeps strided convs on the
# im2col-direction match einsum (benchmark comparisons).
_SCATTER_DOWN_DISABLED = os.environ.get("HOUV_TPU_DOWN_IM2COL", "") == "1"


def _neighbor_query_flat(base_coords: Array, base_mask: Array, offsets,
                         grid_size: int) -> Array:
    """Flat source-grid ids of every (site, kernel-offset) neighbor;
    -1 where out of bounds or the site is masked. (B, V, K)."""
    g = grid_size
    off = jnp.asarray(offsets, jnp.int32)                    # (K, 3)
    nc = base_coords[:, :, None, :] + off[None, None]        # (B, V, K, 3)
    in_bounds = jnp.all((nc >= 0) & (nc < g), axis=-1) & base_mask[..., None]
    flat = (nc[..., 0] * g + nc[..., 1]) * g + nc[..., 2]
    return jnp.where(in_bounds, flat, -1)


# ---------------------------------------------------------------------------
# Banded match conv: the one-hot contraction restricted to a provably
# sufficient window of the sorted voxel list.


_BAND_Q = 128  # query block rows (sublane-friendly)

# A/B escape hatch: HOUV_TPU_NO_BANDED_CONV=1 forces the full-match
# einsum even where the banded window applies (benchmark comparisons).
_BANDED_DISABLED = os.environ.get("HOUV_TPU_NO_BANDED_CONV", "") == "1"


def _band_major_axis(offsets) -> int | None:
    """The axis no kernel tap moves along (factorized kernels have one);
    sorting with it as the MAJOR raster axis makes every tap's flat-id
    delta small: |delta| <= G+1. None for full 3-axis kernels."""
    for ax in range(3):
        if all(o[ax] == 0 for o in offsets):
            return ax
    return None


def _axes_order(major: int) -> list[int]:
    """Axis permutation putting ``major`` first (the banding raster)."""
    return [major] + [a for a in range(3) if a != major]


def _perm_flat(coords: Array, mask: Array, g: int, major: int) -> Array:
    """Flat ids in the raster order with ``major`` first; masked -> G³
    (sorts after every valid id, never equals a valid query)."""
    return _flat_coords(coords[..., _axes_order(major)], mask, g, g * g * g)


def _band_width(g: int, q_block: int) -> int:
    """Window rows per query block, rounded to the 128-lane grain.

    Exactness proof: ids are unique per cloud, and for SUBMANIFOLD convs
    the query sites ARE the source sites, so the valid sources matching a
    block of Q consecutive sorted queries [q0, qlast] under tap deltas in
    [dmin, dmax] all lie in id range [q0+dmin, qlast+dmax]; that range
    holds at most Q + (dmax-dmin) sources (the block's own Q rows plus at
    most |dmin|+|dmax| ids in the two shifted strips). With the major
    axis chosen by ``_band_major_axis``, dmax-dmin <= 2(G+1)."""
    spread = 2 * (g + 1)
    return -(-(q_block + spread + 1) // 128) * 128


def _banded_match_subm(features: Array, coords: Array, mask: Array,
                       offsets, weights: Array, g: int, compute_dtype,
                       q_block: int = _BAND_Q,
                       assume_sorted: bool = False) -> Array:
    """Submanifold match conv with the one-hot contraction banded to a
    W-row window per query block (W = ``_band_width`` ≪ U): the match
    einsum drops from V·K·U to V·K·W MACs per channel — ~8× less one-hot
    work at champion shapes (U=2048, W=256).

    The voxel list is sorted by the kernel-appropriate raster order
    (argsort per call — a 2048-int sort is noise next to the conv), each
    block's window start comes from a searchsorted on the sorted ids, and
    the output is inverse-permuted back to list order. Exact by the
    uniqueness argument in ``_band_width``; parity-tested against
    ``_match_conv``. Backward: feature grads accumulate per-window bf16
    pieces (vs one f32 sum in the full path) — agreement to bf16 rounding,
    the same contract bf16 training carries everywhere else.

    features (B, U, C) [masked rows zeroed, compute_dtype], coords
    (B, U, 3), mask (B, U), weights (K, C, D) -> (B, U, D) f32.
    """
    b, u, c = features.shape
    k = weights.shape[0]
    d = weights.shape[-1]
    major = _band_major_axis(offsets)
    assert major is not None and u % q_block == 0
    t = u // q_block
    w_rows = _band_width(g, q_block)

    keys = _perm_flat(coords, mask, g, major)                 # (B, U)
    if assume_sorted:
        # constructor invariant (from_point_voxels / downsample_sites):
        # valid rows ascend in canonical flat id, masked tail -> G³, so
        # for major == 0 the list is already window-ready — skip the
        # argsort and the three permutation gathers
        perm = None
        key_s, feat_s, coords_s, mask_s = keys, features, coords, mask
    else:
        perm = jnp.argsort(keys, axis=-1)
        key_s = jnp.take_along_axis(keys, perm, axis=1)
        feat_s = jnp.take_along_axis(features, perm[..., None], axis=1)
        coords_s = jnp.take_along_axis(coords, perm[..., None], axis=1)
        mask_s = jnp.take_along_axis(mask, perm, axis=1)

    # per-tap delta in the permuted raster order (offsets permuted the
    # same way keep _neighbor_query_flat's bounds/sentinel semantics)
    axes = _axes_order(major)
    offsets_p = [tuple(o[a] for a in axes) for o in offsets]
    deltas = [op[1] * g + op[2] for op in offsets_p]
    dmin = min(deltas)

    # query ids in the permuted space, blocked (B, T, Q, K)
    qf = _neighbor_query_flat(
        coords_s[..., axes], mask_s, offsets_p, g
    ).reshape(b, t, q_block, k)

    # window start per block: first sorted row with id >= q0 + dmin
    q0 = key_s[:, ::q_block]                                  # (B, T)
    s0 = jax.vmap(
        functools.partial(jnp.searchsorted, method="compare_all")
    )(key_s, q0 + dmin)                                       # (B, T)
    idx = s0[..., None] + jnp.arange(w_rows, dtype=s0.dtype)  # (B, T, W)
    in_arr = idx < u
    idxc = jnp.minimum(idx, u - 1).reshape(b, t * w_rows)
    key_w = jnp.take_along_axis(key_s, idxc, axis=1).reshape(b, t, w_rows)
    key_w = jnp.where(in_arr, key_w, -7)  # never equals a query id
    feat_w = jnp.take_along_axis(
        feat_s, idxc[..., None], axis=1
    ).reshape(b, t, w_rows, c)

    cdt = compute_dtype
    match = (
        qf[..., None] == key_w[:, :, None, None, :]
    ).astype(cdt)                                             # (B,T,Q,K,W)
    nb = jnp.einsum(
        "btqkw,btwc->btqkc", match, feat_w.astype(cdt),
        preferred_element_type=jnp.float32,
    ).astype(cdt)                                             # exact: one hit
    out_s = jnp.einsum(
        "btqkc,kcd->btqd", nb, weights.astype(cdt),
        preferred_element_type=jnp.float32,
    ).reshape(b, u, d)

    if perm is None:
        return out_s
    inv = jnp.argsort(perm, axis=-1)
    return jnp.take_along_axis(out_s, inv[..., None], axis=1)


def _use_match_conv(compute_dtype) -> bool:
    """The one-hot-einsum path needs a low-precision compute dtype (the
    match matrix would otherwise round gathered f32 features) and only
    pays off where matmuls beat gathers (TPU)."""
    return (
        compute_dtype is not None
        and jnp.dtype(compute_dtype).itemsize <= 2
        and jax.default_backend() == "tpu"
    )


def subm_conv(
    sg: SparseGrid,
    lookup: Array,
    weights: Array,
    kernel_size: tuple[int, int, int],
    compute_dtype=None,
) -> SparseGrid:
    """Submanifold sparse conv: output at input sites only
    (spconv.SubMConv3d semantics). weights: (K, Cin, Cout) with K =
    prod(kernel_size), offset-ordered per ``kernel_offsets``.

    One fused neighbor gather + ONE (B·V)·(K·Cin)×(K·Cin, Cout) MXU
    contraction (im2col over the sparse sites)."""
    offsets = kernel_offsets(kernel_size)
    assert weights.shape[0] == len(offsets)
    feats = sg.features * sg.mask[..., None].astype(sg.features.dtype)
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)  # halves the gather's HBM traffic
    if _use_match_conv(compute_dtype):
        g = sg.grid_size
        v = sg.coords.shape[1]
        major = _band_major_axis(offsets)
        if (
            not _BANDED_DISABLED
            and major is not None
            and v % _BAND_Q == 0
            and v > _band_width(g, _BAND_Q)
        ):
            out = _banded_match_subm(
                feats, sg.coords, sg.mask, offsets, weights, g,
                compute_dtype, assume_sorted=(major == 0),
            )
            return SparseGrid(out, sg.coords, sg.mask, sg.grid_size)
        src_flat = _flat_coords(sg.coords, sg.mask, g, g * g * g)
        qf = _neighbor_query_flat(sg.coords, sg.mask, offsets, g)
        out = _match_conv(feats, src_flat, qf, weights, compute_dtype)
        return SparseGrid(out, sg.coords, sg.mask, sg.grid_size)
    nb = _gather_all_neighbors(
        feats, lookup, sg.coords, sg.mask, offsets, sg.grid_size,
    )                                                          # (B, V, K, C)
    out = _conv_contract(nb, weights, compute_dtype)
    return SparseGrid(out, sg.coords, sg.mask, sg.grid_size)


def sparse_conv_down(
    sg: SparseGrid,
    lookup: Array,
    weights: Array,
    stride: tuple[int, int, int] = (2, 2, 2),
    compute_dtype=None,
    out_capacity: int | None = None,
) -> SparseGrid:
    """Strided sparse conv (kernel 3, padding 1): downsample to
    grid_size' = ceil(G / stride) with the exact spconv.SparseConv3d
    output-site rule (see ``downsample_sites``). weights:
    (27, Cin, Cout)."""
    out_coords, out_mask, out_g = downsample_sites(sg, stride, out_capacity)
    out_feats = sparse_conv_down_features(
        sg, lookup, weights, out_coords, out_mask, stride, compute_dtype
    )
    return SparseGrid(out_feats, out_coords, out_mask, out_g)


def downsample_sites(sg: SparseGrid, stride: tuple[int, int, int],
                     out_capacity: int | None = None):
    """(out_coords (B, V, 3), out_mask (B, V), out_grid_size): the EXACT
    spconv output sites of a kernel-3 / padding-1 strided conv, packed.
    Integer-only — separated from the feature computation so the conv
    body can sit under ``jax.checkpoint`` without recomputing the dedupe.

    Exact rule (utils/mm3d_pn2/ops/spconv/ops.py:46-174 semantics):
    output site o covers input c iff o·s − 1 ≤ c ≤ o·s + 1 per dim, so
    each input contributes o ∈ {c>>1} ∪ {c>>1 + 1 if c odd} on stride-2
    dims and o ∈ {c−1, c, c+1} on stride-1 dims. The r1-r4 version kept
    only unique(c // s) — the center-ish taps — which measured as a
    **37% site undercount** on voxelized MVP-like partial clouds
    (BENCH_NOTES r5; the "negligible on dense grids" assumption does not
    hold on sparse surface shells). The feature paths were always
    site-list-agnostic, so exact coverage costs nothing: shapes stay
    (B, V) fixed-capacity. ``out_capacity`` overrides the output row
    capacity (default: the input's V). If the exact site count exceeds
    it, the highest flat ids are dropped deterministically — never hit
    at MVP scale (~760 sites vs V = 2048), but reachable on tiny grids
    where dilation multiplies few input rows."""
    g = sg.grid_size
    v = out_capacity or sg.coords.shape[1]
    # Single cubic extent covering all (possibly anisotropic-stride) dims.
    out_g = max(-(-g // stride[i]) for i in range(3))
    dims_ext = [-(-g // stride[i]) for i in range(3)]

    cands = [range(2) if stride[i] == 2 else range(3) for i in range(3)]
    flats = []
    for combo in itertools.product(*cands):
        o_dims = []
        valid = sg.mask
        for i, e in enumerate(combo):
            ci = sg.coords[..., i]
            if stride[i] == 2:
                o = (ci >> 1) + e
                if e:  # the +1 site is reachable only from odd coords
                    valid = valid & ((ci & 1) == 1) & (o < dims_ext[i])
            else:  # stride-1 dim: kernel 3 dilates ±1
                o = ci + (e - 1)
                valid = valid & (o >= 0) & (o < dims_ext[i])
            o_dims.append(o)
        f = (o_dims[0] * out_g + o_dims[1]) * out_g + o_dims[2]
        flats.append(jnp.where(valid, f, out_g**3))
    flat = jnp.stack(flats, axis=-1).reshape(sg.coords.shape[0], -1)

    def dedupe(f):
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

    out_coords, out_mask = jax.vmap(dedupe)(flat)
    return out_coords, out_mask, out_g


def sparse_conv_down_features(
    sg: SparseGrid, lookup: Array, weights: Array,
    out_coords: Array, out_mask: Array, stride: tuple[int, int, int],
    compute_dtype=None,
) -> Array:
    """Feature half of the strided conv: for each output site, all 27 taps
    at position out*stride + off are gathered in one fused pass and
    contracted in ONE einsum (see _gather_all_neighbors)."""
    s = jnp.array(stride, jnp.int32)
    offsets = kernel_offsets((3, 3, 3))
    feats = sg.features
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)  # halves the gather's HBM traffic
    base = out_coords * s[None, None]
    if _use_match_conv(compute_dtype):
        g = sg.grid_size
        feats = feats * sg.mask[..., None].astype(feats.dtype)
        if not _SCATTER_DOWN_DISABLED:
            out_g = max(-(-g // stride[i]) for i in range(3))
            out_flat = _flat_coords(out_coords, out_mask, out_g, -2)
            return _scatter_match_down(
                feats, sg.coords, sg.mask, out_flat, out_g, weights,
                stride, g, compute_dtype,
            )
        src_flat = _flat_coords(sg.coords, sg.mask, g, g * g * g)
        qf = _neighbor_query_flat(base, out_mask, offsets, g)
        return _match_conv(feats, src_flat, qf, weights, compute_dtype)
    nb = _gather_all_neighbors(
        feats, lookup, base,
        out_mask, offsets, sg.grid_size,
    )                                                          # (B, V, 27, C)
    return _conv_contract(nb, weights, compute_dtype)


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
