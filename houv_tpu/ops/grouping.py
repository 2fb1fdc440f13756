"""Gather / grouping / kNN / ball query — TPU-native.

Replacements for the reference CUDA ops (utils/mm3d_pn2/ops/{gather_points,
group_points,knn,ball_query}). On TPU these are XLA gathers and blockwise
distance + top_k — no custom kernels needed; gathers are differentiable
(their transpose is the scatter-add the CUDA backward implements by hand,
e.g. gather_points.py:14-49, group_points.py custom backward).

Feature layout convention matches the reference: features are channel-major
(B, C, N) where noted, clouds are (B, N, 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from houv_tpu.ops.chamfer import pairwise_sqdist

Array = jax.Array


def gather_points(features: Array, idx: Array) -> Array:
    """(B, C, N) × (B, M) int -> (B, C, M). Differentiable in features."""
    return jnp.take_along_axis(features, idx[:, None, :], axis=2)


def grouping_operation(features: Array, idx: Array) -> Array:
    """(B, C, N) × (B, npoint, nsample) int -> (B, C, npoint, nsample)."""
    bsz, c, _ = features.shape
    npoint, nsample = idx.shape[1], idx.shape[2]
    flat = jnp.take_along_axis(
        features, idx.reshape(bsz, 1, npoint * nsample), axis=2
    )
    return flat.reshape(bsz, c, npoint, nsample)


def index_points(points: Array, idx: Array) -> Array:
    """(B, N, C) × (B, ...) int -> (B, ..., C)
    (reference completion/model_utils.py index_points)."""
    bsz = points.shape[0]
    c = points.shape[-1]
    out_shape = idx.shape + (c,)
    flat_idx = idx.reshape(bsz, -1)
    out = jnp.take_along_axis(points, flat_idx[..., None], axis=1)
    return out.reshape(out_shape)


def _extract_k_nearest(dist, idx_ref, *, k: int, n_valid: int,
                       idx_bits: int):
    """Shared tail of the kNN kernels: pack (ordered -dist, index) into one
    int32 per candidate, then k iterations of max + mask-out (the packed
    score+index trick from ops/chamfer.py). Requires dist >= 0 (the
    bitcast ordering trick assumes -dist has its sign bit set)."""
    tile, np_ = dist.shape
    low = (1 << idx_bits) - 1
    neg_inf = -(2**31) + 1
    order_flip = 0x7FFFFFFF
    ordered = jax.lax.bitcast_convert_type(-dist, jnp.int32) ^ order_flip
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, np_), 1)
    keys = jnp.bitwise_or(
        jnp.bitwise_and(ordered, ~jnp.int32(low)), low - col
    )
    if n_valid < np_:
        keys = jnp.where(col < n_valid, keys, neg_inf)
    # fori_loop (not a python unroll): the body compiles once, keeping the
    # Mosaic compile time O(1) in k (an unrolled k=16 loop took ~3 min).
    # Result columns land in a (TILE, k) carry via a lane-mask select
    # (dynamic lane stores need 128-aligned offsets on TPU).
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, k), 1)

    def extract(j, carry):
        keys, acc = carry
        m = jnp.max(keys, axis=1)                  # (TILE,) packed best
        val = low - jnp.bitwise_and(m, low)
        acc = jnp.where(lane == j, val[:, None], acc)
        keys = jnp.where(keys == m[:, None], neg_inf, keys)
        return keys, acc

    _, acc = jax.lax.fori_loop(
        0, k, extract, (keys, jnp.zeros((tile, k), jnp.int32))
    )
    idx_ref[0, :, :] = acc


def _knn_kernel(q_ref, rt_ref, idx_ref, *, k: int, n_valid: int,
                idx_bits: int):
    """Blockwise kNN: one (query-tile × full-ref) distance block in VMEM,
    k nearest extracted by iterative packed-int max + mask-out. Never
    materializes (B, M, N) in HBM and replaces lax.top_k's full bitonic
    sort with 2k cheap passes."""
    q = q_ref[0]            # (TILE, 8)
    rt = rt_ref[0]          # (8, Np)
    dist = (
        jnp.square(q[:, 0:1] - rt[0:1, :])
        + jnp.square(q[:, 1:2] - rt[1:2, :])
        + jnp.square(q[:, 2:3] - rt[2:3, :])
    )
    _extract_k_nearest(dist, idx_ref, k=k, n_valid=n_valid,
                       idx_bits=idx_bits)


def _knn_kernel_wide(q_ref, rt_ref, idx_ref, *, k: int, n_valid: int,
                     idx_bits: int):
    """Feature-space kNN (C > 8 dims): distances via an in-kernel MXU dot,
    |q|² - 2q·r + |r|², clamped at 0 so the packed ordering contract of
    ``_extract_k_nearest`` holds under the ~1e-6 cancellation floor.
    Selection precision is the a²-2ab form in f32 — the same contract as
    the f32 lax.top_k fallback at these channel widths (ECG DenseConv
    pins selection inputs to f32 for exactly this reason)."""
    q = q_ref[0]            # (TILE, Cp)
    rt = rt_ref[0]          # (Cp, Np)
    dot = jnp.dot(q, rt, preferred_element_type=jnp.float32)
    qsq = jnp.sum(q * q, axis=1, keepdims=True)    # (TILE, 1)
    rsq = jnp.sum(rt * rt, axis=0, keepdims=True)  # (1, Np)
    dist = jnp.maximum(qsq - 2.0 * dot + rsq, 0.0)
    _extract_k_nearest(dist, idx_ref, k=k, n_valid=n_valid,
                       idx_bits=idx_bits)


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def knn_indices_pallas(query: Array, ref: Array, k: int, tile: int = 256,
                       interpret: bool = False) -> Array:
    """(B, M, C) × (B, N, C) -> (B, M, k) int32 nearest-ref indices,
    ascending by distance (ties: smaller index first). C <= 8 takes the
    coordinate kernel (exact (a-b)² distances); wider C takes the MXU
    kernel (a²-2ab+b² distances, f32)."""
    bsz, m, dim = query.shape
    n = ref.shape[1]
    lane = 128
    tile = min(tile, -(-m // lane) * lane)
    mp = -(-m // tile) * tile
    np_ = -(-n // lane) * lane
    idx_bits = int(np_ - 1).bit_length()

    wide = dim > 8
    cp = -(-dim // lane) * lane if wide else 8
    kernel = _knn_kernel_wide if wide else _knn_kernel

    q_pad = jnp.pad(
        query.astype(jnp.float32),
        ((0, 0), (0, mp - m), (0, cp - dim)),
    )
    rt = jnp.swapaxes(ref.astype(jnp.float32), 1, 2)
    rt = jnp.pad(rt, ((0, 0), (0, cp - dim), (0, np_ - n)))

    idx = pl.pallas_call(
        functools.partial(
            kernel, k=k, n_valid=n, idx_bits=idx_bits
        ),
        grid=(bsz, mp // tile),
        in_specs=[
            pl.BlockSpec((1, tile, cp), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp, np_), lambda bi, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k), lambda bi, mi: (bi, mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, mp, k), jnp.int32),
        interpret=interpret,
    )(q_pad, rt)
    return idx[:, :m]


def knn_points(query: Array, ref: Array, k: int,
               use_pallas: bool | None = None) -> tuple[Array, Array]:
    """k nearest ref-points for each query point.

    (B, M, 3) query × (B, N, 3) ref -> (neg_sqdist (B, M, k), idx (B, M, k)).
    Values are NEGATED squared distances sorted descending, matching the
    reference's ``knn_point`` (completion/model_utils.py:277-289) which
    topk's the negated distance matrix.

    On TPU the blockwise Pallas kernel finds the indices without the
    (B, M, N) HBM buffer (VERDICT r1 weak #7); the values are recomputed
    differentiably from the selected pairs, so gradients (repulsion /
    uniform losses) flow exactly as through top_k.
    """
    if use_pallas is None:
        # only worth a kernel when the (B, M, N) buffer is actually big:
        # each pallas_call instance adds Mosaic compile time, and lax.top_k
        # is fine at small N (the deep SA-SKN levels). Gate at 2^23: TPU
        # top_k lowers to a full stable sort, and the champion step's
        # mid-size levels ((16, 1536, 768) ≈ 19M) measured 5-7 ms as sorts
        # vs ~1 ms as kernel calls (vrcnet profile, BENCH_NOTES r3 final).
        from houv_tpu.ops.chamfer import _use_pallas

        use_pallas = (
            _use_pallas()  # backend gate + HOUV_NO_PALLAS kill-switch
            and query.shape[0] * query.shape[1] * ref.shape[1] >= 2**23
        )
    dim = query.shape[-1]
    # wide (feature-space) kernel VMEM gate: the (Cp, Np) ref-transpose +
    # (TILE, Np) distance block must fit comfortably (~8 MB of 16 MB VMEM)
    np_pad = -(-ref.shape[1] // 128) * 128
    cp_pad = -(-dim // 128) * 128
    wide_ok = dim > 8 and (cp_pad + 256 + 256) * np_pad * 4 <= 8 * 2**20
    if use_pallas and (dim <= 8 or wide_ok) and k <= 64:
        # stop-grad the INPUTS: pallas_call has no JVP rule, and the
        # argmin indices are piecewise-constant anyway
        idx = knn_indices_pallas(
            jax.lax.stop_gradient(query), jax.lax.stop_gradient(ref), k
        )
        nb = jax.vmap(lambda r, i: r[i])(ref, idx)  # (B, M, k, C)
        neg = -jnp.sum((query[:, :, None, :] - nb) ** 2, axis=-1)
        return neg, idx
    d = pairwise_sqdist(query, ref)
    neg, idx = jax.lax.top_k(-d, k)
    return neg, idx.astype(jnp.int32)


def knn(x: Array, k: int) -> Array:
    """Self-kNN over channel-major features: (B, C, N) -> (B, N, k) indices
    (reference completion/model_utils.py:258-264; includes self)."""
    pts = jnp.swapaxes(x, 1, 2)
    _, idx = knn_points(pts, pts, k)
    return idx


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query(
    min_radius: float,
    max_radius: float,
    nsample: int,
    xyz: Array,
    center_xyz: Array,
) -> Array:
    """Fixed-radius neighborhood indices, CUDA-kernel-compatible semantics
    (utils/mm3d_pn2/ops/ball_query/src/ball_query_cuda.cu):

    - a point qualifies if d² == 0 or min_r² <= d² < max_r²,
    - the first ``nsample`` qualifying points in index order are returned,
    - slots past the count repeat the first qualifying index,
    - centers with no qualifying point return all-zeros.

    xyz: (B, N, 3), center_xyz: (B, M, 3) -> (B, M, nsample) int32.
    """
    n = xyz.shape[1]
    d2 = pairwise_sqdist(center_xyz, xyz)  # (B, M, N)
    mask = jnp.logical_or(
        d2 == 0.0,
        jnp.logical_and(d2 >= min_radius**2, d2 < max_radius**2),
    )
    # Key = own index for valid points, n + index for invalid: top_k of the
    # negated key returns the first `nsample` valid indices in index order.
    pos = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(mask, pos, pos + n)
    _, idx = jax.lax.top_k(-keys, nsample)  # (B, M, nsample), ascending keys
    idx = idx.astype(jnp.int32)
    count = jnp.sum(mask, axis=-1, dtype=jnp.int32)[..., None]  # (B, M, 1)
    slot = jnp.arange(nsample, dtype=jnp.int32)
    first = idx[..., 0:1]
    idx = jnp.where(slot < count, idx, first)
    return jnp.where(count > 0, idx, 0)


def query_and_group(
    xyz: Array,
    center_xyz: Array,
    features: Array | None,
    *,
    nsample: int,
    max_radius: float | None,
    min_radius: float = 0.0,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
) -> Array:
    """Ball-query (or kNN when max_radius is None) + grouping + center-subtract,
    the reference's ``QueryAndGroup`` module
    (utils/mm3d_pn2/ops/group_points/group_points.py:60-120).

    xyz (B, N, 3), center_xyz (B, M, 3), features (B, C, N) or None
    -> (B, C(+3), M, nsample).
    """
    if max_radius is None:
        _, idx = knn_points(center_xyz, xyz, nsample)
    else:
        idx = ball_query(min_radius, max_radius, nsample, xyz, center_xyz)
    xyz_t = jnp.swapaxes(xyz, 1, 2)  # (B, 3, N)
    grouped_xyz = grouping_operation(xyz_t, idx)  # (B, 3, M, nsample)
    grouped_xyz = grouped_xyz - jnp.swapaxes(center_xyz, 1, 2)[..., None]
    if normalize_xyz and max_radius is not None:
        grouped_xyz = grouped_xyz / max_radius
    if features is None:
        return grouped_xyz
    grouped = grouping_operation(features, idx)  # (B, C, M, nsample)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped], axis=1)
    return grouped
