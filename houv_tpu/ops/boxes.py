"""Rotated-box ops + PAConv scoring — TPU-native.

Completes the reference's vendored op inventory (SURVEY.md §2.1 rows the
MVP workloads themselves never call, kept for drop-in capability):

- utils/mm3d_pn2/ops/iou3d (iou3d_kernel.cu: rotated BEV IoU + NMS),
- utils/mm3d_pn2/ops/roiaware_pool3d (points-in-rotated-boxes + pooling),
- utils/mm3d_pn2/ops/paconv (assign_score_withk).

All batched jnp: boxes are (x, y, z, dx, dy, dz, yaw) (mmdet3d LiDAR
convention). The CUDA polygon-clipping BEV overlap is reproduced EXACTLY:
a static-shape Sutherland-Hodgman clip (each step compacts its <=2
emissions per edge with a cumsum scatter) vmapped over all pairs; a
sampling-based estimate remains for very large Na x Nb.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _in_rotated_rect(px: Array, py: Array, boxes: Array) -> Array:
    """(..., P) points vs (..., 7) boxes (broadcast): inside BEV footprint."""
    cx, cy = boxes[..., 0:1], boxes[..., 1:2]
    dx, dy = boxes[..., 3:4], boxes[..., 4:5]
    yaw = boxes[..., 6:7]
    c, s = jnp.cos(-yaw), jnp.sin(-yaw)
    lx = (px - cx) * c - (py - cy) * s
    ly = (px - cx) * s + (py - cy) * c
    return (jnp.abs(lx) <= dx / 2) & (jnp.abs(ly) <= dy / 2)


_MAXV = 16  # quad ∩ quad has ≤ 8 vertices; headroom for intermediates


def _rect_corners(box: Array) -> Array:
    """(7,) box -> (4, 2) CCW BEV corners."""
    cx, cy, dx, dy, yaw = box[0], box[1], box[3], box[4], box[6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = jnp.array([0.5, -0.5, -0.5, 0.5]) * dx
    ly = jnp.array([0.5, 0.5, -0.5, -0.5]) * dy
    return jnp.stack(
        [cx + lx * c - ly * s, cy + lx * s + ly * c], axis=-1
    )


def _clip_halfplane(poly: Array, m: Array, p0: Array, p1: Array):
    """Sutherland-Hodgman step: clip (MAXV, 2) polygon with m valid CCW
    vertices against the half-plane left of p0->p1. Static shapes: each
    input edge emits ≤2 output slots, compacted by a cumsum scatter."""
    idx = jnp.arange(_MAXV)
    nxt = poly[jnp.mod(idx + 1, jnp.maximum(m, 1))]
    d = p1 - p0

    def side(v):
        return d[0] * (v[..., 1] - p0[1]) - d[1] * (v[..., 0] - p0[0])

    s_cur = side(poly)
    s_nxt = side(nxt)
    in_cur = s_cur >= 0
    in_nxt = s_nxt >= 0
    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    inter = poly + t[:, None] * (nxt - poly)

    active = idx < m
    keep_cur = in_cur & active
    keep_int = (in_cur != in_nxt) & active
    # interleave [cur_i, inter_i] and compact order-preservingly
    verts = jnp.stack([poly, inter], axis=1).reshape(2 * _MAXV, 2)
    valid = jnp.stack([keep_cur, keep_int], axis=1).reshape(2 * _MAXV)
    dest = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = jnp.where(valid, dest, 2 * _MAXV)
    out = jnp.zeros((_MAXV, 2), poly.dtype).at[dest].set(verts, mode="drop")
    return out, jnp.sum(valid.astype(jnp.int32))


def _overlap_exact(box_a: Array, box_b: Array) -> Array:
    """Exact BEV intersection area of two rotated boxes (the computation
    iou3d_kernel.cu does per thread, vectorized under vmap)."""
    pa = jnp.zeros((_MAXV, 2))
    pa = pa.at[:4].set(_rect_corners(box_a))
    m = jnp.int32(4)
    cb = _rect_corners(box_b)
    for e in range(4):
        pa, m = _clip_halfplane(pa, m, cb[e], cb[(e + 1) % 4])
    idx = jnp.arange(_MAXV)
    nxt = pa[jnp.mod(idx + 1, jnp.maximum(m, 1))]
    cross = pa[:, 0] * nxt[:, 1] - pa[:, 1] * nxt[:, 0]
    cross = jnp.where(idx < m, cross, 0.0)
    return jnp.where(m >= 3, 0.5 * jnp.abs(jnp.sum(cross)), 0.0)


@jax.jit
def boxes_overlap_bev(boxes_a: Array, boxes_b: Array) -> Array:
    """(Na, 7) × (Nb, 7) -> (Na, Nb) EXACT rotated BEV overlap areas
    (Sutherland-Hodgman polygon clipping, vmapped over all pairs —
    iou3d_kernel.cu ``boxes_overlap_bev_gpu`` semantics)."""
    return jax.vmap(
        lambda a: jax.vmap(lambda b: _overlap_exact(a, b))(boxes_b)
    )(boxes_a)


@jax.jit
def boxes_iou_bev(boxes_a: Array, boxes_b: Array) -> Array:
    """(Na, 7) × (Nb, 7) -> (Na, Nb) exact rotated BEV IoU."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("samples",))
def boxes_iou_bev_sampled(boxes_a: Array, boxes_b: Array,
                          samples: int = 24) -> Array:
    """(Na, 7) × (Nb, 7) -> (Na, Nb) rotated BEV IoU (sampling-based
    overlap estimate; cheaper than clipping at very large Na×Nb)."""
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]

    # Sample a grid inside each a-box, count how many land inside b.
    u = (jnp.arange(samples) + 0.5) / samples - 0.5
    gx, gy = jnp.meshgrid(u, u, indexing="ij")
    gx = gx.reshape(-1)
    gy = gy.reshape(-1)  # (S²,) in local box coords
    yaw = boxes_a[:, 6:7]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    px = boxes_a[:, 0:1] + gx[None] * boxes_a[:, 3:4] * c \
        - gy[None] * boxes_a[:, 4:5] * s
    py = boxes_a[:, 1:2] + gx[None] * boxes_a[:, 3:4] * s \
        + gy[None] * boxes_a[:, 4:5] * c  # (Na, S²)
    inside = _in_rotated_rect(
        px[:, None, :], py[:, None, :], boxes_b[None, :, :]
    )  # (Na, Nb, S²)
    inter = inside.mean(axis=-1) * area_a[:, None]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_bev(boxes: Array, scores: Array, iou_threshold: float = 0.5,
            max_out: int = 128) -> tuple[Array, Array]:
    """Greedy rotated-BEV NMS (iou3d.cpp nms_gpu semantics), static shapes.

    Returns (indices (max_out,) int32 padded with -1, keep_mask)."""
    n = boxes.shape[0]
    iou = boxes_iou_bev(boxes, boxes)

    def body(i, state):
        keep, alive = state
        # highest-scoring still-alive candidate
        alive_scores = jnp.where(alive, scores, -jnp.inf)
        cand = jnp.argmax(alive_scores).astype(jnp.int32)
        any_alive = jnp.any(alive)
        keep = keep.at[i].set(jnp.where(any_alive, cand, -1))
        # self-IoU is 1 > threshold, so the candidate suppresses itself too
        suppress = (iou[cand] > iou_threshold).at[cand].set(True)
        alive = jnp.where(any_alive, alive & ~suppress, alive)
        return keep, alive

    keep0 = jnp.full((max_out,), -1, jnp.int32)
    alive0 = jnp.ones((n,), bool)
    keep, _ = jax.lax.fori_loop(0, min(max_out, n), body, (keep0, alive0))
    return keep, keep >= 0


@jax.jit
def points_in_boxes(points: Array, boxes: Array) -> Array:
    """(B, N, 3) × (B, K, 7) -> (B, N) int32 index of the first containing
    box, -1 outside all (roiaware_pool3d points_in_boxes semantics)."""
    px = points[:, :, None, 0:1]  # (B, N, 1, 1)
    py = points[:, :, None, 1:2]
    pz = points[..., 2][:, :, None]  # (B, N, 1)
    in_bev = _in_rotated_rect(px, py, boxes[:, None, :, :])[..., 0]  # (B,N,K)
    cz, dz = boxes[..., 2], boxes[..., 5]
    in_z = jnp.abs(pz - cz[:, None, :]) <= dz[:, None, :] / 2
    inside = in_bev & in_z
    k = boxes.shape[1]
    first = jnp.argmax(inside, axis=-1).astype(jnp.int32)
    return jnp.where(inside.any(axis=-1), first, -1)


@jax.jit
def assign_score_withk(scores: Array, point_feats: Array,
                       center_feats: Array, knn_idx: Array) -> Array:
    """PAConv position-adaptive aggregation
    (utils/mm3d_pn2/ops/paconv assign_score_withk):

    scores (B, N, K, M) soft kernel assignments; point_feats/(center_feats)
    (B, N', M, C) per-kernel transformed features; knn_idx (B, N, K).
    out[b, n, k, :] = Σ_m scores · (point_feats[knn] - center_feats[n])."""
    b, n, k = knn_idx.shape
    m, c = point_feats.shape[-2:]
    gathered = jnp.take_along_axis(
        point_feats, knn_idx.reshape(b, n * k)[..., None, None], axis=1
    ).reshape(b, n, k, m, c)
    diff = gathered - center_feats[:, :, None, :, :]
    return jnp.einsum("bnkm,bnkmc->bnkc", scores, diff)
