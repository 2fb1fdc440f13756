"""Rotated-box ops + PAConv scoring — TPU-native.

Completes the reference's vendored op inventory (SURVEY.md §2.1 rows the
MVP workloads themselves never call, kept for drop-in capability):

- utils/mm3d_pn2/ops/iou3d (iou3d_kernel.cu: rotated BEV IoU + NMS),
- utils/mm3d_pn2/ops/roiaware_pool3d (points-in-rotated-boxes + pooling),
- utils/mm3d_pn2/ops/paconv (assign_score_withk).

All batched jnp: boxes are (x, y, z, dx, dy, dz, yaw) (mmdet3d LiDAR
convention). The CUDA polygon-clipping BEV overlap is replaced by a dense
point-sampling overlap estimate (exact enough for NMS ordering) — the
polygon intersection is inherently scalar-branchy and would fight the VPU;
sampling is embarrassingly vectorizable.
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


@functools.partial(jax.jit, static_argnames=("samples",))
def boxes_iou_bev(boxes_a: Array, boxes_b: Array, samples: int = 24) -> Array:
    """(Na, 7) × (Nb, 7) -> (Na, Nb) rotated BEV IoU (sampling-based
    overlap; replaces iou3d_kernel.cu's polygon clipping)."""
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


@functools.partial(jax.jit, static_argnames=("max_out", "samples"))
def nms_bev(boxes: Array, scores: Array, iou_threshold: float = 0.5,
            max_out: int = 128, samples: int = 24) -> tuple[Array, Array]:
    """Greedy rotated-BEV NMS (iou3d.cpp nms_gpu semantics), static shapes.

    Returns (indices (max_out,) int32 padded with -1, keep_mask)."""
    n = boxes.shape[0]
    iou = boxes_iou_bev(boxes, boxes, samples)

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
