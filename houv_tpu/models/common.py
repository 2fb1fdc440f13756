"""Shared model blocks (flax.linen), TPU-first.

Replaces the reference's shared torch helpers (completion/model_utils.py:
119-305 graph features / grids / sampling, registration/model_utils.py:16-258
attention / conv blocks / SVD head, EF_expansion at completion/
model_utils.py:24-55).

Layout convention: features-last (B, N, C) everywhere — C rides the TPU
lane dimension and pointwise convs become plain Dense layers that XLA maps
straight onto the MXU (the reference's (B, C, N) Conv1d-with-kernel-1
pattern is a torch idiom, not a layout we want on TPU).

Cross-replica BatchNorm: flax BatchNorm(axis_name='data') psums batch stats
over the mesh — this replaces NaiveSyncBatchNorm's hand-rolled all_gather
autograd Function (utils/mm3d_pn2/ops/norm.py:9-24).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from houv_tpu.geometry.kabsch import weighted_kabsch
from houv_tpu.ops.gather import gather_edge_features
from houv_tpu.ops.grouping import (
    gather_points,
    grouping_operation,
    knn,
    knn_points,
    ball_query,
)
from houv_tpu.ops.sampling import furthest_point_sample

Array = jax.Array


class PointMLP(nn.Module):
    """Per-point MLP over (B, N, C) — the reference's stacks of
    Conv1d(kernel=1)+ReLU. relu_last controls the final activation.

    dtype: compute dtype (bf16 = AMP; params and BN stats stay f32, the
    output is cast back to f32 at the module boundary)."""

    features: Sequence[int]
    relu_last: bool = False
    use_bn: bool = False
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            last = i == len(self.features) - 1
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                )(x)
            if not last or self.relu_last:
                x = nn.relu(x)
        return x.astype(jnp.float32)


def max_pool_points(x: Array) -> Array:
    """Global feature: max over the point axis. (B, N, C) -> (B, C).

    The optimization_barrier works around an XLA TPU fusion-pass crash
    (fusion_util.cc TransformWindow Check failure) that fires when this
    reduce is fused with the broadcast-concat-matmul consumer pattern the
    PointNet-style encoders use; the (B, C) barrier costs nothing."""
    return jax.lax.optimization_barrier(jnp.max(x, axis=-2))


def gen_grid(num_grid_point: int) -> Array:
    """(num², 2) folding grid in [-0.05, 0.05]²
    (reference completion/model_utils.py:135-139, returned features-last)."""
    x = jnp.linspace(-0.05, 0.05, num_grid_point)
    gx, gy = jnp.meshgrid(x, x, indexing="ij")
    return jnp.stack([gx, gy], axis=-1).reshape(num_grid_point**2, 2)


def gen_1d_grid(num_grid_point: int) -> Array:
    return jnp.linspace(-0.05, 0.05, num_grid_point).reshape(num_grid_point, 1)


def gen_grid_up(up_ratio: int, grid_size: float = 0.2) -> Array:
    """(up_ratio, 2) grid offsets for folding decoders
    (reference completion/model_utils.py:148-161)."""
    sqrted = int(math.sqrt(up_ratio)) + 1
    num_x, num_y = 1, up_ratio
    for i in reversed(range(1, sqrted + 1)):
        if up_ratio % i == 0:
            num_x, num_y = i, up_ratio // i
            break
    gx = jnp.linspace(-grid_size, grid_size, num_x)
    gy = jnp.linspace(-grid_size, grid_size, num_y)
    x, y = jnp.meshgrid(gx, gy, indexing="ij")
    return jnp.stack([x, y], axis=-1).reshape(up_ratio, 2)


def get_graph_feature(x: Array, k: int = 20, minus_center: bool = True) -> Array:
    """DGCNN edge features (reference completion/model_utils.py:164-188).

    x: (B, N, C) -> (B, N, k, 2C): [center, neighbor - center] (or
    [center, neighbor] when minus_center=False).
    """
    _, idx = knn_points(x, x, k)  # (B, N, k)
    neighbors = get_edge_features(x, idx)  # (B, N, k, C)
    center = jnp.broadcast_to(x[:, :, None, :], neighbors.shape)
    if minus_center:
        return jnp.concatenate([center, neighbors - center], axis=-1)
    return jnp.concatenate([center, neighbors], axis=-1)


def get_edge_features(x: Array, idx: Array) -> Array:
    """Gather neighbor features by precomputed kNN indices:
    (B, N, C) × (B, M, k) -> (B, M, k, C). One-hot matmul on TPU at hot
    sizes (ops/gather.py), take_along_axis elsewhere."""
    return gather_edge_features(x, idx)


class EFExpansion(nn.Module):
    """Edge-aware feature expansion (upsampling ×step_ratio)
    (reference completion/model_utils.py:24-55, used by ECG/VRCNet decoders).

    (B, N, C_in) -> (B, N·step_ratio, C_out)."""

    input_size: int
    output_size: int = 64
    step_ratio: int = 2
    k: int = 4
    dtype: object = None  # bf16 = AMP (kNN selection stays f32, out f32)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, _ = x.shape
        edge = get_graph_feature(
            x.astype(jnp.float32), self.k, minus_center=False
        )  # (B,N,k,2C); selection in f32 (see DenseConv note in ecg.py)
        if self.dtype is not None:
            edge = edge.astype(self.dtype)
        ef = nn.Dense(self.output_size, dtype=self.dtype)(edge)
        ef = nn.relu(jnp.concatenate([ef, edge], axis=-1))
        ef = nn.relu(
            nn.Dense(self.output_size * self.step_ratio, dtype=self.dtype)(ef)
        )
        # (B, N, k, C_out·r) -> (B, N·r, k, C_out)
        ef = ef.reshape(b, n, self.k, self.step_ratio, self.output_size)
        ef = jnp.swapaxes(ef, 2, 3).reshape(
            b, n * self.step_ratio, self.k, self.output_size
        )
        ef = nn.Dense(self.output_size, dtype=self.dtype)(ef)
        return jnp.max(ef, axis=2).astype(jnp.float32)


def attention(query: Array, key: Array, value: Array,
              mask: Array | None = None):
    """Scaled dot-product attention (reference registration/model_utils.py
    ``attention``). Shapes (..., L, D)."""
    d_k = query.shape[-1]
    scores = jnp.einsum("...qd,...kd->...qk", query, key) / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask == 0, -1e9, scores)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p, value), p


class MultiHeadAttention(nn.Module):
    """Multi-head attention with per-head projections (the reference's
    clones(Linear)x4 pattern in DCP's transformer).

    dtype: compute dtype (bf16 = AMP; params stay f32, softmax runs in the
    compute dtype — attention logits are pre-scaled so bf16 is safe)."""

    n_heads: int
    d_model: int
    dtype: object = None

    @nn.compact
    def __call__(self, query, key, value, mask=None):
        d_k = self.d_model // self.n_heads
        b = query.shape[0]

        def split(x, dense):
            h = dense(x)  # (B, L, d_model)
            return h.reshape(b, -1, self.n_heads, d_k).transpose(0, 2, 1, 3)

        q = split(query, nn.Dense(self.d_model, dtype=self.dtype))
        k = split(key, nn.Dense(self.d_model, dtype=self.dtype))
        v = split(value, nn.Dense(self.d_model, dtype=self.dtype))
        out, _ = attention(q, k, v, mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype)(out)


def edge_preserve_sampling(
    features: Array, points: Array, num_samples: int, k: int = 10,
    precomputed: tuple | None = None,
):
    """FPS + neighborhood-max pooling (reference completion/
    model_utils.py:90-117).

    features (B, N, C), points (B, N, 3) ->
      (pooled (B, M, 2C), fps_idx (B, M), sampled points (B, M, 3)).

    ``precomputed``: optional (p_idx, pn_idx, sampled) triple from
    ``vrcnet.saskn_geometry`` — the FPS/kNN indices depend only on the
    coordinates, so callers under ``nn.remat`` hoist them out of the
    checkpointed region (saved as residuals instead of recomputed by the
    backward pass)."""
    if precomputed is not None:
        p_idx, pn_idx, sampled = precomputed
    else:
        p_idx = furthest_point_sample(points, num_samples)
        sampled = jnp.take_along_axis(points, p_idx[..., None], axis=1)
        pk = min(k, points.shape[1])
        _, pn_idx = knn_points(sampled, points, pk)  # (B, M, pk)
    neighbor = get_edge_features(features, pn_idx).max(axis=2)  # (B, M, C)
    center = jnp.take_along_axis(features, p_idx[..., None], axis=1)
    return jnp.concatenate([center, neighbor], axis=-1), p_idx, sampled


def symmetric_sample(points: Array, num: int) -> Array:
    """FPS then mirror in z (reference completion/model_utils.py:309-319).
    (B, N, 3) -> (B, 2·num, 3)."""
    idx = furthest_point_sample(points, num)
    fps = jnp.take_along_axis(points, idx[..., None], axis=1)
    flipped = fps * jnp.array([1.0, 1.0, -1.0], fps.dtype)
    return jnp.concatenate([fps, flipped], axis=1)


def get_repulsion_loss(pred: Array, nsample: int = 20, radius: float = 0.07,
                       h: float = 0.03) -> Array:
    """Repulsion loss (reference completion/model_utils.py:190-213)."""
    neg, idx = knn_points(pred, pred, nsample)
    d2 = -neg  # (B, N, nsample) squared dists, ascending
    d2 = d2[..., 1:5]  # 4 nearest excluding self (reference: topk 5 minus first)
    d2 = jnp.maximum(d2, 1e-12)
    dist = jnp.sqrt(d2)
    weight = jnp.exp(-d2 / (h * h))
    return jnp.mean(radius - dist * weight)


def get_uniform_loss(
    pcd: Array,
    percentages=(0.004, 0.006, 0.008, 0.010, 0.012),
    radius: float = 1.0,
) -> Array:
    """Uniformity loss over FPS-seeded ball neighborhoods
    (reference completion/model_utils.py:216-243)."""
    b, n, _ = pcd.shape
    npoint = max(int(n * 0.05), 1)  # tiny clouds: keep >=1 FPS seed
    loss = 0.0
    for p in percentages:
        nsample = max(int(n * p), 2)
        r = math.sqrt(p * radius)
        disk_area = math.pi * radius**2 * p / nsample
        expect_len = math.sqrt(disk_area)
        seed_idx = furthest_point_sample(pcd, npoint)
        new_xyz = jnp.take_along_axis(pcd, seed_idx[..., None], axis=1)
        idx = ball_query(0.0, r, nsample, pcd, new_xyz)  # (B, npoint, nsample)
        grouped = jnp.take_along_axis(
            pcd, idx.reshape(b, -1)[..., None], axis=1
        ).reshape(b * npoint, nsample, 3)
        neg, _ = knn_points(grouped, grouped, 2)
        uniform_d2 = -neg[..., 1:]  # nearest excluding self
        uniform_dist = jnp.sqrt(jnp.abs(uniform_d2) + 1e-8).mean(axis=-1)
        term = ((uniform_dist - expect_len) ** 2 / (expect_len + 1e-8)).mean()
        loss = loss + term * (p * 100) ** 2
    return loss / len(percentages)


def svd_head(
    src: Array, tgt_corr: Array, weights: Array | None = None,
    stop_grad: bool = False
):
    """Weighted-Procrustes head shared by DCP/DeepGMR/IDAM
    (reference registration/models/dcp.py:331-381's per-sample torch.svd
    loop, vectorized). Returns (R, t) aligning src -> tgt_corr."""
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    if stop_grad:  # IDAM detaches SVD from backprop (idam.py:337-338)
        src = jax.lax.stop_gradient(src)
        tgt_corr = jax.lax.stop_gradient(tgt_corr)
        weights = jax.lax.stop_gradient(weights)
    return weighted_kabsch(src, tgt_corr, weights)
