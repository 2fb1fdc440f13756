"""IDAM — Iterative Distance-Aware similarity Matrix registration (flax).

Reference: registration/models/idam.py. GNN embedding (5 Propagate layers
over a shared kNN(12) graph, :131-148), per-point significance scores, hard
point elimination to N/6 points (GT-guided sampling at train / top-k at
test, :236-258), 3 iterations of similarity-matrix convolution + soft/hybrid
point elimination + weighted SVD with gradients stopped (:267-342), losses =
negative-entropy regression + matching CE + weight BCE (:299-327).

TPU notes: the per-sample torch.svd loop is a batched Kabsch; the train-time
numpy np.random.choice sampling becomes Gumbel-top-k (without replacement,
probability-weighted) under a flax 'sampling' RNG.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from houv_tpu.geometry.rotations import (
    rt_to_transformation,
    rotation_error,
    rotation_geodesic_error,
    rmse_loss,
    translation_error,
)
from houv_tpu.models.common import svd_head
from houv_tpu.ops.grouping import knn_points

Array = jax.Array


class _ConvBlock(nn.Module):
    """Dense+BN+ReLU stack with a plain final Dense (the reference's
    Conv1DBlock/Conv2DBlock with kernel 1).

    dtype: compute dtype for the Dense/BN internals (bf16 = AMP; params
    and BN statistics stay f32). The OUTPUT is always f32 so downstream
    selection/SVD logic keeps reference numerics."""

    channels: tuple
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in self.channels[:-1]:
            x = nn.Dense(f, use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             axis_name=self.axis_name, dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Dense(self.channels[-1], dtype=self.dtype)(x).astype(
            jnp.float32
        )


class Propagate(nn.Module):
    emb_dims: int
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, x: Array, idx: Array, train: bool = False) -> Array:
        """x (B, N, C), idx (B, N, k) -> (B, N, emb)."""
        b, n, c = x.shape
        # vmap row-indexing (backward scatters into (B, N, C), not the
        # full (B, N, N, C) broadcast shape)
        nn_feat = jax.vmap(lambda s, i: s[i])(x, idx)  # (B, N, k, C)
        h = nn_feat - x[:, :, None, :]
        h = _ConvBlock((self.emb_dims, self.emb_dims),
                       axis_name=self.axis_name, dtype=self.dtype)(h, train)
        h = jnp.max(h, axis=2)
        return _ConvBlock((self.emb_dims,), axis_name=self.axis_name,
                          dtype=self.dtype)(h, train)


class GNN(nn.Module):
    emb_dims: int = 64
    axis_name: str | None = None
    dtype: object = None

    @nn.compact
    def __call__(self, pts: Array, train: bool = False) -> Array:
        _, idx = knn_points(pts, pts, 12)
        x = pts
        for _ in range(4):
            x = Propagate(64, self.axis_name, self.dtype)(x, idx, train)
        return Propagate(self.emb_dims, self.axis_name, self.dtype)(
            x, idx, train)


def _gumbel_choice(key: Array, logp: Array, k: int) -> Array:
    """Sample k indices per row without replacement ∝ exp(logp) via
    Gumbel-top-k (replaces the reference's np.random.choice batch loop)."""
    g = jax.random.gumbel(key, logp.shape)
    _, idx = jax.lax.top_k(logp + g, k)
    return idx.astype(jnp.int32)


def _take(x: Array, idx: Array) -> Array:
    """(B, N, ...) × (B, M) -> (B, M, ...)."""
    expand = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, expand, axis=1)


class IDAM(nn.Module):
    descriptor_size: int = 64
    num_iters: int = 3
    axis_name: str | None = None
    # AMP: 'bfloat16' runs the GNN and similarity-conv stacks in bf16
    # (params/BN stats f32, all selection/SVD math f32). None = full f32.
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, src: Array, tgt: Array, t_gt: Array | None = None,
                 prefix: str = "train", train: bool = False):
        b, n, _ = src.shape
        emb = self.descriptor_size
        src_pts_full = src
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None

        emb_nn = GNN(emb, self.axis_name, dt)
        sig_fc = _ConvBlock((64, 32, 1), self.axis_name, dt)
        sim1 = [_ConvBlock((32, 32), self.axis_name, dt) for _ in range(self.num_iters)]
        sim2 = [_ConvBlock((32, 1), self.axis_name, dt) for _ in range(self.num_iters)]
        weight_fc = [_ConvBlock((32, 1), self.axis_name, dt) for _ in range(self.num_iters)]

        src_emb = emb_nn(src, train)
        tgt_emb = emb_nn(tgt, train)
        src_sig = sig_fc(src_emb, train)[..., 0]  # (B, N)
        tgt_sig = sig_fc(tgt_emb, train)[..., 0]

        num_keep = n // 6

        if prefix == "train":
            r_gt, tr_gt = t_gt[:, :3, :3], t_gt[:, :3, 3]
            src_gt = jnp.einsum("bij,bnj->bni", r_gt, src) + tr_gt[:, None]
            d2 = jnp.sum(
                (src_gt[:, :, None, :] - tgt[:, None, :, :]) ** 2, axis=-1
            )
            min_d2 = jnp.min(d2, axis=-1)
            min_idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)  # (B, N)
            match_labels = (jnp.sqrt(min_d2) < 0.05).astype(jnp.float32)
            pos_logp = jnp.log(match_labels + 1e-5)
            neg_logp = jnp.log(1.0 + 1e-5 * 2 - match_labels)
            k1, k2 = jax.random.split(self.make_rng("sampling"))
            pos_idx = _gumbel_choice(k1, pos_logp, num_keep // 2)
            neg_idx = _gumbel_choice(k2, neg_logp, num_keep - num_keep // 2)
            src_idx = jnp.concatenate([pos_idx, neg_idx], axis=1)
            tgt_idx = jnp.take_along_axis(min_idx, src_idx, axis=1)
            match_labels = jnp.take_along_axis(match_labels, src_idx, axis=1)
        else:
            _, src_idx = jax.lax.top_k(src_sig, num_keep)
            _, tgt_idx = jax.lax.top_k(tgt_sig, num_keep)

        src = _take(src, src_idx)
        src_emb = _take(src_emb, src_idx)
        src_sig = jnp.take_along_axis(src_sig, src_idx, axis=1)
        tgt = _take(tgt, tgt_idx)
        tgt_emb = _take(tgt_emb, tgt_idx)
        tgt_sig = jnp.take_along_axis(tgt_sig, tgt_idx, axis=1)

        m = src.shape[1]
        r = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), (b, 3, 3))
        t = jnp.zeros((b, 3), src.dtype)
        loss = 0.0

        for i in range(self.num_iters):
            pair = jnp.concatenate(
                [
                    jnp.broadcast_to(src_emb[:, :, None, :], (b, m, m, emb)),
                    jnp.broadcast_to(tgt_emb[:, None, :, :], (b, m, m, emb)),
                ],
                axis=-1,
            )
            diff = src[:, :, None, :] - tgt[:, None, :, :]
            dist = jnp.sqrt(jnp.maximum(jnp.sum(diff**2, -1, keepdims=True), 1e-12))
            diff = diff / (dist + 1e-8)
            sim = jnp.concatenate([pair, dist, diff], axis=-1)
            sim = sim1[i](sim, train)  # (B, m, m, 32)

            weights = weight_fc[i](jnp.max(sim, axis=2), train)[..., 0]  # (B, m)

            sim = jnp.clip(sim2[i](sim, train)[..., 0], -20.0, 20.0)  # (B, m, m)

            if prefix == "train" and i == 0:
                p_src = jax.nn.softmax(sim, axis=-1)
                src_ne = jnp.sum(p_src * jnp.log(p_src + 1e-12), axis=-1)
                p_tgt = jax.nn.softmax(sim, axis=-2)
                tgt_ne = jnp.sum(p_tgt * jnp.log(p_tgt + 1e-12), axis=-2)
                loss = loss + jnp.mean(
                    (src_sig - jax.lax.stop_gradient(src_ne)) ** 2
                ) + jnp.mean((tgt_sig - jax.lax.stop_gradient(tgt_ne)) ** 2)

            if prefix == "train":
                diag = jnp.diagonal(
                    jax.nn.softmax(sim, axis=-1), axis1=-2, axis2=-1
                )
                match_loss = jnp.sum(
                    -jnp.log(diag + 1e-12) * match_labels
                ) / jnp.maximum(match_labels.sum(), 1.0)
                loss = loss + match_loss

            corr_idx = jnp.argmax(sim, axis=-1).astype(jnp.int32)
            src_corr = _take(tgt, corr_idx)

            if prefix == "train":
                weight_labels = (
                    corr_idx == jnp.arange(m, dtype=jnp.int32)[None]
                ).astype(jnp.float32)
                weight_loss = jnp.mean(
                    jnp.maximum(weights, 0) - weights * weight_labels
                    + jnp.log1p(jnp.exp(-jnp.abs(weights)))
                )  # BCE with logits
                loss = loss + weight_loss

            w = jax.nn.sigmoid(weights)
            med = jnp.median(w, axis=-1, keepdims=True)
            w = w * (w >= med).astype(w.dtype)
            w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-8)

            r_ab, t_ab = svd_head(src, src_corr, w, stop_grad=True)
            r_ab = jax.lax.stop_gradient(r_ab)
            t_ab = jax.lax.stop_gradient(t_ab)
            src = jnp.einsum("bij,bnj->bni", r_ab, src) + t_ab[:, None]
            r = r_ab @ r
            t = jnp.einsum("bij,bj->bi", r_ab, t) + t_ab

        transform = rt_to_transformation(r, t)
        if t_gt is None:
            return transform
        r_gt, tr_gt = t_gt[:, :3, :3], t_gt[:, :3, 3]
        return {
            "loss": loss,
            "r_err": rotation_error(r, r_gt),
            "t_err": translation_error(t, tr_gt),
            "rmse": rmse_loss(src_pts_full, transform, t_gt),
            "rt_mse": rotation_geodesic_error(r, r_gt)
            + translation_error(t, tr_gt),
            "transform": transform,
        }
