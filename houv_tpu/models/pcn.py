"""PCN — Point Completion Network (flax).

Reference: completion/models/pcn.py. Two-stage PointNet encoder with
global-feature concat (:12-29), FC coarse decoder + folding-grid fine
decoder (:63-103), CD-or-EMD loss with coarse + alpha·fine weighting
(:132-142). Layout is features-last (B, N, C); see models/common.py.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from houv_tpu.metrics import calc_cd, calc_emd
from houv_tpu.models.common import gen_grid_up, max_pool_points

Array = jax.Array


class PCNEncoder(nn.Module):
    """(B, N, 3) -> (B, output_size) global feature
    (reference pcn.py:12-29). dtype: bf16 = AMP (params stay f32)."""

    output_size: int = 1024
    dtype: object = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = x.shape[1]
        h = nn.relu(nn.Dense(128, dtype=self.dtype)(x))
        h = nn.Dense(256, dtype=self.dtype)(h)
        g = max_pool_points(h)  # (B, 256) — carries the fusion-bug barrier
        h = jnp.concatenate(
            [h, jnp.broadcast_to(g[:, None, :], (h.shape[0], n, g.shape[-1]))],
            axis=-1,
        )
        h = nn.relu(nn.Dense(512, dtype=self.dtype)(h))
        h = nn.Dense(self.output_size, dtype=self.dtype)(h)
        return max_pool_points(h).astype(jnp.float32)


class PCNEncoderLabel(nn.Module):
    """Label-conditioned encoder used by vrcnet_knn (reference pcn.py:31-58):
    16-way class embedding concatenated into the global feature.

    Returns (global_feature (B, output_size), point_feature (B, N, 1024))."""

    output_size: int = 1024
    dtype: object = None

    @nn.compact
    def __call__(self, x: Array, label: Array):
        n = x.shape[1]
        h = nn.relu(nn.Dense(512, dtype=self.dtype)(x))
        em = nn.Embed(16, 256)(label)  # (B, 256)
        g = jnp.concatenate(
            [em.astype(h.dtype), max_pool_points(h)], axis=-1)  # (B, 768)
        h = jnp.concatenate(
            [h, jnp.broadcast_to(g[:, None, :], (h.shape[0], n, g.shape[-1]))],
            axis=-1,
        )
        h = nn.relu(nn.Dense(512, dtype=self.dtype)(h))
        h = nn.relu(nn.Dense(1024, dtype=self.dtype)(h))
        point_feature = h.astype(jnp.float32)
        h = nn.Dense(self.output_size, dtype=self.dtype)(h)
        return max_pool_points(h).astype(jnp.float32), point_feature


class PCNDecoder(nn.Module):
    """FC coarse + folding fine decoder (reference pcn.py:65-106)."""

    num_coarse: int
    num_fine: int
    scale: int
    dtype: object = None

    @nn.compact
    def __call__(self, feat: Array):
        b = feat.shape[0]
        coarse = nn.relu(nn.Dense(1024, dtype=self.dtype)(feat))
        coarse = nn.relu(nn.Dense(1024, dtype=self.dtype)(coarse))
        coarse = nn.Dense(self.num_coarse * 3, dtype=self.dtype)(
            coarse).astype(jnp.float32).reshape(
            b, self.num_coarse, 3
        )

        grid = gen_grid_up(2 ** int(math.log2(self.scale)), 0.05)  # (scale, 2)
        grid_feat = jnp.broadcast_to(
            grid[None, None], (b, self.num_coarse, self.scale, 2)
        ).reshape(b, self.num_fine, 2)
        point_feat = jnp.repeat(coarse, self.scale, axis=1)  # (B, fine, 3)
        global_feat = jnp.broadcast_to(
            feat[:, None, :], (b, self.num_fine, feat.shape[-1])
        )
        h = jnp.concatenate([grid_feat, point_feat, global_feat], axis=-1)
        h = nn.relu(nn.Dense(512, dtype=self.dtype)(h))
        h = nn.relu(nn.Dense(512, dtype=self.dtype)(h))
        fine = nn.Dense(3, dtype=self.dtype)(h).astype(
            jnp.float32) + point_feat
        return coarse, fine


class PCN(nn.Module):
    """Full PCN with in-model losses (reference pcn.py Model:109-158)."""

    num_points: int = 2048
    num_coarse: int = 1024
    train_loss: str = "cd"
    eval_emd: bool = False
    compute_dtype: str | None = None  # bf16 = AMP (params/losses f32)

    @nn.compact
    def __call__(self, x: Array, gt: Array | None = None,
                 prefix: str = "train", alpha: float | None = None):
        scale = self.num_points // self.num_coarse
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        feat = PCNEncoder(dtype=dt)(x)
        coarse, fine = PCNDecoder(self.num_coarse, self.num_points, scale,
                                  dt)(feat)

        if prefix == "train":
            if self.train_loss == "emd":
                loss1 = calc_emd(coarse, gt)
                loss2 = calc_emd(fine, gt)
            elif self.train_loss == "cd":
                loss1, _ = calc_cd(coarse, gt)
                loss2, _ = calc_cd(fine, gt)
            else:
                raise NotImplementedError("train loss is either cd or emd")
            total = loss1.mean() + loss2.mean() * alpha
            return {"out2": fine, "loss2": loss2, "total_loss": total}
        if prefix == "val":
            cd_p, cd_t, f1 = calc_cd(fine, gt, calc_f1=True)
            out = {"out1": coarse, "out2": fine, "cd_p": cd_p,
                   "cd_t": cd_t, "f1": f1}
            if self.eval_emd:
                out["emd"] = calc_emd(fine, gt, eps=0.004, iterations=3000)
            return out
        return {"result": fine}
