"""ECG — Edge-aware Completion with Graph convolutions (flax).

Reference: completion/models/ecg.py. Dense-conv (DGCNN-ish densely-growing)
hierarchical encoder with edge-preserve downsampling and three_nn
upsampling, a U-Net over point resolutions (:68-160); decoder = FC coarse +
EF_expansion fine with FPS trim (:163-210); loss = CD/EMD + 0.1·uniform
loss (:243-245). Features-last layout.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from houv_tpu.metrics import calc_cd, calc_emd
from houv_tpu.models.common import (
    EFExpansion,
    edge_preserve_sampling,
    get_graph_feature,
    get_uniform_loss,
)
from houv_tpu.models.pcn import PCNEncoder
from houv_tpu.ops.interpolate import three_interpolate, three_nn_upsampling
from houv_tpu.ops.sampling import furthest_point_sample

Array = jax.Array


class DenseConv(nn.Module):
    """Densely-growing graph conv (reference ecg.py:36-66):
    edge features -> first conv -> stack convs with channel concat -> max
    over k. (B, N, C) -> (B, N, C + growth·dense_n)."""

    growth_rate: int = 24
    dense_n: int = 3
    k: int = 16
    dtype: object = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # kNN graph construction runs in f32 even under AMP: feature-space
        # neighbor selection is a discrete decision and bf16 distance
        # accumulation flips near-ties (same rationale as the f32 embedding
        # head in models/embedding.py)
        y = get_graph_feature(
            x.astype(jnp.float32), self.k, minus_center=True
        )  # (B,N,k,2C)
        y = y.astype(self.dtype) if self.dtype else y
        x = x.astype(y.dtype)
        y = nn.relu(nn.Dense(self.growth_rate, dtype=self.dtype)(y))
        y = jnp.concatenate(
            [y, jnp.broadcast_to(x[:, :, None, :], y.shape[:3] + (x.shape[-1],))],
            axis=-1,
        )
        for i in range(self.dense_n - 1):
            h = nn.Dense(self.growth_rate, dtype=self.dtype)(y)
            if i != self.dense_n - 2:
                h = nn.relu(h)
            y = jnp.concatenate([y, h], axis=-1)
        return jnp.max(y, axis=2).astype(jnp.float32)


class EFEncoder(nn.Module):
    """Hierarchical dense-conv U-Net over point resolutions
    (reference ecg.py:69-160). (B, N, 3) -> (B, N, output_size)."""

    growth_rate: int = 24
    dense_n: int = 3
    k: int = 16
    hierarchy: tuple = (1024, 256, 64)
    output_size: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, points: Array) -> Array:
        comp = self.growth_rate * 2
        pc1 = points

        x0 = nn.relu(nn.Dense(24, dtype=self.dtype)(points))
        x1 = nn.relu(DenseConv(self.growth_rate, self.dense_n, self.k, self.dtype)(x0))
        x1 = jnp.concatenate([x1, x0], axis=-1)
        x1d, _, pc2 = edge_preserve_sampling(x1, pc1, self.hierarchy[0], self.k)

        x2 = nn.relu(nn.Dense(comp, dtype=self.dtype)(x1d))
        x2 = nn.relu(DenseConv(self.growth_rate, self.dense_n, self.k, self.dtype)(x2))
        x2 = jnp.concatenate([x2, x1d], axis=-1)
        x2d, _, pc3 = edge_preserve_sampling(x2, pc2, self.hierarchy[1], self.k)

        x3 = nn.relu(nn.Dense(comp, dtype=self.dtype)(x2d))
        x3 = nn.relu(DenseConv(self.growth_rate, self.dense_n, self.k, self.dtype)(x3))
        x3 = jnp.concatenate([x3, x2d], axis=-1)
        x3d, _, pc4 = edge_preserve_sampling(x3, pc3, self.hierarchy[2], self.k)

        x4 = nn.relu(nn.Dense(comp, dtype=self.dtype)(x3d))
        x4 = nn.relu(DenseConv(self.growth_rate, self.dense_n, self.k, self.dtype)(x4))
        x4 = jnp.concatenate([x4, x3d], axis=-1)

        gf = nn.Dense(1024, dtype=self.dtype)(x4).max(axis=1)
        gf = nn.relu(nn.Dense(512, dtype=self.dtype)(gf))
        gf = nn.relu(nn.Dense(1024, dtype=self.dtype)(gf))
        gf = jnp.broadcast_to(gf[:, None], (x4.shape[0], self.hierarchy[2], 1024))

        x4 = nn.relu(nn.Dense(1024, dtype=self.dtype)(
            jnp.concatenate([gf, x4], axis=-1)).astype(jnp.float32))
        idx, w = three_nn_upsampling(pc3, pc4)
        x4 = jnp.swapaxes(
            three_interpolate(jnp.swapaxes(x4, 1, 2), idx, w), 1, 2
        )

        x3 = nn.relu(nn.Dense(768, dtype=self.dtype)(
            jnp.concatenate([x3, x4], axis=-1)).astype(jnp.float32))
        idx, w = three_nn_upsampling(pc2, pc3)
        x3 = jnp.swapaxes(
            three_interpolate(jnp.swapaxes(x3, 1, 2), idx, w), 1, 2
        )

        x2 = nn.relu(nn.Dense(512, dtype=self.dtype)(
            jnp.concatenate([x2, x3], axis=-1)).astype(jnp.float32))
        idx, w = three_nn_upsampling(pc1, pc2)
        x2 = jnp.swapaxes(
            three_interpolate(jnp.swapaxes(x2, 1, 2), idx, w), 1, 2
        )

        return nn.Dense(self.output_size, dtype=self.dtype)(
            jnp.concatenate([x1, x2], axis=-1)).astype(jnp.float32)


class ECGDecoder(nn.Module):
    """FC coarse + dense-feature EF_expansion fine (reference ecg.py:163-210)."""

    num_coarse: int
    num_fine: int
    num_input: int
    dtype: object = None

    @nn.compact
    def __call__(self, global_feat: Array, point_input: Array):
        b = global_feat.shape[0]
        scale = int(np.ceil(self.num_fine / (self.num_coarse + self.num_input)))
        coarse = nn.relu(nn.Dense(1024, dtype=self.dtype)(global_feat))
        coarse = nn.relu(nn.Dense(1024, dtype=self.dtype)(coarse))
        coarse = nn.Dense(self.num_coarse * 3, dtype=self.dtype)(
            coarse).astype(jnp.float32).reshape(
            b, self.num_coarse, 3
        )
        points = jnp.concatenate([coarse, point_input], axis=1)
        dense_feat = EFEncoder(output_size=256, dtype=self.dtype)(points)
        if scale >= 2:
            dense_feat = EFExpansion(256, 64, step_ratio=scale, k=4,
                                     dtype=self.dtype)(dense_feat)
        h = nn.relu(nn.Dense(64, dtype=self.dtype)(dense_feat))
        fine = nn.Dense(3, dtype=self.dtype)(h).astype(jnp.float32)
        if fine.shape[1] > self.num_fine:
            idx = furthest_point_sample(fine, self.num_fine)
            fine = jnp.take_along_axis(fine, idx[..., None], axis=1)
        return coarse, fine


class ECG(nn.Module):
    """Full ECG with in-model losses (reference ecg.py Model:213-254)."""

    num_points: int = 2048
    num_coarse: int = 1024
    num_input: int = 2048
    train_loss: str = "cd"
    eval_emd: bool = False
    compute_dtype: str | None = None  # bf16 = AMP (params/losses f32)

    @nn.compact
    def __call__(self, x: Array, gt: Array | None = None,
                 prefix: str = "train", alpha: float | None = None):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        feat = PCNEncoder(dtype=dt)(x)
        coarse, fine = ECGDecoder(self.num_coarse, self.num_points,
                                  self.num_input, dt)(feat, x)
        if prefix == "train":
            u1 = get_uniform_loss(coarse)
            u2 = get_uniform_loss(fine)
            if self.train_loss == "emd":
                loss1, loss2 = calc_emd(coarse, gt), calc_emd(fine, gt)
            else:
                loss1, _ = calc_cd(coarse, gt)
                loss2, _ = calc_cd(fine, gt)
            total = loss1.mean() + 0.1 * u1 + (loss2.mean() + 0.1 * u2) * alpha
            return {"out2": fine, "loss2": loss2, "total_loss": total}
        if prefix == "val":
            cd_p, cd_t, f1 = calc_cd(fine, gt, calc_f1=True)
            out = {"out1": coarse, "out2": fine, "cd_p": cd_p,
                   "cd_t": cd_t, "f1": f1}
            if self.eval_emd:
                out["emd"] = calc_emd(fine, gt, eps=0.004, iterations=3000)
            return out
        return {"result": fine}
