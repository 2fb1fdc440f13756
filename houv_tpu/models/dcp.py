"""DCP — Deep Closest Point (flax).

Reference: registration/models/dcp.py. DGCNN per-point embedding (:269-301),
pre-norm transformer cross-attention "pointer" (1 enc + 1 dec layer, 4
heads, d=512, ff=1024; :304-328), softmax soft-correspondence + SVD head
(:331-381 — vectorized here instead of the per-sample torch.svd loop), loss
= MSE(T12·T_gt⁻¹, I) (:427-428). Features-last layout.
"""

from __future__ import annotations

import math

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
from houv_tpu.models.common import MultiHeadAttention, get_graph_feature, svd_head

Array = jax.Array


class DGCNN(nn.Module):
    """4 graph-conv stages (edge features -> Dense+BN+ReLU -> max over k),
    concatenated and projected to emb_dims (reference dcp.py:272-301).

    (B, N, 3) -> (B, N, emb_dims)."""

    emb_dims: int = 512
    k: int = 20
    axis_name: str | None = None
    dtype: object = None  # bf16 = AMP (params f32, BN stats f32)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        def bn(h):
            return nn.BatchNorm(
                use_running_average=not train, use_bias=False,
                use_scale=True, axis_name=self.axis_name, dtype=self.dtype,
            )(h)

        # Reference computes kNN once on the input coordinates and reuses the
        # edge structure for all four stages (get_graph_feature on x only).
        h = get_graph_feature(x, self.k, minus_center=False)  # (B,N,k,6)
        outs = []
        for f in (64, 64, 128, 256):
            h = nn.relu(bn(nn.Dense(f, use_bias=False, dtype=self.dtype)(h)))
            outs.append(jnp.max(h, axis=2))  # (B, N, f)
        cat = jnp.concatenate(outs, axis=-1)  # (B, N, 512)
        return nn.relu(bn(
            nn.Dense(self.emb_dims, use_bias=False, dtype=self.dtype)(cat)
        ))


class _FFN(nn.Module):
    d_model: int
    d_ff: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.d_ff, dtype=self.dtype)(x))
        return nn.Dense(self.d_model, dtype=self.dtype)(h)


class _EncoderLayer(nn.Module):
    d_model: int
    d_ff: int
    n_heads: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        attn = MultiHeadAttention(self.n_heads, self.d_model, self.dtype)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = x + attn(h, h, h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        return x + _FFN(self.d_model, self.d_ff, self.dtype)(h)


class _DecoderLayer(nn.Module):
    d_model: int
    d_ff: int
    n_heads: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, memory):
        self_attn = MultiHeadAttention(self.n_heads, self.d_model, self.dtype)
        cross_attn = MultiHeadAttention(self.n_heads, self.d_model, self.dtype)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = x + self_attn(h, h, h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = x + cross_attn(h, memory, memory)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        return x + _FFN(self.d_model, self.d_ff, self.dtype)(h)


class Pointer(nn.Module):
    """The DCP transformer: tgt decoded against encoded src and vice versa,
    returning residual embeddings (reference dcp.py:304-328)."""

    d_model: int = 512
    d_ff: int = 1024
    n_heads: int = 4
    n_layers: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, src_emb: Array, tgt_emb: Array):
        enc_layers = [
            _EncoderLayer(self.d_model, self.d_ff, self.n_heads, self.dtype)
            for _ in range(self.n_layers)
        ]
        dec_layers = [
            _DecoderLayer(self.d_model, self.d_ff, self.n_heads, self.dtype)
            for _ in range(self.n_layers)
        ]
        enc_norm = nn.LayerNorm(epsilon=1e-6)
        dec_norm = nn.LayerNorm(epsilon=1e-6)

        def encode(x):
            for l in enc_layers:
                x = l(x)
            return enc_norm(x)

        def decode(x, memory):
            for l in dec_layers:
                x = l(x, memory)
            return dec_norm(x)

        tgt_p = decode(tgt_emb, encode(src_emb))
        src_p = decode(src_emb, encode(tgt_emb))
        return src_p, tgt_p


def dcp_svd_head(src_emb: Array, tgt_emb: Array, src: Array, tgt: Array):
    """Soft correspondence + Procrustes (reference dcp.py:331-381).
    All inputs features-last: embs (B, N, D), clouds (B, N, 3)."""
    d_k = src_emb.shape[-1]
    scores = jnp.einsum("bnd,bmd->bnm", src_emb, tgt_emb) / math.sqrt(d_k)
    scores = jax.nn.softmax(scores, axis=-1)
    src_corr = jnp.einsum("bnm,bmc->bnc", scores, tgt)  # (B, N, 3)
    return svd_head(src, src_corr)


class DCP(nn.Module):
    """Full DCP with in-model loss/metrics (reference dcp.py:384-430)."""

    emb_dims: int = 512
    cycle: bool = False
    axis_name: str | None = None
    # AMP: 'bfloat16' runs the DGCNN + transformer compute in bf16 (params
    # and BN/LN statistics stay f32); the correspondence softmax and SVD
    # head always run f32. None = full f32 (reference numerics).
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, src: Array, tgt: Array, t_gt: Array | None = None,
                 prefix: str = "train", train: bool = False):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        emb_nn = DGCNN(self.emb_dims, axis_name=self.axis_name, dtype=dt)
        src_emb = emb_nn(src, train)
        tgt_emb = emb_nn(tgt, train)
        src_p, tgt_p = Pointer(self.emb_dims, dtype=dt)(src_emb, tgt_emb)
        src_emb = (src_emb + src_p).astype(jnp.float32)
        tgt_emb = (tgt_emb + tgt_p).astype(jnp.float32)
        r_ab, t_ab = dcp_svd_head(src_emb, tgt_emb, src, tgt)
        t_12 = rt_to_transformation(r_ab, t_ab)

        if t_gt is None:
            return t_12
        r_err = rotation_error(t_12[:, :3, :3], t_gt[:, :3, :3])
        t_err = translation_error(t_12[:, :3, 3], t_gt[:, :3, 3])
        rmse = rmse_loss(src, t_12, t_gt)
        eye = jnp.broadcast_to(jnp.eye(4, dtype=t_12.dtype), t_gt.shape)
        mse = jnp.mean((t_12 @ jnp.linalg.inv(t_gt) - eye) ** 2)
        if self.cycle:
            # The committed reference computes the reverse transform under
            # this flag but drops it (dcp.py:411-415 — `rotation_ba` is
            # never consumed); we wire it into the loss as the upstream
            # DCP cycle-consistency term: R_ba·R_ab = I, R_ba·t_ab = -t_ba.
            r_ba, t_ba = dcp_svd_head(tgt_emb, src_emb, tgt, src)
            eye3 = jnp.broadcast_to(
                jnp.eye(3, dtype=r_ab.dtype), r_ab.shape
            )
            rot_cycle = jnp.mean((r_ba @ r_ab - eye3) ** 2)
            tr_cycle = jnp.mean(
                (jnp.einsum("bij,bj->bi", r_ba, t_ab) + t_ba) ** 2
            )
            mse = mse + 0.1 * (rot_cycle + tr_cycle)
        rt_mse = (
            rotation_geodesic_error(t_12[:, :3, :3], t_gt[:, :3, :3])
            + translation_error(t_12[:, :3, 3], t_gt[:, :3, 3])
        )
        return {
            "loss": mse,
            "r_err": r_err,
            "t_err": t_err,
            "rmse": rmse,
            "rt_mse": rt_mse,
            "transform": t_12,
        }
