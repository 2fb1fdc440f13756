"""Instance-embedding nets + transformer point regressor (flax).

Covers the reference's preprocessing/experiment models:
- completion/models/model_embedding.py (Resnet18-style 1D conv embedding +
  classifier, Embedding_Transformer) and embedding_pcn.py — instance
  classification embeddings used by the MVPN clustering
  (completion/preprocess.py:381-469 solve2_embedding),
- completion/models/transformer.py — the attention up/down encoder-decoder
  point regressor experiment,
- registration/models/pcn.py PCN_Transformer (:31-52).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from houv_tpu.models.common import MultiHeadAttention, PointMLP, max_pool_points
from houv_tpu.ops.sampling import furthest_point_sample

Array = jax.Array


class InstanceEmbedding(nn.Module):
    """PointNet trunk -> L2-normalized embedding + class logits
    (the role of Resnet18/Embedding_Transformer in model_embedding.py:
    a per-cloud descriptor whose distances drive the kNN clustering)."""

    embedding_size: int = 32
    nclasses: int = 16
    use_attention: bool = False
    compute_dtype: str | None = None  # bf16 = AMP (params f32)

    @nn.compact
    def __call__(self, x: Array):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        h = PointMLP((64, 128, 256), relu_last=True, dtype=dt)(x)
        if self.use_attention:  # Embedding_Transformer variant
            h = h + MultiHeadAttention(8, 256, dt)(h, h, h).astype(h.dtype)
        g = max_pool_points(h)  # (B, 256)
        g = nn.relu(nn.Dense(256, dtype=dt)(g))
        # embedding head in f32: the L2-normalized descriptor feeds kNN
        # distance mining, where bf16 quantization costs recall
        emb = nn.Dense(self.embedding_size)(g.astype(jnp.float32))
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9
        )
        logits = nn.Dense(self.nclasses)(
            nn.relu(nn.Dense(512, dtype=dt)(g)).astype(jnp.float32))
        return emb, logits


def triplet_loss(anchor: Array, positive: Array, negative: Array,
                 margin: float = 0.2) -> Array:
    """Margin triplet loss over embeddings (MVP_CP_choose_triple training,
    completion/dataset.py:313-428)."""
    d_pos = jnp.sum((anchor - positive) ** 2, axis=-1)
    d_neg = jnp.sum((anchor - negative) ** 2, axis=-1)
    return jnp.maximum(d_pos - d_neg + margin, 0.0).mean()


class TransformerRegressor(nn.Module):
    """Attention encoder-decoder point regressor
    (completion/models/transformer.py): FPS down to latent points, self +
    cross attention, upsample by folding duplication, regress coordinates."""

    num_latent: int = 256
    num_out: int = 2048
    d_model: int = 256
    n_heads: int = 4
    n_layers: int = 2
    dtype: object = None  # bf16 = AMP (params f32, coordinates out f32)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, _ = x.shape
        dt = self.dtype
        feats = PointMLP((64, self.d_model), relu_last=True, dtype=dt)(x)
        idx = furthest_point_sample(x, self.num_latent)
        latent = jnp.take_along_axis(feats, idx[..., None], axis=1)
        for _ in range(self.n_layers):
            h = nn.LayerNorm(dtype=dt)(latent)
            latent = latent + MultiHeadAttention(
                self.n_heads, self.d_model, dt)(h, h, h).astype(latent.dtype)
            h = nn.LayerNorm(dtype=dt)(latent)
            latent = latent + MultiHeadAttention(
                self.n_heads, self.d_model, dt)(
                    h, feats, feats).astype(latent.dtype)
            h = nn.LayerNorm(dtype=dt)(latent)
            latent = latent + nn.Dense(self.d_model, dtype=dt)(
                nn.relu(nn.Dense(self.d_model * 2, dtype=dt)(h))
            ).astype(latent.dtype)
        ratio = -(-self.num_out // self.num_latent)
        up = jnp.repeat(latent, ratio, axis=1)[:, : self.num_out]
        grid = jnp.tile(
            jnp.linspace(-0.05, 0.05, ratio)[None, :, None],
            (b, self.num_latent, 1),
        )[:, : self.num_out].astype(up.dtype)
        h = jnp.concatenate([up, grid], axis=-1)
        out = nn.Dense(3, dtype=dt)(nn.relu(nn.Dense(128, dtype=dt)(h)))
        return out.astype(jnp.float32)


class TransformerCompletion(nn.Module):
    """TransformerRegressor under the completion-model contract (reference
    completion/models/transformer.py Model:207-235: train loss =
    cd_p + 0.02·cd_t; val returns cd_p/cd_t/f1; test returns result)."""

    num_points: int = 2048
    num_latent: int = 256
    eval_emd: bool = False
    train_loss: str = "cd"  # reference supports cd only here
    compute_dtype: str | None = None  # bf16 = AMP (params/losses f32)

    @nn.compact
    def __call__(self, x: Array, gt: Array | None = None,
                 prefix: str = "train", alpha: float | None = None):
        from houv_tpu.metrics.cd import calc_cd

        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        out = TransformerRegressor(
            num_latent=self.num_latent, num_out=self.num_points, dtype=dt
        )(x)
        if prefix == "train":
            cd_p, cd_t = calc_cd(out, gt)
            total = cd_p.mean() + cd_t.mean() * 0.02
            return {"out2": out, "loss2": cd_t, "total_loss": total}
        if prefix == "val":
            cd_p, cd_t, f1 = calc_cd(out, gt, calc_f1=True)
            res = {"out2": out, "cd_p": cd_p, "cd_t": cd_t, "f1": f1}
            if self.eval_emd:
                from houv_tpu.metrics.emd import calc_emd

                res["emd"] = calc_emd(out, gt, eps=0.004, iterations=3000)
            return res
        return {"result": out}


class PCNTransformer(nn.Module):
    """PCN encoder + attention refinement head
    (registration/models/pcn.py PCN_Transformer :31-52)."""

    output_size: int = 1024
    dtype: object = None  # bf16 = AMP (params f32, global feature f32)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = self.dtype
        h = nn.relu(nn.Dense(128, dtype=dt)(x))
        h = nn.Dense(256, dtype=dt)(h)
        g = max_pool_points(h)
        h = jnp.concatenate(
            [h, jnp.broadcast_to(g[:, None], h.shape[:2] + (g.shape[-1],))],
            axis=-1,
        )
        h = nn.relu(nn.Dense(512, dtype=dt)(h))
        h = h + MultiHeadAttention(4, 512, dt)(h, h, h).astype(h.dtype)
        h = nn.Dense(self.output_size, dtype=dt)(h)
        return max_pool_points(h).astype(jnp.float32)
