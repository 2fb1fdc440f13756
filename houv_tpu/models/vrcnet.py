"""VRCNet — Variational Relational point Completion Network (flax).

Reference: completion/models/vrcnet.py. Dual-path probabilistic modeling:
PCN encoder -> posterior/prior Linear_ResBlocks -> reparametrized latent ->
generator added to the global feature (:557-603); relational decoder
``MSAP_SKN_decoder`` (:368-507): FC coarse_raw -> (optionally 0/1-labeled)
concat with input -> ``SA_SKN_Res_encoder`` U-Net of point self-attention
with selective-kernel fusion and edge pooling/unpooling (:21-362) ->
EF_expansion/Folding upsample -> FPS -> score-based point selection; loss =
10·CD(coarse_raw) + 0.5·CD(coarse_high) + CD(coarse) + α·CD(fine) +
20·(KL_rec + KL_g) (:630-640). Features-last layout.
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
    gen_grid_up,
    get_edge_features,
)
from houv_tpu.models.pcn import PCNEncoder
from houv_tpu.ops.grouping import knn_points
from houv_tpu.ops.interpolate import three_interpolate, three_nn_upsampling
from houv_tpu.ops.sampling import furthest_point_sample

Array = jax.Array


def _dt(compute_dtype):
    """'bfloat16' -> dtype for flax modules; None = f32."""
    return jnp.dtype(compute_dtype) if compute_dtype else None


class SAModule(nn.Module):
    """Point self-attention over a kNN graph (reference vrcnet.py:21-68).

    x (B, N, C), idx (B, N, k) -> (B, N, out_planes), residual."""

    rel_planes: int
    mid_planes: int
    out_planes: int
    share_planes: int = 8
    k: int = 16
    dtype: object = None  # bf16 = AMP (params stay f32)

    @nn.compact
    def __call__(self, x: Array, idx: Array) -> Array:
        b, n, _ = x.shape
        identity = x
        h = nn.relu(x)
        # The projections are pointwise, so they commute with the neighbor
        # gather: project FIRST, then gather BOTH projections with ONE
        # gather of the concat — the (B, N, k, C) full-width edge tensor
        # (reference vrcnet.py:21-68 convs over it) never materializes
        # (rel+mid = C/16 + C/4 channels stream instead of C), the one-hot
        # build is paid once (it dominates the TPU gather and is
        # C-independent), and each Dense runs k x fewer MACs. Same params
        # (creation order and kernel shapes unchanged), identical values.
        x1 = nn.Dense(self.rel_planes, dtype=self.dtype)(h)   # (B, N, rel)
        h2 = nn.Dense(self.rel_planes, dtype=self.dtype)(h)
        h3 = nn.Dense(self.mid_planes, dtype=self.dtype)(h)
        x23 = get_edge_features(jnp.concatenate([h2, h3], axis=-1), idx)
        x2 = x23[..., : self.rel_planes].reshape(
            b, n, self.k * self.rel_planes)
        x3 = x23[..., self.rel_planes:]                       # (B, N, k, mid)

        w = jnp.concatenate([x1, x2], axis=-1)
        w = nn.relu(w)
        w = nn.relu(nn.Dense(self.mid_planes // self.share_planes,
                             use_bias=False, dtype=self.dtype)(w))
        w = nn.Dense(self.k * self.mid_planes // self.share_planes,
                     dtype=self.dtype)(w)
        w = w.reshape(b, n, self.k, self.mid_planes // self.share_planes)
        # broadcast instead of tile: share_planes repeats of w along mid
        x3r = x3.reshape(b, n, self.k, self.share_planes,
                         self.mid_planes // self.share_planes)
        out = jnp.sum(w[:, :, :, None, :] * x3r, axis=2)
        out = out.reshape(b, n, self.mid_planes)          # (B, N, mid)
        out = nn.Dense(self.out_planes, dtype=self.dtype)(nn.relu(out))
        return (out + identity).astype(jnp.float32)


class SKSAModule(nn.Module):
    """Selective-kernel fusion of SA modules at different k
    (reference vrcnet.py:130-188)."""

    rel_planes: int
    mid_planes: int
    out_planes: int
    share_planes: int = 8
    ks: tuple = (10, 20)
    r: int = 2
    L: int = 32
    dtype: object = None

    @nn.compact
    def __call__(self, x: Array, idxs: list[Array]) -> Array:
        d = max(self.out_planes // self.r, self.L)
        feas = []
        for i, k in enumerate(self.ks):
            f = SAModule(self.rel_planes, self.mid_planes, self.out_planes,
                         self.share_planes, k, self.dtype)(x, idxs[i])
            feas.append(nn.relu(f))
        feas = jnp.stack(feas, axis=1)            # (B, nk, N, C)
        fea_u = jnp.sum(feas, axis=1)             # (B, N, C)
        fea_s = fea_u.mean(axis=1)                # (B, C)
        fea_z = nn.Dense(d, dtype=self.dtype)(fea_s)
        att = jnp.stack(
            [nn.Dense(self.out_planes, dtype=self.dtype)(fea_z)
             for _ in self.ks], axis=1
        )  # (B, nk, C)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=1)[:, :, None, :]
        return jnp.sum(feas * att, axis=1)


class SKNResUnit(nn.Module):
    """conv -> SK-SA blocks -> conv, with residual projection
    (reference vrcnet.py:191-225)."""

    output_size: int
    ks: tuple = (10, 20)
    layers: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, feat: Array, idxs: list[Array]) -> Array:
        c = self.output_size
        x = nn.Dense(c, use_bias=False, dtype=self.dtype)(feat)
        for _ in range(self.layers):
            x = SKSAModule(c // 16, c // 4, c, 8, self.ks,
                           dtype=self.dtype)(x, idxs)
        x = nn.Dense(c, use_bias=False, dtype=self.dtype)(nn.relu(x))
        out = x + nn.Dense(c, use_bias=False, dtype=self.dtype)(feat)
        return out.astype(jnp.float32)


def saskn_geometry(points: Array, pts_num: tuple, ks: tuple, pk: int):
    """Coordinate-only geometry for ``SASKNResEncoder``: the point
    pyramid (FPS), per-level kNN graphs, grouping neighborhoods, and
    three-nn unpooling weights depend only on the input coordinates, not
    on learned features. Computing them here — outside an ``nn.remat``
    scope — saves them as residuals so the backward pass does not replay
    the Pallas kNN/FPS kernels (~16 ms/step at the champion shapes).

    Returns {'knn': [[idx per k] per level], 'eps': [(p_idx, pn_idx,
    sampled) per downsample], 'unpool': [(idx, w) per upsample, deepest
    first]}."""
    pts = points
    pts_list = [pts]
    knn_lvls, eps = [], []
    for lvl in range(len(pts_num)):
        knn_lvls.append([knn_points(pts, pts, k)[1] for k in ks])
        if lvl + 1 < len(pts_num):
            p_idx = furthest_point_sample(pts, pts_num[lvl + 1])
            sampled = jnp.take_along_axis(pts, p_idx[..., None], axis=1)
            _, pn_idx = knn_points(sampled, pts, min(pk, pts.shape[1]))
            eps.append((p_idx, pn_idx, sampled))
            pts_list.append(sampled)
            pts = sampled
    unpool = [
        three_nn_upsampling(pts_list[lvl - 1], pts_list[lvl])
        for lvl in range(len(pts_num) - 1, 0, -1)
    ]
    return {"knn": knn_lvls, "eps": eps, "unpool": unpool}


class SASKNResEncoder(nn.Module):
    """U-Net of SK-SA units over point resolutions with edge pooling /
    three-nn unpooling (reference vrcnet.py:228-362).

    features (B, N, input_size) with xyz in the first 3 channels ->
    (B, N, output_size)."""

    ks: tuple = (10, 20)
    pk: int = 16
    output_size: int = 64
    layers: tuple = (2, 2, 2, 2)
    pts_num: tuple = (3072, 1536, 768, 384)
    dropout_rate: float = 0.5
    # rematerialize the SK-SA units in the backward pass: their (B, N, N)
    # attention maps are the HBM cap on batch size (B=16 at 2048 pts OOMs
    # a 16G v5e without this)
    remat: bool = False
    # AMP: 'bfloat16' runs the SA/SK Dense stacks in bf16 (params f32,
    # softmax/pooling/unpool math f32). None = full f32.
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, features: Array, train: bool = False,
                 geo: dict | None = None) -> Array:
        b = features.shape[0]
        c1 = 64
        pt1 = features[..., :3]
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if geo is None:
            geo = saskn_geometry(pt1, self.pts_num, self.ks, self.pk)

        unpools = iter(geo["unpool"])

        def unpool(feat):
            idx, w = next(unpools)
            return jnp.swapaxes(
                three_interpolate(jnp.swapaxes(feat, 1, 2), idx, w), 1, 2
            )

        unit = nn.remat(SKNResUnit) if self.remat else SKNResUnit
        x = unit(c1, self.ks, self.layers[0], dt)(features, geo["knn"][0])
        x1 = nn.relu(x)
        x, _, pt2 = edge_preserve_sampling(x1, pt1, self.pts_num[1], self.pk,
                                           precomputed=geo["eps"][0])
        x = unit(c1 * 2, self.ks, self.layers[1], dt)(x, geo["knn"][1])
        x2 = nn.relu(x)
        x, _, pt3 = edge_preserve_sampling(x2, pt2, self.pts_num[2], self.pk,
                                           precomputed=geo["eps"][1])
        x = unit(c1 * 4, self.ks, self.layers[2], dt)(x, geo["knn"][2])
        x3 = nn.relu(x)
        x, _, pt4 = edge_preserve_sampling(x3, pt3, self.pts_num[3], self.pk,
                                           precomputed=geo["eps"][2])
        x = unit(c1 * 8, self.ks, self.layers[3], dt)(x, geo["knn"][3])
        x4 = nn.relu(x)

        g = nn.Dense(1024, dtype=dt)(x4).max(axis=1)  # (B, 1024)
        g = nn.Dropout(self.dropout_rate, deterministic=not train)(
            nn.relu(nn.Dense(512, dtype=dt)(g))
        )
        g = nn.Dropout(self.dropout_rate, deterministic=not train)(
            nn.relu(nn.Dense(1024, dtype=dt)(g))
        )
        g = g.astype(jnp.float32)
        g = jnp.broadcast_to(g[:, None], (b, self.pts_num[3], 1024))

        x = nn.relu(nn.Dense(c1 * 8, dtype=dt)(
            jnp.concatenate([g, x4], axis=-1)).astype(jnp.float32))
        x = unpool(x)
        x = nn.relu(nn.Dense(c1 * 4, dtype=dt)(
            jnp.concatenate([x, x3], axis=-1)).astype(jnp.float32))
        x = unpool(x)
        x = nn.relu(nn.Dense(c1 * 2, dtype=dt)(
            jnp.concatenate([x, x2], axis=-1)).astype(jnp.float32))
        x = unpool(x)
        x = nn.relu(nn.Dense(c1, dtype=dt)(
            jnp.concatenate([x, x1], axis=-1)))
        return nn.Dense(self.output_size, dtype=dt)(x).astype(jnp.float32)


class Folding(nn.Module):
    """Grid folding upsampler (reference vrcnet.py:71-115).
    point_feat (B, N, C) + global (B, G) -> (B, N·step_ratio, output_size)."""

    output_size: int
    step_ratio: int

    @nn.compact
    def __call__(self, point_feat: Array, global_feat: Array) -> Array:
        b, n, _ = point_feat.shape
        grid = gen_grid_up(self.step_ratio, 0.2)  # (r, 2)
        pf = jnp.repeat(point_feat, self.step_ratio, axis=1)
        gf = jnp.broadcast_to(
            global_feat[:, None], (b, n * self.step_ratio, global_feat.shape[-1])
        )
        grid_feat = jnp.tile(grid[None], (b, n, 1))
        h = jnp.concatenate([gf, pf, grid_feat], axis=-1)
        return nn.relu(nn.Dense(self.output_size)(h))


class LinearResBlock(nn.Module):
    """relu -> Dense -> relu -> Dense, + Dense residual
    (reference vrcnet.py:118-128)."""

    output_size: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(x)
        h = nn.Dense(x.shape[-1])(h)
        h = nn.Dense(self.output_size)(nn.relu(h))
        return h + nn.Dense(self.output_size)(x)


class MSAPSKNDecoder(nn.Module):
    """Multi-stage relational decoder (reference vrcnet.py:368-507).
    Returns (coarse_raw, coarse_high, coarse, fine), all (B, ·, 3)."""

    num_coarse_raw: int
    num_fps: int
    num_coarse: int
    num_fine: int
    layers: tuple = (2, 2, 2, 2)
    knn_list: tuple = (10, 20)
    pk: int = 10
    points_label: bool = False
    local_folding: bool = False
    remat: bool = False
    compute_dtype: str | None = None  # bf16 = AMP in the SA-SKN encoder

    @nn.compact
    def __call__(self, global_feat: Array, point_input: Array,
                 train: bool = False):
        b = global_feat.shape[0]
        n_input = point_input.shape[1]

        h = nn.relu(nn.Dense(1024)(global_feat))
        h = nn.relu(nn.Dense(1024)(h))
        coarse_raw = nn.Dense(self.num_coarse_raw * 3)(h).reshape(
            b, self.num_coarse_raw, 3
        )

        if self.points_label:
            coarse_in = jnp.concatenate(
                [coarse_raw, jnp.zeros((b, self.num_coarse_raw, 1))], axis=-1
            )
            input_in = jnp.concatenate(
                [point_input, jnp.ones((b, n_input, 1))], axis=-1
            )
        else:
            coarse_in, input_in = coarse_raw, point_input

        points = jnp.concatenate([coarse_in, input_in], axis=1)
        total_pts = points.shape[1]
        pts_num = (total_pts, total_pts // 2, total_pts // 4, total_pts // 8)
        enc_cls = nn.remat(SASKNResEncoder, static_argnums=(2,)) \
            if self.remat else SASKNResEncoder
        # geometry outside the remat scope: saved, not recomputed
        geo = saskn_geometry(points[..., :3], pts_num, self.knn_list, self.pk)
        dense_feat = enc_cls(
            ks=self.knn_list, pk=self.pk, output_size=256,
            layers=self.layers, pts_num=pts_num,
            compute_dtype=self.compute_dtype,
        )(points, train, geo)

        up_scale = int(np.ceil(self.num_fine / (self.num_coarse_raw + 2048)))
        if up_scale >= 2:
            dense_feat = EFExpansion(256, 64, step_ratio=up_scale, k=4,
                                     dtype=_dt(self.compute_dtype))(
                dense_feat
            )
        coarse_features = nn.relu(nn.Dense(64)(dense_feat))
        coarse_high = nn.Dense(3)(coarse_features)

        if coarse_high.shape[1] > self.num_fps:
            idx_fps = furthest_point_sample(coarse_high, self.num_fps)
            coarse_fps = jnp.take_along_axis(coarse_high, idx_fps[..., None], 1)
            coarse_features = jnp.take_along_axis(
                coarse_features, idx_fps[..., None], 1
            )
        else:
            coarse_fps = coarse_high

        if coarse_fps.shape[1] > self.num_coarse:
            s = nn.relu(nn.Dense(16)(coarse_features))
            s = nn.relu(nn.Dense(8)(s))
            scores = jax.nn.softplus(nn.Dense(1)(s))[..., 0]  # (B, M)
            _, idx_scores = jax.lax.top_k(scores, self.num_coarse)
            coarse = jnp.take_along_axis(coarse_fps, idx_scores[..., None], 1)
            coarse_features = jnp.take_along_axis(
                coarse_features, idx_scores[..., None], 1
            )
        else:
            coarse = coarse_fps

        if coarse.shape[1] < self.num_fine:
            ratio = self.num_fine // self.num_coarse
            if self.local_folding:
                up = Folding(256, ratio)(coarse_features, global_feat)
                center = jnp.repeat(coarse, ratio, axis=1)
                fine = nn.Dense(3)(nn.relu(nn.Dense(64)(up))) + center
            else:
                up = EFExpansion(64, 256, step_ratio=ratio, k=4,
                                 dtype=_dt(self.compute_dtype))(
                    coarse_features)
                fine = nn.Dense(3)(nn.relu(nn.Dense(64)(up)))
        else:
            fine = coarse
        return coarse_raw, coarse_high, coarse, fine


def _kl_normal(mu0, std0, mu1, std1):
    """KL(N(mu0, std0) || N(mu1, std1)), elementwise."""
    v0, v1 = std0**2, std1**2
    return jnp.log(std1 / std0) + (v0 + (mu0 - mu1) ** 2) / (2 * v1) - 0.5


def _mmd(x, y):
    """Gaussian-kernel maximum mean discrepancy between two batches of
    latent samples (B, D) — reference vrcnet.py compute_kernel/mmd_loss
    (:540-556): k(a, b) = exp(-mean((a-b)^2)/D)."""
    def kernel(a, b):
        d = jnp.mean((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
        return jnp.exp(-d / a.shape[-1])

    return (
        jnp.mean(kernel(x, x)) + jnp.mean(kernel(y, y))
        - 2.0 * jnp.mean(kernel(x, y))
    )


class VRCNet(nn.Module):
    """Full dual-path VRCNet with in-model losses
    (reference vrcnet.py Model:510-656). Needs a 'latent' RNG at call time
    (the reparametrization rsample)."""

    num_points: int = 2048
    num_coarse_raw: int = 1024
    num_fps: int = 2048
    num_coarse: int = 2048
    size_z: int = 128
    global_feature_size: int = 1024
    layers: tuple = (2, 2, 2, 2)
    knn_list: tuple = (10, 20)
    pk: int = 10
    points_label: bool = False
    local_folding: bool = False
    remat: bool = False
    distribution_loss: str = "KLD"
    train_loss: str = "cd"
    eval_emd: bool = False
    compute_dtype: str | None = None  # bf16 = AMP in the SA-SKN encoder

    @nn.compact
    def __call__(self, x: Array, gt: Array | None = None,
                 prefix: str = "train", alpha: float | None = None):
        n_input = x.shape[1]
        encoder = PCNEncoder(self.global_feature_size)
        post1 = LinearResBlock(self.global_feature_size)
        post2 = LinearResBlock(self.size_z * 2)
        prior = LinearResBlock(self.size_z * 2)
        generator = LinearResBlock(self.global_feature_size)
        decoder = MSAPSKNDecoder(
            self.num_coarse_raw, self.num_fps, self.num_coarse,
            self.num_points, self.layers, self.knn_list, self.pk,
            self.points_label, self.local_folding, remat=self.remat,
            compute_dtype=self.compute_dtype,
        )

        if prefix == "train":
            y_idx = furthest_point_sample(gt, n_input)
            y = jnp.take_along_axis(gt, y_idx[..., None], axis=1)
            gt = jnp.concatenate([gt, gt], axis=0)
            points = jnp.concatenate([x, y], axis=0)
            x = jnp.concatenate([x, x], axis=0)
        else:
            points = x
        feat = encoder(points)

        if prefix == "train":
            feat_x, feat_y = jnp.split(feat, 2, axis=0)
            o_x = post2(post1(feat_x))
            q_mu, q_std = jnp.split(o_x, 2, axis=1)
            o_y = prior(feat_y)
            p_mu, p_std = jnp.split(o_y, 2, axis=1)
            q_std = jax.nn.softplus(q_std)
            p_std = jax.nn.softplus(p_std)
            k1, k2, k3, k4 = jax.random.split(self.make_rng("latent"), 4)
            z_q = q_mu + q_std * jax.random.normal(k1, q_mu.shape)
            z_p = p_mu + p_std * jax.random.normal(k2, p_mu.shape)
            z = jnp.concatenate([z_q, z_p], axis=0)
            feat = jnp.concatenate([feat_x, feat_x], axis=0)
        else:
            o_x = post2(post1(feat))
            q_mu, q_std = jnp.split(o_x, 2, axis=1)
            q_std = jax.nn.softplus(q_std)
            z = q_mu + q_std * jax.random.normal(
                self.make_rng("latent"), q_mu.shape
            )

        feat = feat + generator(z)
        coarse_raw, coarse_high, coarse, fine = decoder(
            feat, x, train=(prefix == "train")
        )

        if prefix == "train":
            if self.distribution_loss == "KLD":
                dl_rec = _kl_normal(
                    jnp.zeros_like(p_mu), jnp.ones_like(p_std), p_mu, p_std
                )
                dl_g = _kl_normal(
                    jax.lax.stop_gradient(p_mu),
                    jax.lax.stop_gradient(p_std),
                    q_mu, q_std,
                )
            elif self.distribution_loss == "MMD":
                # reference vrcnet.py:613-620: Gaussian-kernel MMD between
                # fresh samples of N(0,1) vs the prior, and the posterior
                # vs the detached prior. (The reference calls an undefined
                # ``mmd_loss2`` for the second term — we use the same MMD.)
                z_m = jax.random.normal(k3, p_mu.shape)
                z_p_fix = jax.lax.stop_gradient(p_mu) + (
                    jax.lax.stop_gradient(p_std)
                    * jax.random.normal(k4, p_mu.shape)
                )
                dl_rec = _mmd(z_m, z_p)
                dl_g = _mmd(z_q, z_p_fix)
            else:
                raise NotImplementedError(
                    "distribution loss is either MMD or KLD"
                )
            if self.train_loss == "cd":
                loss1, _ = calc_cd(coarse_raw, gt)
                loss2, _ = calc_cd(coarse_high, gt)
                loss3, _ = calc_cd(coarse, gt)
                loss4, loss4_t = calc_cd(fine, gt)
            elif self.train_loss == "emd":
                # EMD training (the auction op handles the N<M coarse
                # stages as an injective assignment); loss4_t stays cd_t
                # so the logged train metric matches the cd configs
                loss1 = calc_emd(coarse_raw, gt)
                loss2 = calc_emd(coarse_high, gt)
                loss3 = calc_emd(coarse, gt)
                loss4 = calc_emd(fine, gt)
                _, loss4_t = calc_cd(fine, gt)
            else:
                raise NotImplementedError("train loss is either cd or emd")
            total = (
                loss1.mean() * 10 + loss2.mean() * 0.5 + loss3.mean()
                + loss4.mean() * alpha
                + (dl_rec.mean() + dl_g.mean()) * 20
            )
            return {"out2": fine, "loss2": loss4_t, "total_loss": total}
        if prefix == "val":
            cd_p, cd_t, f1 = calc_cd(fine, gt, calc_f1=True)
            out = {"out1": coarse_raw, "out2": fine, "cd_p": cd_p,
                   "cd_t": cd_t, "f1": f1}
            if self.eval_emd:
                out["emd"] = calc_emd(fine, gt, eps=0.004, iterations=3000)
            return out
        return {"result": fine}
