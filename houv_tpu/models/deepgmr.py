"""DeepGMR — registration via Gaussian-mixture alignment (flax).

Reference: registration/models/deepgmr.py. PointNet backbone producing
per-point soft cluster assignments gamma over J=16 components (:174-197),
closed-form GMM parameters (:98-120), weighted-Procrustes alignment between
mixtures (:123-143), forward + backward consistency MSE losses (:243-246).
Optional RRI (rotation-invariant) input features (:54-95) — the reference
computes part of RRI in numpy on CPU; here it is fully vectorized JAX.
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
from houv_tpu.models.common import PointMLP, max_pool_points
from houv_tpu.ops.grouping import knn_points

Array = jax.Array


def get_rri(pts: Array, k: int) -> Array:
    """Rotation-invariant features per point (reference deepgmr.py:54-95,
    math from the DeepGMR paper): for each point p and its k nearest
    neighbors q_i (excluding self): [|p|, |q_i|, angle(p, q_i), phi_i] where
    phi_i is the smallest positive tangent-plane angle to another neighbor.

    pts (B, N, 3) -> (B, N, 4k)."""
    b, n, _ = pts.shape
    _, idx = knn_points(pts, pts, k + 1)
    idx = idx[..., 1:]  # drop self
    # vmap row-indexing: the broadcast + take_along_axis(axis=2) form makes
    # XLA's backward scatter into the full (B, N, N, 3) broadcast shape.
    q = jax.vmap(lambda s, i: s[i])(pts, idx)  # (B, N, k, 3)
    p = jnp.broadcast_to(pts[:, :, None, :], q.shape)

    rp = jnp.linalg.norm(p, axis=-1, keepdims=True)
    rq = jnp.linalg.norm(q, axis=-1, keepdims=True)
    pn = p / jnp.maximum(rp, 1e-9)
    qn = q / jnp.maximum(rq, 1e-9)
    dot = jnp.sum(pn * qn, axis=-1, keepdims=True)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))

    # Tangent-plane projections of neighbors, pairwise angles around pn.
    t_q = q - dot * p  # (B, N, k, 3)
    cross = jnp.cross(t_q[:, :, None, :, :], t_q[:, :, :, None, :])
    sin_psi = jnp.sum(cross * pn[:, :, None, :, :], axis=-1)  # (B, N, k, k)
    cos_psi = jnp.sum(t_q[:, :, None, :, :] * t_q[:, :, :, None, :], axis=-1)
    psi = jnp.mod(jnp.arctan2(sin_psi, cos_psi), 2 * jnp.pi)
    # Self-angle must be exactly 0 (float noise makes atan2 return -ε which
    # wraps to 2π and corrupts the "second smallest" selection below).
    eye = jnp.eye(k, dtype=bool)
    psi = jnp.where(eye, 0.0, psi)
    phi = jnp.sort(psi, axis=-1)[..., 1:2]  # smallest positive (self is 0)

    feat = jnp.concatenate([rp, rq, theta, phi], axis=-1)  # (B, N, k, 4)
    return feat.reshape(b, n, 4 * k)


def gmm_params(gamma: Array, pts: Array):
    """Soft assignments -> mixture (pi, mu, sigma) with isotropic covariances
    (reference deepgmr.py:98-120). gamma (B, N, J), pts (B, N, 3)."""
    pi = gamma.mean(axis=1)  # (B, J)
    npi = pi * gamma.shape[1]
    mu = jnp.einsum("bnj,bnc->bjc", gamma, pts) / jnp.maximum(
        npi[..., None], 1e-9
    )
    diff = pts[:, :, None, :] - mu[:, None, :, :]  # (B, N, J, 3)
    var = (
        jnp.einsum("bnjc,bnjc,bnj->bj", diff, diff, gamma)
        / jnp.maximum(npi, 1e-9)
    )
    sigma = var[..., None, None] * jnp.eye(3, dtype=pts.dtype)
    return pi, mu, sigma


def gmm_register(pi_s: Array, mu_s: Array, mu_t: Array, sigma_t: Array) -> Array:
    """Weighted Procrustes between mixtures (reference deepgmr.py:123-143,
    vectorized SVD instead of the CPU loop). Returns (B, 4, 4)."""
    c_s = jnp.einsum("bj,bjc->bc", pi_s, mu_s)[:, None]  # (B, 1, 3)
    c_t = jnp.einsum("bj,bjc->bc", pi_s, mu_t)[:, None]
    sigma_inv = jnp.linalg.inv(sigma_t)
    ms = jnp.einsum(
        "bj,bjc,bjd,bjde->bce",
        pi_s, mu_s - c_s, mu_t - c_t, sigma_inv,
        precision=jax.lax.Precision.HIGHEST,
    )  # Σ_j pi_j (mu_s - c_s)(mu_t - c_t)ᵀ Σ_t⁻¹, (B, 3, 3)
    u, _, vt = jnp.linalg.svd(ms.astype(jnp.float32))
    v = jnp.swapaxes(vt, -1, -2)
    det = jnp.linalg.det(
        jnp.matmul(v, jnp.swapaxes(u, -1, -2),
                   precision=jax.lax.Precision.HIGHEST)
    )
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    r = jnp.matmul(
        v * d[:, None, :], jnp.swapaxes(u, -1, -2),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(mu_s.dtype)
    t = c_t[:, 0] - jnp.einsum("bij,bj->bi", r, c_s[:, 0])
    return rt_to_transformation(r, t)


class GMRBackbone(nn.Module):
    """PointNet encoder-decoder -> per-point cluster logits
    (reference deepgmr.py:172-197)."""

    num_groups: int = 16
    use_bn: bool = True
    axis_name: str | None = None
    dtype: object = None  # bf16 = AMP (params/BN stats f32, logits f32)

    @nn.compact
    def __call__(self, feats: Array, train: bool = False) -> Array:
        n = feats.shape[1]
        enc = PointMLP((64, 128, 256, 1024), relu_last=True,
                       use_bn=self.use_bn, axis_name=self.axis_name,
                       dtype=self.dtype)
        f_loc = enc(feats, train)
        f_glob = max_pool_points(f_loc)
        h = jnp.concatenate(
            [f_loc, jnp.broadcast_to(f_glob[:, None], f_loc.shape)], axis=-1
        )
        dec = PointMLP((512, 256, 128), relu_last=True, use_bn=self.use_bn,
                       axis_name=self.axis_name, dtype=self.dtype)
        h = dec(h, train)
        return nn.Dense(self.num_groups)(h)  # logits (B, N, J) f32


class DeepGMR(nn.Module):
    """Full DeepGMR with in-model losses (reference deepgmr.py:199-246)."""

    num_groups: int = 16
    use_rri: bool = True
    rri_size: int = 20
    axis_name: str | None = None
    # bf16 = AMP in the PointNet backbone only; RRI features, the GMM
    # closed forms, SVD, and losses stay f32 (registration numerics).
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, src: Array, tgt: Array, t_gt: Array | None = None,
                 prefix: str = "train", train: bool = False):
        pts1, pts2 = src, tgt  # reference naming (deepgmr.py pts1/pts2)
        if self.use_rri:
            feats1 = get_rri(pts1, self.rri_size)
            feats2 = get_rri(pts2, self.rri_size)
        else:
            feats1 = pts1 - pts1.mean(axis=1, keepdims=True)
            feats2 = pts2 - pts2.mean(axis=1, keepdims=True)

        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        backbone = GMRBackbone(self.num_groups, axis_name=self.axis_name,
                               dtype=dt)
        gamma1 = jax.nn.softmax(backbone(feats1, train), axis=-1)
        gamma2 = jax.nn.softmax(backbone(feats2, train), axis=-1)
        pi1, mu1, sigma1 = gmm_params(gamma1, pts1)
        pi2, mu2, sigma2 = gmm_params(gamma2, pts2)

        t_12 = gmm_register(pi1, mu1, mu2, sigma2)
        if prefix == "test" and t_gt is None:
            return t_12
        t_21 = gmm_register(pi2, mu2, mu1, sigma1)

        eye = jnp.broadcast_to(jnp.eye(4, dtype=t_12.dtype), t_gt.shape)
        mse1 = jnp.mean((t_12 @ jnp.linalg.inv(t_gt) - eye) ** 2)
        mse2 = jnp.mean((t_21 @ t_gt - eye) ** 2)
        loss = mse1 + mse2

        r_err = rotation_error(t_12[:, :3, :3], t_gt[:, :3, :3])
        t_err = translation_error(t_12[:, :3, 3], t_gt[:, :3, 3])
        rmse = rmse_loss(pts1, t_12, t_gt)
        rt_mse = (
            rotation_geodesic_error(t_12[:, :3, :3], t_gt[:, :3, :3])
            + translation_error(t_12[:, :3, 3], t_gt[:, :3, 3])
        )
        return {
            "loss": loss,
            "r_err": r_err,
            "t_err": t_err,
            "rmse": rmse,
            "rt_mse": rt_mse,
            "transform": t_12,
        }
