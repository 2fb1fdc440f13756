"""FPFH features + Fast Global Registration — TPU-native.

The reference uses Open3D for both (registration/model_utils.py:118-148
``FPFH``: estimate normals + compute_fpfh_feature; registration/
train_ICP.py:156-185 commented FGR path via
registration_fast_based_on_feature_matching). Here both are batched
jax.numpy over the whole pair batch at once — no per-pair host loops:

- normals: smallest eigenvector of each point's kNN covariance,
- FPFH: the standard 33-bin descriptor — per-point SPFH (11 bins for each
  Darboux angle feature alpha/phi/theta, one-hot histogram sums) followed
  by the distance-weighted neighbor average,
- correspondences: mutual nearest neighbors in feature space,
- solve: graduated non-convexity over Geman-McClure weights (the FGR
  objective, Zhou et al. 2016): alternate closed-form weighted Kabsch with
  a decreasing mu, implemented as a lax.scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from houv_tpu.geometry.kabsch import weighted_kabsch
from houv_tpu.ops.grouping import knn_points

Array = jax.Array


def estimate_normals(points: Array, k: int = 16) -> Array:
    """(B, N, 3) -> (B, N, 3) unit normals (smallest covariance axis)."""
    _, idx = knn_points(points, points, k)
    nb = jax.vmap(lambda p, i: p[i])(points, idx)      # (B, N, k, 3)
    centered = nb - nb.mean(axis=2, keepdims=True)
    cov = jnp.einsum("bnkc,bnkd->bncd", centered, centered) / k
    # eigh returns ascending eigenvalues: column 0 = normal direction
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[..., 0]
    # orient towards viewpoint (origin) like Open3D's default
    flip = jnp.sum(n * points, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def _darboux_angles(p1, n1, p2, n2):
    """Angle features (alpha, phi, theta) of the (p1,n1)->(p2,n2) pair."""
    d = p2 - p1
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / jnp.maximum(dist, 1e-9)
    u = n1
    v = jnp.cross(d, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * n2, axis=-1)                   # in [-1, 1]
    phi = jnp.sum(u * d, axis=-1)                      # in [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * n2, axis=-1), jnp.sum(u * n2, axis=-1))
    return alpha, phi, theta


def _hist11(x, lo, hi):
    """Soft-free hard histogram: (..., k) values -> (..., 11) one-hot sums."""
    bins = jnp.clip(((x - lo) / (hi - lo) * 11).astype(jnp.int32), 0, 10)
    return jax.nn.one_hot(bins, 11, dtype=jnp.float32).sum(axis=-2)


def fpfh(points: Array, normals: Array | None = None, k: int = 16) -> Array:
    """(B, N, 3) -> (B, N, 33) FPFH descriptors."""
    if normals is None:
        normals = estimate_normals(points, k)
    neg_d, idx = knn_points(points, points, k + 1)
    idx = idx[..., 1:]                                  # drop self
    sqd = -neg_d[..., 1:]
    nb_p = jax.vmap(lambda p, i: p[i])(points, idx)     # (B, N, k, 3)
    nb_n = jax.vmap(lambda n, i: n[i])(normals, idx)
    alpha, phi, theta = _darboux_angles(
        points[:, :, None], normals[:, :, None], nb_p, nb_n
    )
    spfh = jnp.concatenate(
        [
            _hist11(alpha, -1.0, 1.0),
            _hist11(phi, -1.0, 1.0),
            _hist11(theta, -jnp.pi, jnp.pi),
        ],
        axis=-1,
    ) / k                                               # (B, N, 33)
    # FPFH = SPFH + mean_k SPFH(neighbor)/dist (Rusu et al. weighting)
    nb_spfh = jax.vmap(lambda s, i: s[i])(spfh, idx)    # (B, N, k, 33)
    w = 1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(sqd, 0.0)), 1e-6)
    fp = spfh + jnp.sum(nb_spfh * w[..., None], axis=2) \
        / jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-9)
    return fp


def mutual_correspondences(feat_src: Array, feat_tgt: Array):
    """Mutual-NN matches in feature space.

    (B, N, D) × (B, M, D) -> (idx_tgt (B, N) int32, mutual (B, N) bool):
    per src point its feature-NN in tgt, flagged when the match is mutual.
    """
    _, i_st = knn_points(feat_src, feat_tgt, 1, use_pallas=False)
    _, i_ts = knn_points(feat_tgt, feat_src, 1, use_pallas=False)
    i_st = i_st[..., 0]
    i_ts = i_ts[..., 0]
    back = jnp.take_along_axis(i_ts, i_st, axis=1)      # (B, N)
    n = feat_src.shape[1]
    mutual = back == jnp.arange(n, dtype=i_st.dtype)[None, :]
    return i_st, mutual


@functools.partial(jax.jit, static_argnames=("iters", "k"))
def fgr_solve(src: Array, tgt: Array, iters: int = 64, k: int = 16,
              mu_init: float = 1.0, div_factor: float = 1.4,
              mu_min: float = 1e-3):
    """Fast Global Registration on a batch of pairs.

    (B, N, 3), (B, M, 3) -> {'transform': (B, 4, 4)}. Correspondences come
    from mutual FPFH nearest neighbors; the pose minimizes the
    Geman-McClure robust objective by alternating closed-form weighted
    Kabsch with a graduated mu (Zhou et al., ECCV 2016, eq. 5-7).
    """
    f_src = fpfh(src, k=k)
    f_tgt = fpfh(tgt, k=k)
    idx, mutual = mutual_correspondences(f_src, f_tgt)
    p = src                                             # (B, N, 3)
    q = jnp.take_along_axis(tgt, idx[..., None], axis=1)
    base_w = mutual.astype(jnp.float32)

    def step(carry, _):
        r, t, mu = carry
        moved = jnp.einsum("bij,bnj->bni", r, p) + t[:, None]
        res2 = jnp.sum((moved - q) ** 2, axis=-1)
        w = base_w * (mu / (mu + res2)) ** 2
        r2, t2 = weighted_kabsch(p, q, w)
        mu = jnp.maximum(mu / div_factor, mu_min)
        return (r2, t2, mu), None

    bsz = src.shape[0]
    init = (
        jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), (bsz, 3, 3)),
        jnp.zeros((bsz, 3), src.dtype),
        jnp.float32(mu_init),
    )
    (r, t, _), _ = jax.lax.scan(step, init, None, length=iters)
    tf = jnp.zeros((bsz, 4, 4), src.dtype)
    tf = tf.at[:, :3, :3].set(r).at[:, :3, 3].set(t).at[:, 3, 3].set(1.0)
    return {"transform": tf}
