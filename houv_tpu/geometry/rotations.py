"""Rigid-transform math, batched and jit-friendly.

TPU-native replacement for the reference's rigid-transform helpers
(reference: registration/train_utils.py:45-148, registration/models/houv.py:69-103).
Everything here is a pure function over batched arrays — no per-sample
Python loops, no device hops; all functions vmap/jit cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

# Rigid-transform math must be exact f32: TPU's default matmul runs bf16
# passes, which would inject ~1e-3 error into rotation matrices — visible in
# degree-level rotation-error metrics. These matmuls are 3x3 or Nx3, so full
# precision is free.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _skew(v: Array) -> Array:
    """(..., 3) unit vectors -> (..., 3, 3) skew-symmetric cross-product matrices."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(angle: Array, axis: Array, eps: float = 1e-12) -> Array:
    """Rotation matrices from (unnormalized) axis + angle via Rodrigues' formula.

    R = I + sin(a)·A + (1-cos(a))·A², A = skew(axis/|axis|).

    Mirrors ``rotation()`` (reference registration/train_utils.py:113-130): the
    axis is normalized inside, the angle enters through sin/cos so gradients
    flow to both parameters.

    Args:
      angle: (...,) or (..., 1) rotation angles in radians.
      axis:  (..., 3) rotation axes (any norm > 0).
    Returns:
      (..., 3, 3) rotation matrices.
    """
    angle = jnp.asarray(angle)
    if angle.ndim == axis.ndim:  # (..., 1) -> (...,)
        angle = angle[..., 0]
    norm = jnp.sqrt(jnp.sum(axis * axis, axis=-1, keepdims=True) + eps)
    a = _skew(axis / norm)
    eye = jnp.eye(3, dtype=axis.dtype)
    sin = jnp.sin(angle)[..., None, None]
    cos1 = (1.0 - jnp.cos(angle))[..., None, None]
    return eye + sin * a + cos1 * _mm(a, a)


# Alias matching the reference naming.
rotation_from_axis_angle = rodrigues


def rotation_xyz(angles_xyz: Array) -> Array:
    """R = Rx(ax) @ Ry(ay) @ Rz(az) from (..., 3) Euler-style angles.

    Mirrors ``rotation_v2`` (reference registration/train_utils.py:132-142).
    """
    shape = angles_xyz.shape[:-1]
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], angles_xyz.dtype), shape + (3,))
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], angles_xyz.dtype), shape + (3,))
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], angles_xyz.dtype), shape + (3,))
    rx = rodrigues(angles_xyz[..., 0], ex)
    ry = rodrigues(angles_xyz[..., 1], ey)
    rz = rodrigues(angles_xyz[..., 2], ez)
    return _mm(_mm(rx, ry), rz)


def quat2mat(quat: Array) -> Array:
    """(..., 4) quaternions laid out (x, y, z, w) -> (..., 3, 3) rotations.

    Same component convention as the reference ``quat2mat``
    (registration/train_utils.py:45-58). Not normalized inside — feed unit
    quaternions (the reference relies on upstream normalization too).
    """
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def mat2euler(mats: Array, seq: str = "zyx") -> Array:
    """Rotation matrices -> Euler angles in degrees, batched.

    Replaces ``npmat2euler`` (reference registration/train_utils.py:68-73)
    without the per-sample scipy loop. 'zyx' is scipy's extrinsic z-y-x (the
    reference's choice, i.e. R = Rx(γ)·Ry(β)·Rz(α), returned [α, β, γ]);
    'ZYX' is the intrinsic variant (R = Rz·Ry·Rx).
    """
    r = mats
    if seq == "ZYX":
        z = jnp.arctan2(r[..., 1, 0], r[..., 0, 0])
        y = jnp.arcsin(jnp.clip(-r[..., 2, 0], -1.0, 1.0))
        x = jnp.arctan2(r[..., 2, 1], r[..., 2, 2])
    elif seq == "zyx":
        z = -jnp.arctan2(r[..., 0, 1], r[..., 0, 0])
        y = jnp.arcsin(jnp.clip(r[..., 0, 2], -1.0, 1.0))
        x = -jnp.arctan2(r[..., 1, 2], r[..., 2, 2])
    else:
        raise NotImplementedError("sequences: 'zyx' (reference) or 'ZYX'")
    return jnp.stack([z, y, x], axis=-1) * (180.0 / jnp.pi)


def random_pose(key: Array, max_angle: float, max_trans: float) -> Array:
    """One random 4x4 rigid transform: uniform axis on S², angle ~ U·max_angle,
    translation direction uniform with norm ~ U·max_trans.

    Matches the distribution of the reference's on-the-fly pose synthesis
    (registration/dataset.py:16-53: random axis via normalized gaussian,
    uniform angle / translation magnitude).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    axis = jax.random.normal(k1, (3,))
    axis = axis / jnp.linalg.norm(axis)
    angle = jax.random.uniform(k2) * max_angle
    r = rodrigues(angle, axis)
    tdir = jax.random.normal(k3, (3,))
    tdir = tdir / jnp.linalg.norm(tdir)
    t = tdir * jax.random.uniform(k4) * max_trans
    top = jnp.concatenate([r, t[:, None]], axis=1)
    bot = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
    return jnp.concatenate([top, bot], axis=0)


def rt_to_transformation(r: Array, t: Array) -> Array:
    """(..., 3, 3) + (..., 3) or (..., 3, 1) -> (..., 4, 4) homogeneous transforms."""
    if t.shape[-1] != 1:
        t = t[..., None]
    top = jnp.concatenate([r, t], axis=-1)
    bot = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=r.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bot], axis=-2)


def transform_points(points: Array, r: Array, t: Array) -> Array:
    """Apply (..., 3, 3) rotation + (..., 3) translation to (..., N, 3) points."""
    return _mm(points, jnp.swapaxes(r, -1, -2)) + t[..., None, :]


def rotation_error(r: Array, r_gt: Array) -> Array:
    """Angular error in degrees between batched rotations.

    trace(R·R_gtᵀ) identity via einsum like the reference
    (registration/train_utils.py:82-85).
    """
    cos_theta = (
        jnp.einsum("...ij,...ij->...", r, r_gt, precision=jax.lax.Precision.HIGHEST)
        - 1.0
    ) / 2.0
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    return jnp.arccos(cos_theta) * (180.0 / jnp.pi)


def translation_error(t: Array, t_gt: Array) -> Array:
    """L2 norm of translation difference (reference train_utils.py:88-89)."""
    return jnp.linalg.norm(t - t_gt, axis=-1)


def rmse_loss(pts: Array, t: Array, t_gt: Array) -> Array:
    """Mean per-point distance between clouds moved by T vs T_gt
    (reference train_utils.py:92-95)."""
    pred = _mm(pts, jnp.swapaxes(t[..., :3, :3], -1, -2)) + t[..., None, :3, 3]
    gt = _mm(pts, jnp.swapaxes(t_gt[..., :3, :3], -1, -2)) + t_gt[..., None, :3, 3]
    return jnp.linalg.norm(pred - gt, axis=-1).mean(axis=-1)


def rotation_geodesic_error(m1: Array, m2: Array) -> Array:
    """Geodesic angle (radians) between rotations (reference train_utils.py:98-110)."""
    m = _mm(m1, jnp.swapaxes(m2, -1, -2))
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def normalize_translation(tran: Array, scale: Array, eps: float = 1e-12) -> Array:
    """Unit-normalize a direction and scale it: the reference's ``translation()``
    (train_utils.py:144-148). scale may be negative (sine reparam)."""
    norm = jnp.sqrt(jnp.sum(tran * tran, axis=-1, keepdims=True) + eps)
    return tran / norm * scale


def axis_angle_from_matrix(r: Array, eps: float = 1e-7) -> tuple[Array, Array]:
    """Recover (angle_degrees, unit_axis) from rotation matrices.

    Inverse of ``rodrigues``; replaces ``translation_back``
    (reference train_utils.py:1019-1032). Angle in [0, 180] degrees.
    """
    cos = jnp.clip((jnp.trace(r, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    angle = jnp.arccos(cos)
    axis = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.maximum(norm, eps)
    # Degenerate angle≈0 -> arbitrary unit axis (z), matching acos-domain safety.
    safe = norm[..., 0] > eps
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], r.dtype), axis.shape)
    axis = jnp.where(safe[..., None], axis, fallback)
    return angle * (180.0 / jnp.pi), axis
