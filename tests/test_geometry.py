"""Geometry tests: Rodrigues, quaternions, errors, Kabsch — vs scipy golden."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from houv_tpu.geometry import (
    axis_angle_from_matrix,
    kabsch,
    mat2euler,
    quat2mat,
    random_pose,
    rodrigues,
    rotation_error,
    rotation_xyz,
    rmse_loss,
    rt_to_transformation,
    translation_error,
    weighted_kabsch,
)


def test_rodrigues_matches_scipy(rng):
    axis = rng.standard_normal((16, 3)).astype(np.float32)
    angle = rng.uniform(0, np.pi, (16,)).astype(np.float32)
    r = np.asarray(rodrigues(jnp.asarray(angle), jnp.asarray(axis)))
    unit = axis / np.linalg.norm(axis, axis=1, keepdims=True)
    r_ref = Rotation.from_rotvec(unit * angle[:, None]).as_matrix()
    np.testing.assert_allclose(r, r_ref, rtol=1e-4, atol=1e-5)


def test_rodrigues_is_rotation(rng):
    axis = rng.standard_normal((8, 3)).astype(np.float32)
    angle = rng.uniform(-np.pi, np.pi, (8,)).astype(np.float32)
    r = np.asarray(rodrigues(jnp.asarray(angle), jnp.asarray(axis)))
    np.testing.assert_allclose(
        r @ np.swapaxes(r, 1, 2),
        np.broadcast_to(np.eye(3), (8, 3, 3)),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_quat2mat_matches_scipy(rng):
    q = rng.standard_normal((10, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ours = np.asarray(quat2mat(jnp.asarray(q)))
    ref = Rotation.from_quat(q).as_matrix()  # scipy expects (x,y,z,w) too
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_mat2euler_matches_scipy(rng):
    r = Rotation.random(12, rng).as_matrix().astype(np.float32)
    for seq in ("zyx", "ZYX"):
        ours = np.asarray(mat2euler(jnp.asarray(r), seq=seq))
        ref = Rotation.from_matrix(r).as_euler(seq, degrees=True)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_rotation_error_zero_and_known(rng):
    r = Rotation.random(5, rng).as_matrix().astype(np.float32)
    err = np.asarray(rotation_error(jnp.asarray(r), jnp.asarray(r)))
    # arccos near cos=1 is ill-conditioned in f32: ~0.03 deg noise is expected
    np.testing.assert_allclose(err, 0.0, atol=5e-2)
    # 30° rotation about z vs identity
    r30 = Rotation.from_euler("z", 30, degrees=True).as_matrix().astype(np.float32)
    err = np.asarray(rotation_error(jnp.asarray(r30[None]), jnp.eye(3)[None]))
    np.testing.assert_allclose(err, 30.0, rtol=1e-3)


def test_axis_angle_roundtrip(rng):
    axis = rng.standard_normal((6, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(0.1, np.pi - 0.1, (6,)).astype(np.float32)
    r = rodrigues(jnp.asarray(angle), jnp.asarray(axis))
    deg, ax = axis_angle_from_matrix(r)
    np.testing.assert_allclose(np.asarray(deg), np.degrees(angle), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ax), axis, rtol=1e-2, atol=1e-4)


def test_kabsch_recovers_pose(rng):
    pts = rng.standard_normal((4, 100, 3)).astype(np.float32)
    r_gt = Rotation.random(4, rng).as_matrix().astype(np.float32)
    t_gt = rng.standard_normal((4, 3)).astype(np.float32)
    tgt = np.einsum("bij,bnj->bni", r_gt, pts) + t_gt[:, None]
    r, t = kabsch(jnp.asarray(pts), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(r), r_gt, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, rtol=1e-3, atol=1e-4)


def test_weighted_kabsch_ignores_zero_weight_outliers(rng):
    pts = rng.standard_normal((2, 60, 3)).astype(np.float32)
    r_gt = Rotation.random(2, rng).as_matrix().astype(np.float32)
    t_gt = rng.standard_normal((2, 3)).astype(np.float32)
    tgt = np.einsum("bij,bnj->bni", r_gt, pts) + t_gt[:, None]
    tgt[:, :10] += 100.0  # corrupt first 10 correspondences
    w = np.ones((2, 60), np.float32)
    w[:, :10] = 0.0
    r, t = weighted_kabsch(jnp.asarray(pts), jnp.asarray(tgt), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(r), r_gt, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, rtol=1e-3, atol=1e-3)


def test_kabsch_det_positive_under_reflection_risk(rng):
    # Nearly-planar clouds are where det<0 solutions appear without the fix.
    pts = rng.standard_normal((8, 50, 3)).astype(np.float32)
    pts[..., 2] *= 1e-4
    tgt = rng.standard_normal((8, 50, 3)).astype(np.float32)
    r, _ = kabsch(jnp.asarray(pts), jnp.asarray(tgt))
    np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-4)


def test_random_pose_shape_and_validity():
    key = jax.random.PRNGKey(0)
    t = np.asarray(random_pose(key, np.pi / 2, 0.5))
    assert t.shape == (4, 4)
    r = t[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.norm(t[:3, 3]) <= 0.5 + 1e-6
    np.testing.assert_allclose(t[3], [0, 0, 0, 1])


def test_rmse_and_translation_error(rng):
    pts = rng.standard_normal((3, 40, 3)).astype(np.float32)
    r = Rotation.random(3, rng).as_matrix().astype(np.float32)
    t = rng.standard_normal((3, 3)).astype(np.float32)
    tf = np.asarray(rt_to_transformation(jnp.asarray(r), jnp.asarray(t)))
    assert tf.shape == (3, 4, 4)
    rm = np.asarray(rmse_loss(jnp.asarray(pts), jnp.asarray(tf), jnp.asarray(tf)))
    np.testing.assert_allclose(rm, 0.0, atol=1e-5)
    te = np.asarray(
        translation_error(jnp.asarray(t), jnp.asarray(t + np.array([3.0, 0, 4.0])))
    )
    np.testing.assert_allclose(te, 5.0, rtol=1e-5)


def test_rotation_xyz_composition(rng):
    ang = rng.uniform(-1, 1, (5, 3)).astype(np.float32)
    r = np.asarray(rotation_xyz(jnp.asarray(ang)))
    ref = np.stack(
        [
            Rotation.from_euler("x", a[0]).as_matrix()
            @ Rotation.from_euler("y", a[1]).as_matrix()
            @ Rotation.from_euler("z", a[2]).as_matrix()
            for a in ang
        ]
    )
    np.testing.assert_allclose(r, ref, rtol=1e-4, atol=1e-5)
