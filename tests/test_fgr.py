"""FPFH + Fast Global Registration tests (reference model_utils.py:118-148
FPFH via Open3D, train_ICP.py:156-185 FGR path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.data.mvp import random_pose_np
from houv_tpu.solvers.fgr import (
    estimate_normals,
    fgr_solve,
    fpfh,
    mutual_correspondences,
)
from houv_tpu.solvers.houv import evaluate_solution


def test_normals_of_a_plane(rng):
    """Points on z=0: normals must be ±z."""
    pts = rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)
    pts[..., 2] = 0.0
    n = estimate_normals(jnp.asarray(pts), k=8)
    nz = np.abs(np.asarray(n)[..., 2])
    np.testing.assert_allclose(nz, 1.0, atol=1e-4)


def test_fpfh_rotation_invariance(rng):
    """FPFH is built from relative angles: descriptors are (near)
    rotation-invariant."""
    pts = rng.uniform(-1, 1, (1, 256, 3)).astype(np.float32)
    pose = random_pose_np(rng, np.pi, 0.0)
    moved = pts @ pose[:3, :3].T.astype(np.float32)
    f1 = np.asarray(fpfh(jnp.asarray(pts), k=12))
    f2 = np.asarray(fpfh(jnp.asarray(moved), k=12))
    # same neighborhoods, same angles -> close histograms (bin-edge flips
    # allowed on a few points)
    diff = np.abs(f1 - f2).sum(-1)
    assert np.median(diff) < 0.35


def test_mutual_correspondences_identity(rng):
    f = jnp.asarray(rng.standard_normal((1, 64, 8)).astype(np.float32))
    idx, mutual = mutual_correspondences(f, f)
    np.testing.assert_array_equal(np.asarray(idx)[0], np.arange(64))
    assert np.asarray(mutual).all()


@pytest.mark.slow
def test_fgr_registers_full_overlap(rng):
    """FGR recovers large rotations on full-overlap pairs — the global
    (initialization-free) role Go-ICP/FGR play in the reference."""
    data = synthesize_registration_pairs(
        4, n_points=256, max_angle_deg=120.0, seed=3,
        shape_mode="structured",
    )
    # full overlap: register src against a moved copy of itself
    src = jnp.asarray(data["src"])
    poses = np.stack(
        [random_pose_np(rng, np.radians(120.0), 0.3) for _ in range(4)]
    ).astype(np.float32)
    tgt = jnp.einsum("bij,bnj->bni", jnp.asarray(poses[:, :3, :3]), src) \
        + jnp.asarray(poses[:, None, :3, 3])
    out = fgr_solve(src, tgt, iters=64, k=12)
    r_err, t_err = evaluate_solution(out["transform"], jnp.asarray(poses))
    r = np.asarray(r_err)
    assert np.median(r) < 10.0, r
