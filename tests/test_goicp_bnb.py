"""Certified Go-ICP BnB (solvers/goicp_bnb.py): bound validity, pruning
soundness, and end-to-end recovery with a certificate.

Reference counterpart: registration/test_goicp.py:153-177 (py_goicp
branch-and-bound with a 3D distance transform). These tests check the
mathematical CONTRACTS that make our rebuild full-strength: the field
floor never exceeds the true distance, a cube's lower bound never
exceeds the objective anywhere inside the cube, and the final gap
really bounds suboptimality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from houv_tpu.geometry.rotations import rodrigues
from houv_tpu.solvers.goicp_bnb import (
    _field_lookup,
    build_distance_field,
    goicp_bnb_solve,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _cloud(rng, n):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    return pts / (2.0 * np.abs(pts).max())  # inside [-0.5, 0.5]³


def test_distance_field_floor_is_lower_bound(rng):
    tgt = jnp.asarray(_cloud(rng, 64)[None])
    field, cell = build_distance_field(tgt, grid=24, lo=-1.2, hi=1.2)
    qry = jnp.asarray(rng.uniform(-0.9, 0.9, (200, 3)).astype(np.float32))
    true_d = jnp.sqrt(
        jnp.min(jnp.sum((qry[:, None] - tgt[0][None]) ** 2, -1), -1)
    )
    f, node_d = _field_lookup(field[0], qry, -1.2, cell)
    half_diag = np.sqrt(3.0) / 2.0 * cell
    floor = f - node_d
    ceil = f + node_d
    assert bool(jnp.all(floor <= true_d + 1e-5))
    assert bool(jnp.all(ceil >= true_d - 1e-5))
    # in-grid the node distance never exceeds the half cell diagonal
    assert bool(jnp.all(node_d <= half_diag + 1e-6))
    # and the floor is not vacuous: it tracks the true distance
    assert float(jnp.mean(jnp.abs(f - true_d))) < 2.0 * half_diag


def test_field_bounds_valid_outside_grid(rng):
    """ADVICE r4 (medium): queries OUTSIDE [lo, hi]³ hit a clipped node;
    the r4 half-diagonal floor over-estimated there (e.g. 0.346 vs a true
    distance of 0.10 at x=2.1) and could prune the optimum. The node-
    distance bounds must stay valid arbitrarily far outside the grid."""
    tgt = jnp.asarray(_cloud(rng, 64)[None])
    field, cell = build_distance_field(tgt, grid=24, lo=-1.2, hi=1.2)
    qry = jnp.asarray(
        np.concatenate([
            rng.uniform(1.2, 3.0, (100, 3)),      # fully outside
            rng.uniform(-3.0, 3.0, (200, 3)),     # mixed in/out
            np.array([[2.1, 0.0, 0.0]]),          # the advisor's example
        ]).astype(np.float32)
    )
    true_d = jnp.sqrt(
        jnp.min(jnp.sum((qry[:, None] - tgt[0][None]) ** 2, -1), -1)
    )
    f, node_d = _field_lookup(field[0], qry, -1.2, cell)
    assert bool(jnp.all(f - node_d <= true_d + 1e-5))
    assert bool(jnp.all(f + node_d >= true_d - 1e-5))


def test_cube_lower_bound_validity(rng):
    """For random SE(3) cubes and random transforms drawn INSIDE each
    cube, E(transform) >= cube lower bound (the Go-ICP lemma chain
    restated through the dense field)."""
    src = _cloud(rng, 48)
    tgt = _cloud(rng, 64)
    p = jnp.asarray(src)
    tgtj = jnp.asarray(tgt[None])
    field, cell = build_distance_field(tgtj, grid=24, lo=-1.5, hi=1.5)
    p_norm = np.linalg.norm(src, axis=-1)

    for trial in range(20):
        rc = rng.uniform(-2.0, 2.0, 3).astype(np.float32)
        sr = float(rng.uniform(0.05, 0.6))
        tc = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
        st = float(rng.uniform(0.02, 0.2))
        # cube LB at the center
        ang = np.linalg.norm(rc)
        r_c = rodrigues(jnp.asarray([ang], jnp.float32),
                        jnp.asarray((rc / max(ang, 1e-9))[None]))[0]
        moved = p @ r_c.T + jnp.asarray(tc)
        f, node_d = _field_lookup(field[0], moved, -1.5, cell)
        gamma = 2.0 * np.sin(min(np.sqrt(3.0) * sr, np.pi) / 2.0) * p_norm
        tau = np.sqrt(3.0) * st
        lb_pt = jnp.maximum(f - node_d - gamma - tau, 0.0)
        lb = float(jnp.mean(lb_pt**2))

        # random transform inside the cube
        rr = rc + rng.uniform(-sr, sr, 3).astype(np.float32)
        tt = tc + rng.uniform(-st, st, 3).astype(np.float32)
        ang2 = np.linalg.norm(rr)
        r_in = rodrigues(jnp.asarray([ang2], jnp.float32),
                         jnp.asarray((rr / max(ang2, 1e-9))[None]))[0]
        moved2 = p @ r_in.T + jnp.asarray(tt)
        e_true = float(jnp.mean(
            jnp.min(jnp.sum((moved2[:, None] - tgtj[0][None]) ** 2, -1), -1)
        ))
        assert e_true >= lb - 1e-5, (trial, e_true, lb)


def test_bnb_recovers_rotation_with_certificate(rng):
    """tgt = rotated src (60 deg): the BnB must find a transform whose
    objective beats/meets the planted one, with gap >= 0 bounding the
    distance to the global optimum and the incumbent e consistent."""
    src = _cloud(rng, 96)
    axis = np.array([0.3, 1.0, -0.2], np.float32)
    r_gt = np.asarray(
        rodrigues(jnp.asarray([np.radians(60.0)], jnp.float32),
                  jnp.asarray(axis[None]))[0]
    )
    t_gt = np.array([0.1, -0.05, 0.08], np.float32)
    tgt = src @ r_gt.T + t_gt

    out = goicp_bnb_solve(
        jnp.asarray(src[None]), jnp.asarray(tgt[None]),
        trans_half=0.2, n_src=48, grid=32, frontier=1024, levels=12,
        icp_iters=8,
    )
    e = float(out["e"][0])
    gap = float(out["gap"][0])
    assert np.isfinite(e) and gap >= -1e-6
    # planted transform has objective ~0: the incumbent must reach it and
    # the certified suboptimality bound collapse to ~eps (random clouds
    # have no symmetry — ICP alone from identity fails on this instance,
    # so reaching e~0 is the BnB exploration working, ~4 s on 1 CPU)
    assert e <= 1e-5, e
    assert gap <= 5e-4, gap
    r_est = np.asarray(out["transform"][0, :3, :3])
    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(r_est.T @ r_gt) - 1) / 2, -1, 1))
    )
    assert rot_err < 2.0, rot_err


def test_bnb_certificate_fields_shapes(rng):
    src = jnp.asarray(np.stack([_cloud(rng, 40), _cloud(rng, 40)]))
    tgt = jnp.asarray(np.stack([_cloud(rng, 40), _cloud(rng, 40)]))
    out = goicp_bnb_solve(src, tgt, trans_half=0.1, n_src=16, grid=16,
                          frontier=64, levels=4, icp_iters=2)
    assert out["transform"].shape == (2, 4, 4)
    assert out["certified"].shape == (2,)
    assert out["n_active"].shape == (2,)
    assert bool(jnp.all(out["gap"] >= -1e-6))
    # lb trace is monotone non-decreasing per pair (shrinking cubes)
    tr = np.asarray(out["lb_trace"])  # (levels, B)
    finite = np.isfinite(tr)
    for b in range(tr.shape[1]):
        col = tr[finite[:, b], b]
        assert np.all(np.diff(col) >= -1e-5)
