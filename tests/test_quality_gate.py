"""Solver quality gate on an MVP-statistics fixture (VERDICT r1 #6).

The fixture uses the structured (panel/bar, chair-backbone) generator at
MVP cloud scale with the reference's rot_level mix (half <=45°, half
45-90°) and two overlap levels. Full-budget numbers on the real chip are
recorded in BENCH_NOTES.md (scripts/quality_gate.py); this CPU gate runs a
reduced budget with calibrated bounds — it FAILS on solver-math or
retry-semantics regressions (not merely "better than random").

Calibration (CPU, seed 11, kernel=16, steps=200, 384 pts, 8 pairs):
median rot 4.7°, 6/8 pairs < 10°, trans median 0.041, 4 retries fired.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.solvers import HOUVConfig
from houv_tpu.solvers.houv import evaluate_solution, houv_solve


def test_fixture_matches_mvp_statistics():
    data = synthesize_registration_pairs(
        16, n_points=256, max_angle_deg=90.0, seed=11,
        shape_mode="structured", rot_mix=True,
    )
    # rot_level mix: half the pairs above 45°
    rl = data["rot_level"]
    assert rl.sum() == 8
    r = data["transforms"][:, :3, :3]
    tr = np.trace(r, axis1=1, axis2=2)
    angles = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
    assert (angles[rl == 0] <= 45.0 + 1e-3).all()
    assert (angles[rl == 1] > 45.0 - 1e-3).all()
    # MVP cloud scale: roughly the unit cube
    assert 0.8 < np.abs(data["src"]).max() <= 1.01
    # overlap: canonical-frame views of one shape share points
    from houv_tpu.metrics.cd import calc_cd

    cd_p, _ = calc_cd(jnp.asarray(data["src"]), jnp.asarray(data["tgt"]))
    assert float(jnp.median(cd_p)) < 0.35  # same object, partial overlap


@pytest.mark.slow
def test_solver_quality_on_mvp_statistics_fixture():
    """Median rotation error at reference retry settings must stay within
    the calibrated bound; the retry passes must actually fire."""
    data = synthesize_registration_pairs(
        8, n_points=384, max_angle_deg=90.0, max_trans=0.5, seed=11,
        shape_mode="structured", rot_mix=True,
    )
    cfg = HOUVConfig(kernel=16, steps=200, angle_passes=4,
                     retry_threshold=0.030)
    out = houv_solve(
        jnp.asarray(data["rotated_src"]), jnp.asarray(data["rotated_tgt"]),
        jax.random.PRNGKey(3), cfg,
    )
    r_err, t_err = evaluate_solution(
        out["transform"], jnp.asarray(data["transforms"])
    )
    r = np.asarray(r_err)
    t = np.asarray(t_err)
    assert np.median(r) < 10.0, r
    assert (r < 10.0).sum() >= 5, r
    assert np.median(t) < 0.08, t
    assert int(out["n_retry"]) >= 1  # >45° pairs must trip the threshold
