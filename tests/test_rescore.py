"""Classifier-rescored restart selection (solvers/rescore.py).

CPU tests: candidate extraction (loss order + rotation NMS + window
masking), the pick rule, oracle-scored end-to-end recovery of an impostor
pair, and the degenerate margin=inf parity with the loss-selected chunked
driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from houv_tpu.geometry import rodrigues
from houv_tpu.solvers import HOUVConfig
from houv_tpu.solvers.houv import evaluate_solution, houv_solve_chunked
from houv_tpu.solvers.rescore import (
    apply_candidates,
    extract_candidates,
    houv_solve_rescored,
    make_classifier_scorer,
    make_oracle_scorer,
    oracle_logits,
    rescore_pick,
)


def _rot_z(deg):
    a = np.radians(deg)
    return np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
        np.float32,
    )


def test_extract_candidates_diverse():
    """Candidates come out in ascending loss order, skipping restarts
    within angle_deg of an earlier pick."""
    # 5 restarts: two near-identical best-loss rotations (5° apart), one
    # far rotation at mid loss, one masked (+inf), one far at worst loss
    rots = np.stack([
        _rot_z(0), _rot_z(5), _rot_z(90), _rot_z(45), _rot_z(180),
    ])[None]                                            # (1, 5, 3, 3)
    loss = np.array([[0.01, 0.012, 0.02, np.inf, 0.05]], np.float32)
    ts = np.zeros((1, 5, 3), np.float32)
    cl, cr, ct = extract_candidates(
        jnp.asarray(loss), jnp.asarray(rots), jnp.asarray(ts),
        n_cand=3, angle_deg=10.0,
    )
    cl = np.asarray(cl)
    # pick 0: loss 0.01 (rot 0°); 5°-rotation excluded by NMS;
    # pick 1: loss 0.02 (rot 90°); pick 2: loss 0.05 (rot 180°) — the
    # masked +inf slot is never picked
    assert np.allclose(cl[0], [0.01, 0.02, 0.05])
    tr = np.trace(np.asarray(cr)[0, 0])
    assert tr == pytest.approx(3.0, abs=1e-5)          # identity first


def test_extract_candidates_duplicates_when_pool_small():
    """Fewer diverse restarts than n_cand -> tail repeats the best pick."""
    rots = np.stack([_rot_z(0), _rot_z(2)])[None]
    loss = np.array([[0.01, 0.02]], np.float32)
    ts = np.zeros((1, 2, 3), np.float32)
    cl, _, _ = extract_candidates(
        jnp.asarray(loss), jnp.asarray(rots), jnp.asarray(ts),
        n_cand=4, angle_deg=10.0,
    )
    assert np.allclose(np.asarray(cl)[0], [0.01, 0.01, 0.01, 0.01])


def test_rescore_pick_margin():
    loss = jnp.asarray([[0.01, 0.02], [0.01, 0.02], [0.01, 0.02]])
    logits = jnp.asarray([[0.0, 3.0], [0.0, -1.0], [0.0, 0.5]])
    # margin 0: challenger wins when strictly better
    pick = np.asarray(rescore_pick(loss, logits, margin=0.0))
    assert pick.tolist() == [1, 0, 1]
    # margin 1: the 0.5-logit challenger no longer clears the bar
    pick = np.asarray(rescore_pick(loss, logits, margin=1.0))
    assert pick.tolist() == [1, 0, 0]
    # margin inf: always the loss choice (reference semantics)
    pick = np.asarray(rescore_pick(loss, logits, margin=float("inf")))
    assert pick.tolist() == [0, 0, 0]


def _impostor_problem(rng, n=96):
    """A z-mirror-symmetric box cloud: the truncated CD at the flipped
    pose ties (or beats) the true pose, so loss-selection is ambiguous
    but rotation-to-GT is not."""
    half = rng.uniform(-0.5, 0.5, (n // 2, 3)).astype(np.float32)
    half[:, 2] = np.abs(half[:, 2]) + 0.05
    cloud = np.concatenate([half, half * np.array([1, 1, -1], np.float32)])
    src = cloud[None]
    r = _rot_z(30.0)[None]
    tgt = np.einsum("bij,bnj->bni", r, src).astype(np.float32)
    pose = np.zeros((1, 4, 4), np.float32)
    pose[:, :3, :3] = r
    pose[:, 3, 3] = 1
    return src, tgt, pose


def test_oracle_rescore_end_to_end(rng):
    """With the oracle scorer, the rescored driver must do at least as well
    as loss selection on a symmetric-object pair, and its n_override /
    cand_logits diagnostics must be consistent."""
    src, tgt, pose = _impostor_problem(rng)
    cfg = HOUVConfig(kernel=16, steps=200, angle_passes=2,
                     use_pallas=False)
    key = jax.random.PRNGKey(3)
    base = houv_solve_chunked(jnp.asarray(src), jnp.asarray(tgt), key, cfg)
    out = houv_solve_rescored(
        jnp.asarray(src), jnp.asarray(tgt), key, cfg,
        make_oracle_scorer(pose), n_cand=6, angle_deg=10.0,
    )
    r_base, _ = evaluate_solution(base["transform"], jnp.asarray(pose))
    r_resc, _ = evaluate_solution(out["transform"], jnp.asarray(pose))
    assert float(r_resc[0]) <= float(r_base[0]) + 1e-3
    # the oracle logit of the picked candidate is the best in the list
    logits = np.asarray(out["cand_logits"])
    assert int(out["pick"][0]) == int(np.argmax(logits[0]))


def test_margin_inf_matches_chunked(rng):
    """margin=inf -> candidate 0 (the loss argmin) always wins, matching
    houv_solve_chunked's transform exactly."""
    src, tgt, pose = _impostor_problem(rng)
    cfg = HOUVConfig(kernel=16, steps=150, angle_passes=2,
                     use_pallas=False)
    key = jax.random.PRNGKey(5)
    base = houv_solve_chunked(jnp.asarray(src), jnp.asarray(tgt), key, cfg)
    out = houv_solve_rescored(
        jnp.asarray(src), jnp.asarray(tgt), key, cfg,
        make_oracle_scorer(pose), n_cand=4, margin=float("inf"),
    )
    assert int(out["n_override"]) == 0
    np.testing.assert_allclose(
        np.asarray(out["transform"]), np.asarray(base["transform"]),
        atol=1e-5,
    )


def test_classifier_scorer_shapes(rng):
    """make_classifier_scorer: micro-batched apply returns (B, C) and
    matches a direct apply."""
    from houv_tpu.models.alignment import AlignmentClassifier

    model = AlignmentClassifier(grid_size=12, init_size=4)
    src = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 64, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), src, tgt, False)
    cand_r = jnp.broadcast_to(jnp.eye(3), (2, 3, 3, 3))
    cand_t = jnp.zeros((2, 3, 3))
    moved = apply_candidates(src, cand_r, cand_t)
    scorer = make_classifier_scorer(model, variables, micro_batch=4)
    logits = scorer(moved, tgt, cand_r, cand_t)
    assert logits.shape == (2, 3)
    direct = model.apply(
        variables, moved.reshape(6, 64, 3), jnp.repeat(tgt, 3, axis=0),
        False,
    ).reshape(2, 3)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(direct), rtol=2e-5, atol=2e-5)


def test_classifier_checkpoint_gate_seam(rng, tmp_path):
    """The exact scripts/rescore_gate.py classifier branch: trainer-shaped
    checkpoint -> load_checkpoint (no template) -> variables dict ->
    make_classifier_scorer -> houv_solve_rescored. Guards the round-4
    chip measurement's only previously-unexecuted code path."""
    from houv_tpu.models import get_model
    from houv_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    src, tgt, pose = _impostor_problem(rng)
    model = get_model("alignment_spconv", grid_size=12, init_size=4)
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(tgt), False)
    state = {"params": init_vars["params"],
             "batch_stats": init_vars.get("batch_stats", {})}
    ckpt = str(tmp_path / "best_acc_network.ckpt")
    save_checkpoint(ckpt, state)

    loaded = load_checkpoint(ckpt)
    variables = {"params": loaded["params"]}
    if loaded.get("batch_stats"):
        variables["batch_stats"] = loaded["batch_stats"]
    scorer = make_classifier_scorer(model, variables, micro_batch=4)

    cfg = HOUVConfig(kernel=8, steps=60, angle_passes=2, use_pallas=False)
    out = houv_solve_rescored(
        jnp.asarray(src), jnp.asarray(tgt), jax.random.PRNGKey(7), cfg,
        scorer, n_cand=3, angle_deg=10.0,
    )
    logits = np.asarray(out["cand_logits"])
    assert logits.shape == (1, 3) and np.isfinite(logits).all()
    assert out["transform"].shape == (1, 4, 4)
    # untrained logits are candidate-independent only by accident; the
    # pick must still be a valid candidate index
    assert 0 <= int(out["pick"][0]) < 3


def test_oracle_logits():
    gt = np.zeros((1, 4, 4), np.float32)
    gt[:, :3, :3] = _rot_z(30)
    gt[:, 3, 3] = 1
    cand_r = np.stack([_rot_z(30), _rot_z(90)])[None]
    lg = np.asarray(oracle_logits(jnp.asarray(cand_r), jnp.asarray(gt)))
    assert lg[0, 0] == pytest.approx(0.0, abs=1e-3)
    assert lg[0, 1] == pytest.approx(-60.0, abs=1e-3)


def test_pool_candidate_dataset_balance_and_batches():
    """PoolCandidateDataset oversamples positives to ~1:1 and yields
    classifier-shaped batches; AlignmentTrainer.wrap_dataset passes it
    through untouched."""
    import numpy as np

    from houv_tpu.train.aux import AlignedPairView, PoolCandidateDataset

    n = 40
    rows = {
        "src_moved": np.random.default_rng(0).normal(
            size=(n, 32, 3)).astype(np.float32),
        "tgt": np.zeros((n, 32, 3), np.float32),
        "lbl": (np.arange(n) % 8 == 0).astype(np.float32),  # 1:7
    }
    ds = PoolCandidateDataset(rows, balance=True, seed=1)
    assert isinstance(ds, AlignedPairView)
    all_lbl = np.concatenate([
        ds.get_batch(np.arange(s, min(s + 16, len(ds))))["lbl"]
        for s in range(0, len(ds), 16)
    ])
    assert 0.35 < all_lbl.mean() < 0.65
    b = ds.get_batch(np.arange(16))
    assert b["src_moved"].shape == (16, 32, 3)
    assert b["tgt"].shape == (16, 32, 3)

    raw = PoolCandidateDataset(rows, balance=False)
    assert len(raw) == n


def test_classifier_scorer_tta_shapes(rng):
    """n_aug>1 averages logits over deterministic joint rotations —
    same output shape, finite values, and identity-rotation consistency
    (n_aug=1 equals the plain path)."""
    import jax
    import jax.numpy as jnp

    from houv_tpu.models import get_model
    from houv_tpu.solvers.rescore import make_classifier_scorer

    model = get_model("alignment_spconv", grid_size=12, init_size=4)
    src = jnp.asarray(rng.normal(size=(1, 3, 32, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), src[:, 0], tgt, False)
    plain = make_classifier_scorer(model, variables, micro_batch=4)
    tta = make_classifier_scorer(model, variables, micro_batch=4, n_aug=3)
    l1 = np.asarray(plain(src, tgt))
    l3 = np.asarray(tta(src, tgt))
    assert l1.shape == l3.shape == (1, 3)
    assert np.isfinite(l1).all() and np.isfinite(l3).all()


def test_classifier_scorer_loss_gap_input(rng):
    """use_gap feeds the relative CD-loss gap as the model's n_extra
    side input; zero-init side head means an untrained gap model matches
    the plain model's logits when all gaps are zero."""
    import jax
    import jax.numpy as jnp

    from houv_tpu.models import get_model
    from houv_tpu.solvers.rescore import make_classifier_scorer

    model = get_model("alignment_spconv", grid_size=12, init_size=4,
                      n_extra=1)
    src = jnp.asarray(rng.normal(size=(1, 3, 32, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), src[:, 0], tgt, False)
    scorer = make_classifier_scorer(model, variables, micro_batch=4,
                                    use_gap=True)
    cand_loss = jnp.asarray([[0.01, 0.02, 0.05]], jnp.float32)
    logits = np.asarray(scorer(src, tgt, None, None, cand_loss=cand_loss))
    assert logits.shape == (1, 3) and np.isfinite(logits).all()
    # missing cand_loss must fail loudly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        scorer(src, tgt, None, None)
