"""Tests for the long-tail inventory components: PointNet++ modules,
samplers, box ops, PAConv score, masked CD, dataset extras, shard combine."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from houv_tpu.metrics import calc_cd, calc_cd_percent_len
from houv_tpu.models.pointnet2 import (
    PointFPModule,
    PointSAModule,
    points_sampler,
)
from houv_tpu.ops.boxes import (
    assign_score_withk,
    boxes_iou_bev,
    nms_bev,
    points_in_boxes,
)


def test_points_sampler_strategies(rng):
    pts = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    for strategy in ("d-fps", "f-fps"):
        idx = points_sampler(pts, 16, strategy)
        assert idx.shape == (2, 16)
        for b in range(2):
            assert len(set(np.asarray(idx)[b].tolist())) == 16
    idx = points_sampler(pts, 16, "random", key=jax.random.PRNGKey(0))
    assert idx.shape == (2, 16)
    with pytest.raises(ValueError):
        points_sampler(pts, 16, "nope")


def test_point_sa_fp_modules(rng):
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
    sa = PointSAModule(npoint=16, radii=(0.5, None), nsamples=(8, 8),
                       mlps=((16, 32), (16, 32)))
    params = sa.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, new_feats = sa.apply(params, xyz, feats)
    assert new_xyz.shape == (2, 16, 3)
    assert new_feats.shape == (2, 16, 64)  # 32 + 32 multi-scale concat

    fp = PointFPModule(mlp=(32,))
    p2 = fp.init(jax.random.PRNGKey(1), xyz, new_xyz, feats, new_feats)
    up = fp.apply(p2, xyz, new_xyz, feats, new_feats)
    assert up.shape == (2, 64, 32)


def test_boxes_iou_identity_and_disjoint():
    boxes = jnp.asarray(
        [[0, 0, 0, 2, 2, 2, 0.0], [10, 10, 0, 2, 2, 2, 0.3]], jnp.float32
    )
    iou = np.asarray(boxes_iou_bev(boxes, boxes))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=0.05)
    assert iou[0, 1] < 1e-3
    # axis-aligned half-overlap: boxes shifted by half a width
    pair = jnp.asarray(
        [[0, 0, 0, 2, 2, 2, 0.0], [1, 0, 0, 2, 2, 2, 0.0]], jnp.float32
    )
    iou = float(boxes_iou_bev(pair, pair)[0, 1])
    assert abs(iou - 1.0 / 3.0) < 0.05  # overlap 2, union 6


def test_nms_bev_suppresses():
    boxes = jnp.asarray(
        [
            [0, 0, 0, 2, 2, 2, 0.0],
            [0.1, 0, 0, 2, 2, 2, 0.0],   # duplicate of 0
            [10, 0, 0, 2, 2, 2, 0.0],
        ],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, mask = nms_bev(boxes, scores, iou_threshold=0.5, max_out=3)
    kept = np.asarray(keep)[np.asarray(mask)]
    assert set(kept.tolist()) == {0, 2}


def test_points_in_boxes():
    boxes = jnp.asarray([[[0, 0, 0, 2, 2, 2, 0.0],
                          [5, 5, 5, 1, 1, 1, 0.0]]], jnp.float32)
    pts = jnp.asarray([[[0.1, 0.1, 0.1], [5.0, 5.0, 5.2], [9, 9, 9]]],
                      jnp.float32)
    idx = np.asarray(points_in_boxes(pts, boxes))
    np.testing.assert_array_equal(idx[0], [0, 1, -1])


def test_assign_score_withk_golden(rng):
    b, n, k, m, c = 1, 4, 2, 3, 5
    scores = jnp.asarray(rng.standard_normal((b, n, k, m)).astype(np.float32))
    pf = jnp.asarray(rng.standard_normal((b, n, m, c)).astype(np.float32))
    cf = jnp.asarray(rng.standard_normal((b, n, m, c)).astype(np.float32))
    knn_idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    out = np.asarray(assign_score_withk(scores, pf, cf, knn_idx))
    ref = np.zeros((b, n, k, c), np.float32)
    for i in range(n):
        for j in range(k):
            nb = np.asarray(pf)[0, np.asarray(knn_idx)[0, i, j]]
            diff = nb - np.asarray(cf)[0, i]
            ref[0, i, j] = np.asarray(scores)[0, i, j] @ diff
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_calc_cd_percent_len_masks(rng):
    out = rng.standard_normal((2, 32, 3)).astype(np.float32)
    gt = out.copy()
    out_bad = out.copy()
    out_bad[:, -8:] += 100.0  # poison last 8 points
    mask = np.ones((2, 32), np.float32)
    mask[:, -8:] = 0
    # masked: poisoned points excluded from the output side
    _, cd_t_masked = calc_cd_percent_len(
        jnp.asarray(out_bad), jnp.asarray(gt), mask_output=jnp.asarray(mask),
        mask_gt=None,
    )
    _, cd_t_full = calc_cd(jnp.asarray(out_bad), jnp.asarray(gt))
    assert float(cd_t_masked.mean()) < float(cd_t_full.mean())


def test_registration_voxel_fields(rng):
    from houv_tpu.data import MVPRegistrationDataset, synthesize_registration_pairs

    data = synthesize_registration_pairs(4, n_points=64, seed=3)
    ds = MVPRegistrationDataset("val", data=data, with_voxels=True)
    b = ds.get_batch(np.arange(4))
    assert b["voxel_src"].shape == (4, 64, 3)
    assert (b["voxel_src_count"] > 0).all()
    assert b["angle"].shape == (4,)
    assert set(np.unique(b["add_ps"])) <= {0, 1}


def test_completion_triplets(rng):
    from houv_tpu.data import MVPCompletionDataset, synthesize_completion_set

    data = synthesize_completion_set(3, views_per_model=4, n_partial=32,
                                     n_complete=32)
    ds = MVPCompletionDataset("train", data=data, views_per_model=4)
    t = ds.get_triplet_batch(np.arange(6), rng=rng)
    assert t["anchor"].shape == (6, 32, 3)
    # positive is a different view of the same model; negative a different model
    for i in range(6):
        assert not np.array_equal(t["anchor"][i], t["positive"][i])


def test_cli_combine_idempotent(tmp_path, rng):
    """Shard, delete one, --combine must re-solve the gap and merge."""
    import h5py

    from houv_tpu.train.cli import test_main

    cfg = {
        "model_name": "houv", "dataset": "mvp_rg", "num_points": 48,
        "kernel": 4, "num_epochs": 5, "angle_passes": 1,
        "work_dir": str(tmp_path), "batch_size": 16,
    }
    cfg_path = str(tmp_path / "houv.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    # solve two of three shards (64 synthetic test pairs)
    test_main(["-c", cfg_path, "-l", "0", "-r", "24"])
    test_main(["-c", cfg_path, "-l", "48", "-r", "64"])
    out = test_main(["-c", cfg_path, "--combine", "1"])
    with h5py.File(out) as f:
        res = f["results"][()]
    assert res.shape == (64, 4, 4)
    assert os.path.exists(str(tmp_path / "houv" / "manifest.json"))
    # the re-solved middle shard must exist now
    assert os.path.exists(str(tmp_path / "houv" / "results_24_48.h5"))


def test_exact_rotated_iou_golden_cases():
    """Polygon-clipping IoU against analytically known overlaps
    (iou3d_kernel.cu exact semantics, not the sampling estimate)."""
    from houv_tpu.ops import boxes_iou_bev, boxes_overlap_bev

    def box(cx, cy, dx, dy, yaw):
        return [cx, cy, 0.0, dx, dy, 1.0, yaw]

    boxes_a = jnp.asarray([
        box(0, 0, 2, 2, 0.0),
        box(0, 0, 2, 2, 0.0),
        box(0, 0, 2, 2, 0.0),
        box(0, 0, 2, 2, np.pi / 4),
    ], jnp.float32)
    boxes_b = jnp.asarray([
        box(0, 0, 2, 2, 0.0),       # identical -> IoU 1
        box(1, 0, 2, 2, 0.0),       # half-shifted -> inter 2, union 6
        box(5, 5, 2, 2, 0.0),       # disjoint -> 0
        box(0, 0, 2, 2, 0.0),       # 45° square-on-square: inter = 8(√2-1)
    ], jnp.float32)
    ov = np.asarray(boxes_overlap_bev(boxes_a, boxes_b))
    np.testing.assert_allclose(ov[0, 0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(ov[1, 1], 2.0, rtol=1e-5)
    np.testing.assert_allclose(ov[2, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(ov[3, 3], 8 * (np.sqrt(2) - 1), rtol=1e-4)
    iou = np.asarray(boxes_iou_bev(boxes_a, boxes_b))
    np.testing.assert_allclose(iou[0, 0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(iou[1, 1], 2.0 / 6.0, rtol=1e-5)


def test_exact_iou_matches_sampling_estimate(rng):
    from houv_tpu.ops import boxes_iou_bev, boxes_iou_bev_sampled

    n = 12
    boxes = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), np.zeros(n),
        rng.uniform(0.5, 3, n), rng.uniform(0.5, 3, n), np.ones(n),
        rng.uniform(0, np.pi, n),
    ], axis=1).astype(np.float32)
    exact = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    approx = np.asarray(boxes_iou_bev_sampled(jnp.asarray(boxes),
                                              jnp.asarray(boxes), 48))
    np.testing.assert_allclose(exact, approx, atol=0.05)
    np.testing.assert_allclose(np.diag(exact), 1.0, rtol=1e-5)


def test_sigmoid_focal_loss_reduces_to_bce_at_gamma0():
    """gamma=0, alpha=0.5 -> 0.5 * BCE-with-logits (sanity anchor)."""
    from houv_tpu.ops import sigmoid_focal_loss

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    targets = jnp.asarray((rng.random((8, 4)) > 0.5).astype(np.float32))
    fl = sigmoid_focal_loss(logits, targets, gamma=0.0, alpha=0.5,
                            reduction="none")
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    t = np.asarray(targets)
    bce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    np.testing.assert_allclose(np.asarray(fl), 0.5 * bce, rtol=1e-4)
    # easy examples are down-weighted at gamma 2
    fl2 = sigmoid_focal_loss(logits, targets, gamma=2.0, reduction="none")
    hard = np.asarray(fl2)[bce > 1.0].mean()
    easy = np.asarray(fl2)[bce < 0.3].mean()
    assert easy < hard


def test_roi_align_constant_and_gradient_fields():
    from houv_tpu.ops import roi_align

    # constant feature map -> every bin equals the constant
    feat = jnp.full((1, 2, 16, 16), 3.0)
    rois = jnp.asarray([[0, 2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feat, rois, output_size=4)
    assert out.shape == (1, 2, 4, 4)
    np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-6)
    # linear-in-x field -> bins increase monotonically along x
    xs = jnp.broadcast_to(jnp.arange(16.0), (16, 16))
    feat = xs[None, None]
    out = np.asarray(roi_align(feat, rois, output_size=4))[0, 0]
    assert (np.diff(out, axis=1) > 0).all()
    assert np.allclose(np.diff(out, axis=1), np.diff(out, axis=1)[0, 0],
                       atol=1e-4)
