"""Data layer tests: fixtures, h5 round-trip, dataset semantics, sharding."""

import numpy as np

from houv_tpu.data import (
    MVPCompletionDataset,
    MVPRegistrationDataset,
    batch_iterator,
    load_h5,
    shard_ranges,
    synthesize_completion_set,
    synthesize_registration_pairs,
    write_mvp_cp_fixture,
    write_mvp_rg_fixture,
)


def test_registration_fixture_consistency(tmp_path):
    path = str(tmp_path / "rg.h5")
    data = write_mvp_rg_fixture(path, n_pairs=6, n_points=64)
    loaded = load_h5(path)
    np.testing.assert_array_equal(loaded["rotated_src"], data["rotated_src"])
    # The stored transform must map rotated_src into rotated_tgt's frame:
    # both clouds are views of the same shape, so every transformed src point
    # must have a near neighbor in tgt (up to partial-overlap outliers).
    t = data["transforms"][0]
    moved = data["rotated_src"][0] @ t[:3, :3].T + t[:3, 3]
    d = np.linalg.norm(moved[:, None] - data["rotated_tgt"][0][None], axis=-1)
    nn = d.min(1)
    # 64-point clouds in a ~unit volume: NN spacing is ~0.1, so just require
    # that the aligned cloud sits inside the target rather than far away.
    assert np.median(nn) < 0.2
    random_nn = np.linalg.norm(
        data["rotated_src"][0][:, None] - data["rotated_tgt"][0][None], axis=-1
    ).min(1)
    assert np.median(nn) < np.median(random_nn)


def test_reference_schema_fixture_and_validator(tmp_path):
    """The fixture writer emits the full reference MVP_RG schema —
    ragged match_id GROUP, pose_src/pose_tgt — and scripts/prepare_mvp.py
    validates it (VERDICT r3 next-round #5)."""
    import importlib.util

    path = str(tmp_path / "MVP_Test_RG.h5")
    data = write_mvp_rg_fixture(path, n_pairs=6, n_points=64)
    # pose algebra: rotated_src = src @ pose_srcᵀ, pose_tgt = T @ pose_src
    rs = np.einsum(
        "bij,bnj->bni", data["pose_src"][:, :3, :3], data["src"]
    ) + data["pose_src"][:, None, :3, 3]
    np.testing.assert_allclose(rs, data["rotated_src"], atol=1e-5)
    np.testing.assert_allclose(
        data["transforms"] @ data["pose_src"], data["pose_tgt"], atol=1e-5
    )
    loaded = load_h5(path)
    assert isinstance(loaded["match_id"], list)
    np.testing.assert_array_equal(loaded["match_id"][2], data["match_id"][2])

    spec = importlib.util.spec_from_file_location(
        "prepare_mvp", "scripts/prepare_mvp.py"
    )
    prep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(prep)
    assert prep.check_file(path, "MVP_Test_RG.h5", strict=False) == []
    # strict mode flags the non-2048 point count
    assert any("2048" in p
               for p in prep.check_file(path, "MVP_Test_RG.h5"))
    # a missing ragged group is detected
    import h5py
    with h5py.File(path, "a") as f:
        del f["match_id"]
    assert any("match_id" in p
               for p in prep.check_file(path, "MVP_Test_RG.h5",
                                        strict=False))


def test_registration_dataset_splits(tmp_path):
    path = str(tmp_path / "rg.h5")
    write_mvp_rg_fixture(path, n_pairs=8, n_points=64)
    val = MVPRegistrationDataset("val", path=path)
    assert len(val) == 8
    b = val.get_batch(np.arange(4))
    assert b["src"].shape == (4, 64, 3)
    assert b["transform"].shape == (4, 4, 4)

    train = MVPRegistrationDataset("train", path=path)
    rng = np.random.default_rng(0)
    tb = train.get_batch(np.arange(4), rng=rng)
    # train synthesizes fresh poses: transform is a valid rigid pose
    r = tb["transform"][:, :3, :3]
    np.testing.assert_allclose(
        r @ np.swapaxes(r, 1, 2),
        np.broadcast_to(np.eye(3, dtype=np.float32), (4, 3, 3)),
        atol=1e-5,
    )

    test = MVPRegistrationDataset("test", path=path, index_range=(2, 6))
    assert len(test) == 4


def test_completion_dataset_gt_mapping(tmp_path):
    path = str(tmp_path / "cp.h5")
    write_mvp_cp_fixture(path, n_models=3, views=4, n_points=64)
    ds = MVPCompletionDataset("train", path=path, views_per_model=4,
                              scale_aug=False)
    assert len(ds) == 12
    b = ds.get_batch(np.array([0, 3, 4, 11]))
    # index//views maps to the right complete model
    np.testing.assert_array_equal(b["gt"][0], b["gt"][1])  # views 0,3 -> model 0
    np.testing.assert_array_equal(b["gt"][2], ds.complete[1])
    np.testing.assert_array_equal(b["gt"][3], ds.complete[2])


def test_completion_scale_aug(tmp_path):
    path = str(tmp_path / "cp.h5")
    write_mvp_cp_fixture(path, n_models=2, views=4, n_points=64)
    ds = MVPCompletionDataset("train", path=path, views_per_model=4)
    rng = np.random.default_rng(5)
    b = ds.get_batch(np.arange(8), rng=rng)
    ratios = b["partial"][:, 0, 0] / ds.partial[:8, 0, 0]
    assert np.all((ratios > 0.79) & (ratios < 1.21))
    # partial and gt share the same alpha
    g_ratios = b["gt"][:, 0, 0] / np.repeat(ds.complete[:2, 0, 0], 4)
    np.testing.assert_allclose(ratios, g_ratios, rtol=1e-5)


def test_shard_ranges():
    assert shard_ranges(2000, 4) == [(0, 500), (500, 1000), (1000, 1500), (1500, 2000)]
    ranges = shard_ranges(10, 3)
    assert ranges == [(0, 4), (4, 7), (7, 10)]
    assert sum(r - l for l, r in ranges) == 10


def test_batch_iterator_padding():
    data = synthesize_completion_set(1, views_per_model=5, n_partial=32,
                                     n_complete=32)
    ds = MVPCompletionDataset("train", data=data, views_per_model=5,
                              scale_aug=False)
    batches = list(batch_iterator(ds, 4, pad_last=True, seed=0))
    assert len(batches) == 2
    assert batches[1]["partial"].shape == (4, 32, 3)
    assert int(batches[1]["valid"]) == 1


def test_synthetic_partial_views_overlap():
    data = synthesize_registration_pairs(3, n_points=256, seed=3)
    # src and tgt in canonical frame are views of the same shape: the
    # overlapping region (lower quantile of NN distances) must be tight,
    # even though opposite-view regions can be far apart.
    for i in range(3):
        d = np.linalg.norm(
            data["src"][i][:, None] - data["tgt"][i][None], axis=-1
        ).min(1)
        assert np.quantile(d, 0.25) < 0.05
        # and pairs must be more similar than mismatched clouds
        dx = np.linalg.norm(
            data["src"][i][:, None] - data["tgt"][(i + 1) % 3][None], axis=-1
        ).min(1)
        assert np.median(d) < np.median(dx)


def test_voxel_point_features(rng):
    """MVP_CP_voxel_point / Voxel point_to_voxel format (reference
    completion/dataset.py:147-311): feats = [1, xyz - voxel_center, xyz]."""
    from houv_tpu.data import MVPCompletionDataset, synthesize_completion_set

    data = synthesize_completion_set(2, views_per_model=4, n_partial=64,
                                     n_complete=64, seed=3)
    ds = MVPCompletionDataset("train", data=data, views_per_model=4,
                              grid_size=20, scale_aug=False)
    batch = ds.get_batch(np.arange(4))
    grid_ind, feats = ds.voxel_point_features(batch["partial"])
    assert grid_ind.shape == (4, 64, 3) and feats.shape == (4, 64, 7)
    assert grid_ind.min() >= 0 and grid_ind.max() < 20
    np.testing.assert_allclose(feats[..., 0], 1.0)
    np.testing.assert_allclose(feats[..., 4:], batch["partial"], atol=1e-6)
    # relative offsets are bounded by half a voxel diagonal
    interval = 1.0 / 19
    assert np.abs(feats[..., 1:4]).max() <= interval * 0.5 + 1e-5
