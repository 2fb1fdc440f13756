"""Native C++ prefetching loader tests: build, semantics vs the numpy
reference pose synthesis, voxelization parity, throughput sanity."""

import numpy as np
import pytest

from houv_tpu.data.native_loader import (
    NativeRegistrationLoader,
    build_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


def _data(rng, n=16, pts=64):
    src = rng.uniform(-0.4, 0.4, (n, pts, 3)).astype(np.float32)
    tgt = src + rng.normal(0, 0.01, (n, pts, 3)).astype(np.float32)
    return src, tgt


def test_build():
    assert build_native() is not None


def test_batches_are_valid_poses(rng):
    src, tgt = _data(rng)
    with NativeRegistrationLoader(src, tgt, batch_size=8, max_angle_deg=30.0,
                                  seed=7, n_threads=2) as loader:
        for _ in range(3):
            batch = loader.next_batch()
            assert batch["src"].shape == (8, 64, 3)
            r = batch["transform"][:, :3, :3]
            np.testing.assert_allclose(
                r @ np.swapaxes(r, 1, 2),
                np.broadcast_to(np.eye(3, dtype=np.float32), (8, 3, 3)),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                batch["transform"][:, 3],
                np.broadcast_to([0, 0, 0, 1], (8, 4)), atol=0,
            )
            # angle of `transform` bounded by max_angle (30°)
            tr = np.trace(r, axis1=1, axis2=2)
            ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
            assert (ang <= 30.0 + 1e-3).all()
            # |translation| of transform <= max_trans / 2
            assert (np.linalg.norm(batch["transform"][:, :3, 3], axis=1)
                    <= 0.25 + 1e-5).all()


def test_pose_semantics_relative_alignment(rng):
    """tgt_rotated must equal transform applied to src_rotated up to the
    src/tgt difference (the dataset contract HOUV relies on)."""
    src, tgt = _data(rng)
    with NativeRegistrationLoader(src, tgt, batch_size=4, max_angle_deg=45.0,
                                  seed=3, n_threads=1) as loader:
        batch = loader.next_batch()
        t = batch["transform"]
        moved = np.einsum("bij,bnj->bni", t[:, :3, :3], batch["src"]) \
            + t[:, None, :3, 3]
        # src≈tgt in canonical frame (we built them 0.01 apart), so after the
        # poses: transform·src_rotated ≈ tgt_rotated
        nn = np.linalg.norm(moved - batch["tgt"], axis=-1)
        assert np.median(nn) < 0.05


def test_voxel_coords_match_python(rng):
    from houv_tpu.ops.voxel import voxel_grid_indices
    import jax.numpy as jnp

    src, tgt = _data(rng)
    with NativeRegistrationLoader(src, tgt, batch_size=4, seed=5,
                                  n_threads=1, with_voxels=True,
                                  grid_size=50) as loader:
        batch = loader.next_batch()
        ref = np.asarray(
            voxel_grid_indices(jnp.asarray(batch["src"]), 50, -0.5, 0.5)
        )
        np.testing.assert_array_equal(batch["coords"], ref)


def test_prefetch_queue_fills(rng):
    import time

    src, tgt = _data(rng)
    with NativeRegistrationLoader(src, tgt, batch_size=4, seed=9,
                                  n_threads=2, capacity=4) as loader:
        time.sleep(0.5)
        assert loader.queue_size() >= 1  # workers prefetched ahead


def test_angle_distribution_matches_numpy(rng):
    """Rotation angles of `transform` follow U(0, max_angle) like the
    reference's random_rotation (KS-style coarse check on quartiles)."""
    src, tgt = _data(rng, n=8, pts=32)
    angles = []
    with NativeRegistrationLoader(src, tgt, batch_size=64, max_angle_deg=60.0,
                                  seed=11, n_threads=2) as loader:
        for _ in range(8):
            r = loader.next_batch()["transform"][:, :3, :3]
            tr = np.trace(r, axis1=1, axis2=2)
            angles.append(np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1))))
    angles = np.concatenate(angles)
    assert abs(np.median(angles) - 30.0) < 5.0
    assert abs(np.quantile(angles, 0.25) - 15.0) < 5.0


@pytest.mark.slow
def test_fit_steps_with_native_loader(rng, tmp_path):
    """End-to-end: native loader feeding the DeepGMR trainer."""
    from houv_tpu.train import Config
    from houv_tpu.train.harness import RegistrationTrainer

    src, tgt = _data(rng, n=12, pts=48)
    cfg = Config(model_name="deepgmr", dataset="mvp_rg", num_points=48,
                 batch_size=4, lr=1e-4, rri_size=6, work_dir=str(tmp_path),
                 step_interval_to_print=1000)
    trainer = RegistrationTrainer(cfg)
    with NativeRegistrationLoader(src, tgt, batch_size=4, seed=1,
                                  n_threads=2) as loader:
        state = trainer.fit_steps(loader, n_steps=3)
    assert state is not None
