"""Every shipped config must run end-to-end (VERDICT r1 #4).

For each cfgs/*.yaml: build its dataset + trainer (or solver path), run one
train step and one val/test step on tiny synthetic shapes. This is the
CI-level guarantee that no config crashes through the CLI wiring.
"""

from __future__ import annotations

import glob
import logging
import os

import numpy as np
import pytest

from houv_tpu.train.cli import (
    build_dataset,
    houv_eval_main,
    icp_eval_main,
    make_trainer,
)
from houv_tpu.train.config import load_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "cfgs")
CFGS = sorted(glob.glob(os.path.join(CFG_DIR, "*.yaml")))

# configs whose models are compile-heavy even at tiny shapes (CPU): they run
# in the slow tier so the default suite keeps every OTHER config guarded
_SLOW = {"vrcnet_knn.yaml", "vrcnet.yaml", "ecg.yaml", "dcp.yaml",
         "deepgmr.yaml", "idam.yaml", "modelnet.yaml", "spconv.yaml",
         "alignment.yaml", "houv.yaml", "pcn.yaml", "transformer.yaml"}


def _shrink(cfg, tmp_path):
    """Tiny shapes: the point of this test is wiring, not quality."""
    cfg.batch_size = 4
    cfg.num_points = 64
    cfg.nepoch = 1
    cfg.work_dir = str(tmp_path)
    cfg.synthetic_size = 8  # cfgs may ask for reference-scale splits
    # solver budgets
    cfg.kernel = 2
    cfg.num_epochs = 3
    cfg.angle_passes = 1
    if cfg.nn_refresh_schedule:
        # keep the schedule shape (multi-phase) at the shrunk budget
        cfg.nn_refresh_schedule = "2:1,1:1"
    cfg.num_iters = 2
    # model sizes that must track num_points
    cfg.num_coarse = 16
    cfg.num_coarse_raw = 16
    cfg.num_fps = 32
    cfg.num_fine = 64
    cfg.num_native = 64
    cfg.feature_size = 128
    cfg.num_groups = 4
    cfg.grid_size = 12
    cfg.voxel_init_size = 16
    cfg.knn_list = (8,)
    cfg.layers = (1, 1, 1, 1)
    return cfg


@pytest.mark.parametrize(
    "cfg_path",
    [
        pytest.param(
            p,
            marks=[pytest.mark.slow]
            if os.path.basename(p) in _SLOW else [],
        )
        for p in CFGS
    ],
    ids=[os.path.basename(p) for p in CFGS],
)
def test_config_end_to_end(cfg_path, tmp_path):
    cfg = _shrink(load_config(cfg_path), tmp_path)
    log = logging.getLogger("houv_tpu")

    if cfg.model_name == "houv":
        ds = build_dataset(cfg, "val")
        assert len(ds) > 0
        metrics = houv_eval_main(cfg, log)
        assert np.isfinite(metrics["RotE"])
        # metric-name parity (train_HOUV.py:114-118): the MSE meter tracks
        # rmse_loss — identical to RMSE; geodesic variant lives under GeoE
        assert set(metrics) >= {"RotE", "transE", "MSE", "RMSE", "recall"}
        assert metrics["MSE"] == pytest.approx(metrics["RMSE"])
        return
    if cfg.model_name in ("icp", "goicp", "goicp_bnb", "fgr"):
        metrics = icp_eval_main(cfg, log)
        assert np.isfinite(metrics["RotE"])
        return

    trainer = make_trainer(cfg)
    train_ds = trainer.wrap_dataset(build_dataset(cfg, "train"))
    # one val batch is enough to prove the eval path compiles and runs
    val_ds = build_dataset(cfg, "val", index_range=(0, cfg.batch_size))
    first = train_ds.get_batch(np.arange(cfg.batch_size))
    trainer.init_state(first)
    loss = trainer.train_step(first, epoch=0, step=0)
    assert np.isfinite(float(loss))
    metrics = trainer.validate(val_ds)
    assert metrics and all(np.isfinite(v) for v in metrics.values())


def test_gan_flag_end_to_end(tmp_path):
    """cfg.use_gan routes CompletionTrainer through the cascade-GAN step."""
    cfg = _shrink(load_config(os.path.join(CFG_DIR, "pcn.yaml")), tmp_path)
    cfg.use_gan = True
    trainer = make_trainer(cfg)
    train_ds = build_dataset(cfg, "train")
    first = train_ds.get_batch(np.arange(cfg.batch_size))
    trainer.init_state(first)
    assert "d_params" in trainer.state
    loss = trainer.train_step(first, epoch=0, step=0)
    assert np.isfinite(float(loss))


def test_houv_eval_with_rescore_ckpt(tmp_path):
    """cfg.rescore_ckpt routes houv_eval_main through the classifier-
    rescored solver (make_rescorer + houv_solve_rescored) end to end."""
    import jax

    from houv_tpu.models import get_model
    from houv_tpu.train.checkpoint import save_checkpoint

    cfg = _shrink(load_config("cfgs/houv.yaml"), tmp_path)
    cfg.synthetic_size = 4
    cfg.batch_size = 4
    # checkpoint shaped exactly like make_rescorer's model construction
    model = get_model("alignment_spconv", grid_size=cfg.grid_size,
                      compute_dtype="bfloat16")
    x = jax.numpy.zeros((2, cfg.num_points, 3), jax.numpy.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, False)
    ckpt = str(tmp_path / "best_acc_network.ckpt")
    save_checkpoint(ckpt, {"params": variables["params"],
                           "batch_stats": variables.get("batch_stats", {})})
    cfg.rescore_ckpt = ckpt
    cfg.rescore_cands = 2

    log = logging.getLogger("houv_tpu")
    metrics = houv_eval_main(cfg, log)
    assert np.isfinite(metrics["RotE"])


def test_houv_eval_batch_larger_than_split(tmp_path):
    """Reference default batch_size=100 over a smaller val split must
    still evaluate (regression: zero eval iterations, r4)."""
    cfg = _shrink(load_config("cfgs/houv.yaml"), tmp_path)
    cfg.synthetic_size = 12  # > the 8-device CPU mesh, < batch_size
    cfg.batch_size = 100
    log = logging.getLogger("houv_tpu")
    metrics = houv_eval_main(cfg, log)
    assert np.isfinite(metrics["RotE"]) and metrics["RotE"] >= 0
    # the meters actually saw pairs (tiny budget -> nonzero errors)
    assert metrics["RotE"] > 0
