"""Train-harness tests: schedules, config parsing, end-to-end mini-training,
checkpoint roundtrip, submission writer, CLI drivers."""

import os

import jax
import numpy as np
import pytest
import yaml

from houv_tpu.data import MVPCompletionDataset, MVPRegistrationDataset
from houv_tpu.data import synthesize_completion_set, synthesize_registration_pairs
from houv_tpu.train import (
    CompletionTrainer,
    RegistrationTrainer,
    Config,
    alpha_schedule,
    load_checkpoint,
    load_config,
    lr_schedule,
    save_checkpoint,
    write_results_h5,
    write_submission,
)


def _cp_cfg(tmp_path, **kw):
    base = dict(
        model_name="pcn", num_points=64, num_coarse=32, batch_size=4,
        nepoch=2, lr=1e-3, step_interval_to_print=1000,
        work_dir=str(tmp_path), varying_constant=(0.01, 0.1, 0.5, 1.0),
        varying_constant_epochs=(5, 15, 30),
    )
    base.update(kw)
    return Config(**base)


def _cp_data():
    data = synthesize_completion_set(2, views_per_model=8, n_partial=64,
                                     n_complete=64, seed=1)
    return MVPCompletionDataset("train", data=data, views_per_model=8,
                                scale_aug=False)


def test_alpha_schedule():
    cfg = Config(varying_constant=(0.01, 0.1, 0.5, 1.0),
                 varying_constant_epochs=(5, 15, 30))
    assert alpha_schedule(cfg, 0) == 0.01
    assert alpha_schedule(cfg, 5) == 0.1
    assert alpha_schedule(cfg, 14) == 0.1
    assert alpha_schedule(cfg, 29) == 0.5
    assert alpha_schedule(cfg, 30) == 1.0
    assert alpha_schedule(cfg, 99) == 1.0
    assert alpha_schedule(Config(varying_constant=None), 3) is None


def test_lr_schedule():
    cfg = Config(lr=1e-3, lr_decay=True, lr_decay_interval=10,
                 lr_decay_rate=0.5, lr_clip=1e-5)
    assert lr_schedule(cfg, 0) == 1e-3
    assert lr_schedule(cfg, 10) == pytest.approx(5e-4)
    assert lr_schedule(cfg, 25) == pytest.approx(2.5e-4)
    assert lr_schedule(cfg, 1000) == 1e-5  # clipped
    step = Config(lr=1e-3, lr_decay=True, lr_decay_interval=None,
                  lr_step_decay_epochs=(2, 4), lr_step_decay_rates=(0.1, 0.1))
    assert lr_schedule(step, 3) == pytest.approx(1e-4)
    assert lr_schedule(step, 5) == pytest.approx(1e-5)


def test_config_yaml_roundtrip(tmp_path):
    path = str(tmp_path / "c.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(
            {"model_name": "vrcnet", "layers": "1, 1, 1, 1",
             "knn_list": "16", "betas": "0.9, 0.999",
             "varying_constant": "0.01, 0.1, 0.5, 1",
             "varying_constant_epochs": "5, 15, 30",
             "lr": 0.0001, "unknown_key": 42},
            f,
        )
    cfg = load_config(path)
    assert cfg.layers == (1, 1, 1, 1)
    assert cfg.knn_list == (16,)
    assert cfg.betas == (0.9, 0.999)
    assert cfg.extras["unknown_key"] == 42


def test_parse_refresh_schedule():
    from houv_tpu.train.config import parse_refresh_schedule

    assert parse_refresh_schedule(None) is None
    assert parse_refresh_schedule("") is None
    assert parse_refresh_schedule("auto") == "auto"
    assert parse_refresh_schedule("400:5,100:2") == ((400, 5), (100, 2))
    # 3-element phases carry the FPS subsample factor (champion schedule)
    assert parse_refresh_schedule("300:5:4,150:5:2,50:2") == (
        (300, 5, 4), (150, 5, 2), (50, 2))


@pytest.mark.slow
def test_completion_training_reduces_loss(tmp_path):
    cfg = _cp_cfg(tmp_path)
    trainer = CompletionTrainer(cfg)
    ds = _cp_data()
    from houv_tpu.data.pipeline import batch_iterator

    first = next(batch_iterator(ds, cfg.batch_size, seed=0))
    trainer.init_state(first)
    losses = []
    for step in range(8):
        losses.append(float(trainer.train_step(first, epoch=0, step=step)))
    assert losses[-1] < losses[0], losses
    # validation runs and writes best checkpoints
    metrics = trainer.validate(ds, epoch=0)
    assert set(metrics) == {"cd_p", "cd_t", "f1"}
    assert os.path.exists(os.path.join(trainer.log_dir, "best_cd_p_network.ckpt"))


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cp_cfg(tmp_path)
    trainer = CompletionTrainer(cfg)
    ds = _cp_data()
    from houv_tpu.data.pipeline import batch_iterator

    first = next(batch_iterator(ds, cfg.batch_size, seed=0))
    state = trainer.init_state(first)
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, state)
    orig = jax.tree_util.tree_leaves(state["params"])
    rest = jax.tree_util.tree_leaves(restored["params"])
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_registration_trainer_smoke(tmp_path):
    cfg = Config(model_name="deepgmr", dataset="mvp_rg", num_points=64,
                 batch_size=4, nepoch=1, lr=1e-4, rri_size=6,
                 work_dir=str(tmp_path), step_interval_to_print=1000)
    data = synthesize_registration_pairs(8, n_points=64, seed=2)
    train_ds = MVPRegistrationDataset("train", data=data)
    val_ds = MVPRegistrationDataset("val", data=data)
    trainer = RegistrationTrainer(cfg)
    from houv_tpu.data.pipeline import batch_iterator

    first = next(batch_iterator(train_ds, 4, seed=0))
    trainer.init_state(first)
    loss = trainer.train_step(first, epoch=0, step=0)
    assert np.isfinite(float(loss))
    metrics = trainer.validate(val_ds, epoch=0)
    assert set(metrics) == {"RotE", "transE", "MSE", "RMSE", "recall"}


@pytest.mark.slow
def test_alignment_trainer_smoke(tmp_path):
    """AlignmentTrainer end-to-end at miniature scale — the exact
    cfgs/rescore_alignment.yaml path (config -> AlignedPairView batches ->
    BCE train step -> validate -> best_acc checkpoint) that round 4 runs
    at full size on the chip before the classifier-rescore gate."""
    from houv_tpu.train.aux import AlignmentTrainer

    cfg = Config(model_name="alignment_spconv", dataset="mvp_rg",
                 num_points=64, batch_size=2, nepoch=1, lr=1e-3,
                 grid_size=12, work_dir=str(tmp_path),
                 step_interval_to_print=1000)
    data = synthesize_registration_pairs(4, n_points=64, seed=3)
    train_ds = MVPRegistrationDataset("train", data=data)
    trainer = AlignmentTrainer(cfg)
    wrapped = trainer.wrap_dataset(train_ds)
    from houv_tpu.data.pipeline import batch_iterator

    first = next(batch_iterator(wrapped, cfg.batch_size, seed=0))
    assert first["src_moved"].shape == (2 * cfg.batch_size, 64, 3)
    assert set(np.unique(first["lbl"])) == {0.0, 1.0}
    trainer.init_state(first)
    loss = trainer.train_step(first, epoch=0, step=0)
    assert np.isfinite(float(loss))
    metrics = trainer.validate(MVPRegistrationDataset("val", data=data),
                               epoch=0)
    assert "acc" in metrics and np.isfinite(metrics["acc"])
    assert os.path.exists(
        os.path.join(trainer.log_dir, "best_acc_network.ckpt"))


def test_submission_writer(tmp_path):
    import h5py

    results = np.random.default_rng(0).standard_normal((5, 4, 4)).astype(np.float32)
    h5 = write_results_h5(str(tmp_path / "results.h5"), results)
    with h5py.File(h5) as f:
        np.testing.assert_array_equal(f["results"][()], results)
    z = write_submission(str(tmp_path / "sub.zip"), h5)
    assert os.path.exists(z)


def test_cli_houv_test_runs(tmp_path):
    """End-to-end: the submission sweep driver on a tiny synthetic set."""
    import h5py

    from houv_tpu.train.cli import test_main

    cfg = {
        "model_name": "houv", "dataset": "mvp_rg", "num_points": 64,
        "kernel": 4, "num_epochs": 10, "angle_passes": 1,
        "work_dir": str(tmp_path), "batch_size": 16,
    }
    cfg_path = str(tmp_path / "houv.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    h5_path = test_main(["-c", cfg_path])
    with h5py.File(h5_path) as f:
        res = f["results"][()]
    assert res.shape[1:] == (4, 4)
    np.testing.assert_allclose(
        res[:, 3], np.broadcast_to([0, 0, 0, 1], (len(res), 4)), atol=1e-6
    )


def test_gan_harness_trains(tmp_path, rng):
    """Cascade-GAN steps: generator + discriminator losses stay finite and
    the discriminator learns to separate real from fake."""
    import jax
    import jax.numpy as jnp
    import optax

    from houv_tpu.models import get_model
    from houv_tpu.train.gan import PointDiscriminator, make_gan_step

    model = get_model("pcn", num_points=64, num_coarse=32)
    disc = PointDiscriminator()
    data = synthesize_completion_set(1, views_per_model=4, n_partial=64,
                                     n_complete=64, seed=4)
    ds = MVPCompletionDataset("train", data=data, views_per_model=4,
                              scale_aug=False)
    batch = {k: jnp.asarray(v) for k, v in ds.get_batch(np.arange(4)).items()
             if k in ("partial", "gt")}
    params = model.init(jax.random.PRNGKey(0), batch["partial"], batch["gt"],
                        "train", 0.5)["params"]
    d_params = disc.init(jax.random.PRNGKey(1), batch["gt"][:, :64])["params"]
    g_opt, d_opt = optax.adam(1e-3), optax.adam(1e-3)
    step = make_gan_step(model, disc, g_opt, d_opt, crop=64)
    g_state, d_state = g_opt.init(params), d_opt.init(d_params)
    metrics = None
    for _ in range(5):
        params, d_params, g_state, d_state, metrics = step(
            params, d_params, g_state, d_state, batch, 0.5, {}
        )
    assert np.isfinite(float(metrics["g_loss"]))
    assert np.isfinite(float(metrics["d_loss"]))
    assert float(metrics["d_loss"]) < 0.5  # below the no-learning fixed point


def test_cli_learned_model_test_runs(tmp_path):
    """Submission sweep for a learned completion model goes through the
    jit-cached trainer.predict_batch (VERDICT r2 #3) and pads the ragged
    last batch without emitting padded rows."""
    import h5py

    from houv_tpu.train.cli import test_main

    cfg = {
        "model_name": "pcn", "dataset": "mvp_cp", "num_points": 64,
        "num_coarse": 32, "work_dir": str(tmp_path), "batch_size": 8,
        "nepoch": 1,
    }
    cfg_path = str(tmp_path / "pcn.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    h5_path = test_main(["-c", cfg_path])
    with h5py.File(h5_path) as f:
        res = f["results"][()]
    assert res.shape[1:] == (64, 3)
    assert np.isfinite(res).all()


def test_cli_learned_registration_test_runs(tmp_path):
    """Same for a learned registration model: the test step returns bare
    (B, 4, 4) transforms via the cached jit."""
    import h5py

    from houv_tpu.train.cli import test_main

    cfg = {
        "model_name": "dcp", "dataset": "mvp_rg", "num_points": 64,
        "work_dir": str(tmp_path), "batch_size": 8, "nepoch": 1,
    }
    cfg_path = str(tmp_path / "dcp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    h5_path = test_main(["-c", cfg_path])
    with h5py.File(h5_path) as f:
        res = f["results"][()]
    assert res.shape[1:] == (4, 4)
    assert np.isfinite(res).all()
