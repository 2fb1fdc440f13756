"""Typed configuration with the reference's YAML surface.

The reference reads flat YAML into a munch attribute object with zero
validation (registration/test_mult.py:94). Here the same YAML keys map onto
a typed dataclass — unknown keys are rejected, types are coerced, and the
reference's comma-separated string lists ("0.01, 0.1, 0.5, 1",
"1, 1, 1, 1") are parsed into tuples.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import yaml


def _parse_tuple(v, typ=float):
    if v is None:
        return None
    if isinstance(v, (list, tuple)):
        return tuple(typ(x) for x in v)
    if isinstance(v, str):
        return tuple(typ(x.strip()) for x in v.split(","))
    return (typ(v),)


@dataclasses.dataclass
class Config:
    # experiment
    model_name: str = "pcn"
    flag: str = "debug"
    work_dir: str = "log/"
    load_model: str | None = None
    manual_seed: int | None = None

    # data
    dataset: str = "mvp_cp"          # mvp_cp | mvp_rg | synthetic_cp | synthetic_rg
    data_path: str | None = None
    num_points: int = 2048
    batch_size: int = 32
    every_batch_size: int = 32
    workers: int = 0
    max_angle: float = 45.0          # registration pose synthesis (degrees)
    max_trans: float = 0.5
    category: int | None = None
    scale_aug: bool = True
    # size of the synthetic fallback splits (None = 128 train / 64 other);
    # lets sweep rehearsals run at reference scale without the MVP .h5
    synthetic_size: int | None = None
    # synthetic registration fixture shapes: 'blobs' (r1 ellipsoids) |
    # 'structured' (panel/bar objects with MVP-like CD statistics —
    # what the quality gates use, data/mvp.py:synthesize_registration_pairs)
    synthetic_shape: str = "blobs"
    # mixed precision for every learned model (pcn, ecg, vrcnet,
    # vrcnet_knn, dcp, deepgmr, idam, transformer, model_embedding,
    # alignment_spconv, voxel_asym): 'bfloat16' runs the hot
    # Dense/attention/conv stacks in bf16 with f32 params, statistics,
    # losses, and kNN selection; None = full f32 (reference numerics)
    compute_dtype: str | None = None

    # optimization
    nepoch: int = 100
    start_epoch: int = 0
    lr: float = 1e-4
    lr_decay: bool = True
    lr_decay_interval: int | None = 40
    lr_decay_rate: float = 0.7
    lr_step_decay_epochs: tuple | None = None
    lr_step_decay_rates: tuple | None = None
    lr_clip: float = 1e-6
    optimizer: str = "Adam"
    weight_decay: float = 0.0
    betas: tuple = (0.9, 0.999)
    varying_constant: tuple | None = (0.01, 0.1, 0.5, 1.0)
    varying_constant_epochs: tuple | None = (5, 15, 30)

    # loss / eval
    loss: str = "cd"
    eval_emd: bool = False
    # cascade-GAN branch of completion/train.py:63-170 (LSGAN critic on the
    # fine output; generator loss = adversarial + gan_weight * completion)
    use_gan: bool = False
    gan_weight: float = 200.0
    # ModelNet variant (dataset: modelnet): clean | noisy | unseen | icl_nuim
    variant: str = "clean"
    # Native C++ prefetching loader (native/houv_loader.cpp) for learned
    # registration training: pose synthesis off the Python hot path.
    use_native_loader: bool = False
    native_steps: int = 0            # >0: step-based fit via fit_steps
    step_interval_to_print: int = 500
    epoch_interval_to_save: int = 1
    epoch_interval_to_val: int = 1

    # model hyperparameters (union of the reference cfgs)
    layers: tuple = (2, 2, 2, 2)
    knn_list: tuple = (10, 20)
    pk: int = 10
    points_label: bool = False
    local_folding: bool = False
    num_coarse: int = 1024
    num_coarse_raw: int = 1024
    num_fps: int = 2048
    num_fine: int = 3072
    num_native: int = 2048
    feature_size: int = 2048
    distribution_loss: str = "KLD"
    cycle: bool = False              # DCP reverse-direction consistency
    # remat the SA-SKN units (batch headroom; note: changes flax module
    # paths, so checkpoints are not interchangeable with use_remat=False)
    use_remat: bool = False
    # remat voxel-branch conv bodies (backward regather). False = save
    # residuals instead — measured faster at B=16/B=32 on v5e (param
    # paths unaffected: the checkpoint wraps the pure op, not the module).
    voxel_conv_remat: bool = False
    # vrcnet_knn: one-dispatch train loss (models/vrcnet_knn.fused_cd)
    fused_cd: bool = False
    grid_size: int = 50              # voxel branch grid (50³, dataset.py:264)
    voxel_init_size: int = 128       # Asymm3DSpconv init channel width
    use_rri: bool = True
    rri_size: int = 20
    num_groups: int = 16
    descriptor_size: int = 64
    num_iters: int = 3
    use_fpfh: bool = False
    use_tnet: bool = False

    # HOUV solver
    kernel: int = 64
    num_epochs: int = 500            # solver inner steps (reference naming)
    houv_lr: float = 0.1
    retry_threshold: float = 0.030
    angle_passes: int = 4
    # solver ablation family (solvers/houv.py HOUVConfig; defaults = the
    # canonical submission semantics)
    retry_mode: str = "threshold"    # 'threshold' | 'always'
    use_view_loss: bool = False
    houv_reparam: str = "sine"       # 'sine' | 'sigmoid' | 'unconstrained' | 'v3'
    houv_objective: str = "trunc"    # 'trunc' | 'multi_percent'
    two_bracket: bool = False
    # TPU correspondence-refresh cadence (solvers/houv.py): 1 = reference
    # step semantics; "400:5,100:2" = the measured coarse-to-fine champion
    # (BENCH_NOTES r3 — ~3.5x the parity throughput at equal gate quality)
    nn_refresh: int = 1
    nn_refresh_schedule: str | None = None  # "N:R[:S],..." phases | "auto"
    # angle-window selection (solvers/houv.py): 'loss' = reference
    # keep-if-better; 'consensus' = restart-consensus rescoring for
    # symmetric-object ambiguity (tuning knobs live on HOUVConfig)
    window_select: str = "loss"
    # classifier-rescored restart selection (solvers/rescore.py; train the
    # scorer with scripts/make_rescore_dataset.py + train_rescorer_pool.py)
    rescore_ckpt: str | None = None
    rescore_cands: int = 16
    rescore_angle: float = 10.0
    rescore_margin: float = 0.0
    # logit test-time-augmentation rotations (1 = off; measured neutral,
    # BENCH_NOTES r4) — the loss-gap side head is auto-detected from the
    # checkpoint itself (train/cli.py:make_rescorer)
    rescore_tta: int = 1

    # parallel
    n_devices: int | None = None

    # observability (replaces the reference's ad-hoc time.time() walls,
    # SURVEY.md §5 tracing row): when set, the first profile_steps train
    # steps are captured with jax.profiler into this directory.
    profile_dir: str | None = None
    profile_steps: int = 10

    extras: dict = dataclasses.field(default_factory=dict)

    _TUPLE_FIELDS = {
        "betas": float,
        "varying_constant": float,
        "varying_constant_epochs": int,
        "lr_step_decay_epochs": int,
        "lr_step_decay_rates": float,
        "layers": int,
        "knn_list": int,
    }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs: dict[str, Any] = {}
        extras: dict[str, Any] = {}
        for k, v in d.items():
            if k in cls._TUPLE_FIELDS:
                v = _parse_tuple(v, cls._TUPLE_FIELDS[k])
            if k in fields and k != "extras":
                kwargs[k] = v
            else:
                extras[k] = v
        cfg = cls(**kwargs)
        cfg.extras = extras
        return cfg


def parse_refresh_schedule(s: str | None) -> tuple | str | None:
    """'400:5,100:2' -> ((400, 5), (100, 2)) for
    HOUVConfig.nn_refresh_schedule; 'auto' passes through (resolved
    against the step budget by auto_refresh_schedule); None/'' -> None."""
    if not s:
        return None
    if s == "auto":
        return s
    return tuple(
        tuple(int(v) for v in part.split(":")) for part in s.split(",")
    )


def load_config(path: str) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return Config.from_dict(raw)
