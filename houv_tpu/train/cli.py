"""Command-line drivers.

Same surface as the reference (``python train.py -c cfgs/X.yaml``,
``python test.py -c cfgs/X.yaml [-l L -r R]`` — registration/train.py,
registration/test_mult.py:83-98) with one driver for both workloads; the
model_name in the config selects the task. When the MVP .h5 files are
absent, synthetic MVP-like data keeps every path runnable end-to-end.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from houv_tpu.data import (
    ModelNetDataset,
    MVPCompletionDataset,
    MVPRegistrationDataset,
    synthesize_completion_set,
    synthesize_modelnet_set,
    synthesize_registration_pairs,
)
from houv_tpu.train.config import (Config, load_config,
                                   parse_refresh_schedule)
from houv_tpu.train.harness import CompletionTrainer, RegistrationTrainer
from houv_tpu.train.submission import write_results_h5, write_submission
from houv_tpu.utils.logging_utils import setup_logging

from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

REGISTRATION_MODELS = {"dcp", "deepgmr", "idam", "houv", "icp", "goicp",
                       "goicp_bnb", "fgr"}


def is_registration(cfg: Config) -> bool:
    return cfg.model_name in REGISTRATION_MODELS or cfg.dataset.endswith("rg")


def build_dataset(cfg: Config, split: str, index_range=None):
    registration = is_registration(cfg)
    have_file = cfg.data_path and os.path.exists(cfg.data_path)
    if cfg.dataset == "modelnet":
        # reference registration/dataset.py:154-187 ModelNet variants
        if have_file:
            return ModelNetDataset(
                split, variant=cfg.variant, path=cfg.data_path,
                max_angle_deg=cfg.max_angle, max_trans=cfg.max_trans,
                index_range=index_range,
            )
        data = synthesize_modelnet_set(
            64 if split != "train" else 128, n_points=cfg.num_points,
            seed=2021 if split == "train" else 7,
        )
        return ModelNetDataset(
            split, variant=cfg.variant, data=data,
            max_angle_deg=cfg.max_angle, max_trans=cfg.max_trans,
            index_range=index_range,
        )
    with_voxels = cfg.model_name == "vrcnet_knn"
    if have_file:
        if registration:
            return MVPRegistrationDataset(
                split, path=cfg.data_path, max_angle_deg=cfg.max_angle,
                max_trans=cfg.max_trans, index_range=index_range,
                category=cfg.category,
            )
        return MVPCompletionDataset(
            split, path=cfg.data_path, scale_aug=cfg.scale_aug,
            index_range=index_range, category=cfg.category,
            with_voxels=with_voxels, grid_size=cfg.grid_size,
        )
    # Synthetic fallback (the large MVP .h5 files are not distributed).
    n = cfg.synthetic_size or (64 if split != "train" else 128)
    if registration:
        data = synthesize_registration_pairs(
            n, n_points=cfg.num_points, max_angle_deg=cfg.max_angle,
            max_trans=cfg.max_trans, seed=2021 if split == "train" else 7,
            shape_mode=cfg.synthetic_shape,
            rot_mix=(cfg.synthetic_shape == "structured"),
        )
        return MVPRegistrationDataset(
            split, data=data, max_angle_deg=cfg.max_angle,
            max_trans=cfg.max_trans, index_range=index_range,
        )
    data = synthesize_completion_set(
        max(n // 8, 2), views_per_model=8, n_partial=cfg.num_points,
        n_complete=cfg.num_points, seed=2021 if split == "train" else 7,
    )
    return MVPCompletionDataset(
        split, data=data, views_per_model=8, scale_aug=cfg.scale_aug,
        index_range=index_range, with_voxels=with_voxels,
        grid_size=cfg.grid_size,
    )


def make_trainer(cfg: Config, mesh=None):
    """Trainer for the config's model. When no mesh is passed, CLI training
    is data-parallel over all local devices (the DataParallel analogue) —
    provided the batch divides the device count."""
    from houv_tpu.train.aux import (
        AlignmentTrainer,
        EmbeddingTrainer,
        VoxelOccupancyTrainer,
    )

    if mesh is None:
        n_dev = cfg.n_devices or len(jax.devices())
        if n_dev > 1 and cfg.batch_size % n_dev == 0:
            from houv_tpu.parallel import make_mesh

            mesh = make_mesh(n_dev)
    aux = {
        "model_embedding": EmbeddingTrainer,
        "alignment_spconv": AlignmentTrainer,
        "voxel_asym": VoxelOccupancyTrainer,
    }
    if cfg.model_name in aux:
        return aux[cfg.model_name](cfg, mesh=mesh)
    if is_registration(cfg):
        return RegistrationTrainer(cfg, mesh=mesh)
    return CompletionTrainer(cfg, mesh=mesh)


def make_rescorer(cfg: Config, log, mesh=None):
    """Classifier scorer from cfg.rescore_ckpt, or None. When set, HOUV
    solves route through the rescored driver: candidate 0 stays the
    reference loss pick; a rotation-NMS'd candidate overrides it only
    when the trained AlignmentClassifier prefers it by cfg.rescore_margin
    (BENCH_NOTES r5: zero harmful overrides on both the 256- and
    512-pair gates at margin 3; 256 mean 4.93° -> 4.69° incl. a -52°
    symmetric-flip repair). With a multi-device ``mesh`` the classifier
    applications shard over the pair axis (make_sharded_classifier_scorer)
    so the quality mode rides the mesh like the plain sweep."""
    if not cfg.rescore_ckpt:
        return None
    if not os.path.exists(cfg.rescore_ckpt):
        log.warning(
            "rescore_ckpt %s not found — solving WITHOUT rescoring. "
            "Train it: scripts/make_rescore_dataset.py + "
            "scripts/train_rescorer_pool.py", cfg.rescore_ckpt)
        return None
    from houv_tpu.models import get_model
    from houv_tpu.solvers.rescore import (
        make_classifier_scorer,
        make_sharded_classifier_scorer,
    )
    from houv_tpu.train.checkpoint import load_checkpoint

    state = load_checkpoint(cfg.rescore_ckpt)
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    # The loss-gap side head shows up as a third Dense in the checkpoint
    # (models/alignment.py n_extra branch). Auto-detect it: building a
    # plain model against a gap-trained checkpoint would silently drop
    # the trained head (flax ignores unused params — ADVICE r4).
    has_gap = "Dense_2" in state["params"]
    model = get_model("alignment_spconv", grid_size=cfg.grid_size,
                      compute_dtype="bfloat16",
                      n_extra=1 if has_gap else 0)
    log.info("rescoring enabled: ckpt=%s n_cand=%d angle=%.1f margin=%.2f "
             "gap_head=%s tta=%d sharded=%s",
             cfg.rescore_ckpt, cfg.rescore_cands, cfg.rescore_angle,
             cfg.rescore_margin, has_gap, cfg.rescore_tta,
             mesh is not None and mesh.devices.size > 1)
    if mesh is not None and mesh.devices.size > 1:
        # TTA not plumbed through the sharded scorer (measured neutral,
        # BENCH_NOTES r4); fall through to the host scorer if requested
        if cfg.rescore_tta <= 1:
            return make_sharded_classifier_scorer(
                model, variables, mesh, micro_batch=16, use_gap=has_gap)
        log.warning("rescore_tta>1 uses the host (single-device) scorer")
    return make_classifier_scorer(model, variables, micro_batch=16,
                                  n_aug=cfg.rescore_tta, use_gap=has_gap)


def houv_eval_main(cfg: Config, log) -> dict:
    """Solver evaluation on the labeled val split (reference
    registration/train_HOUV.py:40-131: deliberately aliases the train loop
    to the test dataloader and reports RotE/transE/MSE/RMSE/recall globally
    and per (rot_level × match_level) bucket)."""
    import time

    from houv_tpu.geometry.rotations import (
        rotation_geodesic_error,
        rmse_loss as rmse_fn,
        translation_error,
    )
    from houv_tpu.parallel import make_mesh, sharded_houv_solve
    from houv_tpu.solvers import HOUVConfig
    from houv_tpu.solvers.houv import evaluate_solution
    from houv_tpu.utils.meters import AverageValueMeter, SplitMeterGrid

    ds = build_dataset(cfg, "val")
    mesh = make_mesh(cfg.n_devices)
    n_dev = mesh.devices.size
    scfg = HOUVConfig(
        kernel=cfg.kernel, steps=cfg.num_epochs, lr=cfg.houv_lr,
        retry_threshold=cfg.retry_threshold, angle_passes=cfg.angle_passes,
        retry_mode=cfg.retry_mode, use_view_loss=cfg.use_view_loss,
        reparam=cfg.houv_reparam, objective=cfg.houv_objective,
        two_bracket=cfg.two_bracket, nn_refresh=cfg.nn_refresh,
        nn_refresh_schedule=parse_refresh_schedule(cfg.nn_refresh_schedule),
        window_select=cfg.window_select,
    )
    metric_names = ("RotE", "transE", "MSE", "RMSE", "recall", "GeoE")
    meters = {m: AverageValueMeter() for m in metric_names}
    grid = SplitMeterGrid(metrics=metric_names)
    bs = max((cfg.batch_size // n_dev) * n_dev, n_dev)
    # clamp to the dataset: batch_size 100 (reference default) over a
    # smaller val split must not mean zero eval iterations
    if len(ds) < n_dev:
        raise ValueError(
            f"val split has {len(ds)} pairs < {n_dev} devices — the eval "
            "loop would run zero iterations and report averages of "
            "nothing; shrink n_devices or grow the split"
        )
    bs = max(min(bs, (len(ds) // n_dev) * n_dev), n_dev)
    key = jax.random.PRNGKey(cfg.manual_seed or 2021)
    scorer = make_rescorer(cfg, log, mesh=mesh)
    if scorer is not None:
        from houv_tpu.solvers.rescore import sharded_houv_solve_rescored
    t0 = time.time()
    n_done = 0
    for start in range(0, (len(ds) // bs) * bs, bs):
        batch = ds.get_batch(np.arange(start, start + bs))
        if scorer is not None:
            # rides the mesh: pool solve + extraction + scoring shard
            # over the pair axis (n_dev=1 degenerates to the host path)
            out = sharded_houv_solve_rescored(
                jnp.asarray(batch["src"]), jnp.asarray(batch["tgt"]),
                jax.random.fold_in(key, start), mesh, scfg, scorer,
                n_cand=cfg.rescore_cands, angle_deg=cfg.rescore_angle,
                margin=cfg.rescore_margin,
            )
        else:
            out = sharded_houv_solve(
                jnp.asarray(batch["src"]), jnp.asarray(batch["tgt"]),
                jax.random.fold_in(key, start), mesh, scfg,
            )
        tf = out["transform"]
        t_gt = jnp.asarray(batch["transform"])
        r_err, t_err = evaluate_solution(tf, t_gt)
        rmse = rmse_fn(jnp.asarray(batch["src"]), tf, t_gt)
        # reference train_HOUV.py:114: the MSE meter tracks rmse_loss (the
        # same quantity as RMSE); the geodesic+translation variant is kept
        # as the extra 'GeoE' meter (it is NOT the reference's MSE —
        # VERDICT r2 weak #6)
        geo = rotation_geodesic_error(tf[:, :3, :3], t_gt[:, :3, :3]) \
            + translation_error(tf[:, :3, 3], t_gt[:, :3, 3])
        vals = {
            "RotE": np.asarray(r_err), "transE": np.asarray(t_err),
            "MSE": np.asarray(rmse), "RMSE": np.asarray(rmse),
            "recall": (np.asarray(rmse) < 0.1).astype(np.float32),
            "GeoE": np.asarray(geo),
        }
        for m, arr in vals.items():
            meters[m].update(float(arr.mean()), bs)
        if "rot_level" in batch and "match_level" in batch:
            grid.update(batch["rot_level"], batch["match_level"], vals)
        n_done += bs
        log.info(
            "[%d/%d] " % (n_done, len(ds))
            + "".join(f"{m}: {v.avg:.4f}; " for m, v in meters.items())
            + "retries %d" % int(out["n_retry"])
        )
    for line in grid.logs():
        log.info(line)
    log.info("HOUV eval done: %d pairs in %.1fs (%.3f pairs/s)",
             n_done, time.time() - t0, n_done / max(time.time() - t0, 1e-9))
    return {m: v.avg for m, v in meters.items()}


def icp_eval_main(cfg: Config, log) -> dict:
    """Batched ICP / multistart-ICP baseline evaluation (reference
    registration/train_ICP.py:104-210 per-pair Open3D loop and
    test_goicp.py's Go-ICP sweep — both replaced by on-device batched
    solves; 'goicp' selects the multistart global search; 'fgr' the
    FPFH-feature Fast Global Registration, train_ICP.py:156-185)."""
    from houv_tpu.solvers import fgr_solve, icp_solve
    from houv_tpu.solvers.houv import evaluate_solution
    from houv_tpu.solvers.icp import icp_solve_multistart
    from houv_tpu.utils.meters import AverageValueMeter

    ds = build_dataset(cfg, "val")
    meters = {m: AverageValueMeter() for m in ("RotE", "transE", "recall")}
    bs = max(min(cfg.batch_size, len(ds)), 1)
    for start in range(0, (len(ds) // bs) * bs, bs):
        batch = ds.get_batch(np.arange(start, start + bs))
        src = jnp.asarray(batch["src"])
        tgt = jnp.asarray(batch["tgt"])
        if cfg.model_name == "fgr":
            out = fgr_solve(src, tgt, iters=max(cfg.num_iters, 48))
        elif cfg.model_name == "goicp_bnb":
            from houv_tpu.solvers.goicp_bnb import goicp_bnb_solve

            out = goicp_bnb_solve(
                src, tgt, trans_half=cfg.max_trans,
                levels=max(cfg.num_iters, 10),
            )
            log.info(
                "goicp_bnb: e %.5f gap %.5f certified %d/%d",
                float(jnp.mean(out["e"])), float(jnp.mean(out["gap"])),
                int(jnp.sum(out["certified"])), len(src),
            )
        elif cfg.model_name == "goicp":
            from houv_tpu.solvers.icp import goicp_solve

            out = goicp_solve(
                src, tgt, threshold=0.1, max_iters=cfg.num_iters,
            )
        else:
            out = icp_solve(src, tgt, threshold=0.02,
                            max_iters=max(cfg.num_iters, 50))
        r_err, t_err = evaluate_solution(
            out["transform"], jnp.asarray(batch["transform"])
        )
        meters["RotE"].update(float(jnp.mean(r_err)), bs)
        meters["transE"].update(float(jnp.mean(t_err)), bs)
        meters["recall"].update(float(jnp.mean(r_err < 5.0)), bs)
        log.info("".join(f"{m}: {v.avg:.4f}; " for m, v in meters.items()))
    return {m: v.avg for m, v in meters.items()}


def train_main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--data-path", default=None,
                   help="MVP .h5 file; overrides the config's data_path "
                        "(absent file -> synthetic fallback)")
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    if args.data_path:
        cfg.data_path = args.data_path
    if cfg.model_name == "houv":
        setup_logging(os.path.join(cfg.work_dir, "houv"))
        log = logging.getLogger("houv_tpu")
        return houv_eval_main(cfg, log)
    if cfg.model_name in ("icp", "goicp", "goicp_bnb", "fgr"):
        setup_logging(os.path.join(cfg.work_dir, cfg.model_name))
        log = logging.getLogger("houv_tpu")
        return icp_eval_main(cfg, log)
    trainer = make_trainer(cfg)
    setup_logging(trainer.log_dir)
    logging.getLogger("houv_tpu").info("config: %s", cfg)
    train_ds = build_dataset(cfg, "train")
    val_ds = build_dataset(cfg, "val")
    if cfg.use_native_loader and is_registration(cfg):
        # C++ prefetching loader (pose synthesis in a native thread pool),
        # step-based training (reference epochs ~ len/batch_size steps)
        from houv_tpu.data.native_loader import NativeRegistrationLoader

        loader = NativeRegistrationLoader(
            train_ds.src, train_ds.tgt, cfg.batch_size,
            max_angle_deg=cfg.max_angle, max_trans=cfg.max_trans,
            seed=cfg.manual_seed or 2021,
        )
        epoch_len = max(len(train_ds) // cfg.batch_size, 1)
        n_steps = cfg.native_steps or cfg.nepoch * epoch_len
        return trainer.fit_steps(
            loader, n_steps, epoch_len=epoch_len, val_ds=val_ds
        )
    trainer.fit(train_ds, val_ds)


def combine_main(cfg: Config, log) -> str:
    """Idempotent shard combine (replaces the reference's sleep-600 +
    blind concatenate, run_test.sh:20-23 / test_mult.py:70-81): reads the
    shard manifest, re-solves any MISSING ranges, then merges. Restartable
    at shard granularity like the reference's .npy scheme, but it verifies
    coverage instead of hoping."""
    import glob
    import json

    import h5py

    out_dir = os.path.join(cfg.work_dir, cfg.model_name)
    manifest_path = os.path.join(out_dir, "manifest.json")
    total = len(build_dataset(cfg, "test"))
    shards = {}
    for path in glob.glob(os.path.join(out_dir, "results_*_*.h5")):
        name = os.path.basename(path)[len("results_"):-len(".h5")]
        l, r = (int(x) for x in name.split("_"))
        shards[(l, r)] = path
    covered = np.zeros(total, bool)
    for (l, r) in shards:
        covered[l:r] = True
    missing = []
    start = None
    for i in range(total + 1):
        gap = i < total and not covered[i]
        if gap and start is None:
            start = i
        if not gap and start is not None:
            missing.append((start, i))
            start = None
    for (l, r) in missing:
        log.info("re-solving missing shard [%d, %d)", l, r)
        test_main(["-c", cfg._config_path, "-l", str(l), "-r", str(r)])
        shards[(l, r)] = os.path.join(out_dir, f"results_{l}_{r}.h5")
    parts = []
    for (l, r) in sorted(shards):
        with h5py.File(shards[(l, r)]) as f:
            parts.append(f["results"][()])
    results = np.concatenate(parts, axis=0)[:total]
    h5_path = write_results_h5(os.path.join(out_dir, "results.h5"), results)
    write_submission(os.path.join(out_dir, "submission.zip"), h5_path)
    with open(manifest_path, "w") as f:
        json.dump(
            {"total": total,
             "shards": [[l, r] for (l, r) in sorted(shards)]}, f,
        )
    log.info("combined %d shards -> %s", len(shards), h5_path)
    return h5_path


def test_main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-l", type=int, default=None)
    p.add_argument("-r", type=int, default=None)
    p.add_argument("--combine", default=False)
    p.add_argument("--data-path", default=None,
                   help="MVP .h5 file; overrides the config's data_path "
                        "(absent file -> synthetic fallback)")
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    cfg._config_path = args.config
    if args.data_path:
        cfg.data_path = args.data_path
    setup_logging(None)
    log = logging.getLogger("houv_tpu")

    if args.combine:
        return combine_main(cfg, log)

    if cfg.model_name in ("model_embedding", "alignment_spconv",
                          "voxel_asym"):
        # experimental models: "test" = their val metrics (the reference's
        # train_model.py / train_one_gpu_v2.py evaluate in-loop; there is
        # no submission artifact for these)
        trainer = make_trainer(cfg)
        val_ds = build_dataset(cfg, "val")
        wrapped = trainer.wrap_dataset(val_ds)
        first = wrapped.get_batch(
            np.arange(min(cfg.batch_size, len(wrapped)))
        )
        trainer.init_state(first)
        metrics = trainer.validate(val_ds)
        log.info("aux test metrics: %s", metrics)
        return metrics

    index_range = (args.l, args.r) if args.l is not None else None
    ds = build_dataset(cfg, "test", index_range=index_range)

    if cfg.model_name == "houv":
        from houv_tpu.parallel import make_mesh, sharded_houv_solve
        from houv_tpu.solvers import HOUVConfig
        from houv_tpu.solvers.houv import houv_solve_chunked

        mesh = make_mesh(cfg.n_devices)
        n_dev = mesh.devices.size
        scorer = make_rescorer(cfg, log, mesh=mesh)
        if scorer is not None:
            from houv_tpu.solvers.rescore import sharded_houv_solve_rescored
        scfg = HOUVConfig(
            kernel=cfg.kernel, steps=cfg.num_epochs, lr=cfg.houv_lr,
            retry_threshold=cfg.retry_threshold,
            angle_passes=cfg.angle_passes,
            retry_mode=cfg.retry_mode, use_view_loss=cfg.use_view_loss,
            reparam=cfg.houv_reparam, objective=cfg.houv_objective,
            two_bracket=cfg.two_bracket, nn_refresh=cfg.nn_refresh,
            nn_refresh_schedule=parse_refresh_schedule(
                cfg.nn_refresh_schedule),
            window_select=cfg.window_select,
        )
        key = jax.random.PRNGKey(cfg.manual_seed or 2021)
        # Chunk pairs by batch_size: kernel-way restart expansion makes the
        # per-pair footprint kernel*N points — the whole 2000-pair split in
        # one device batch would OOM (reference solves batch_size=100 at a
        # time too, registration/test_mult.py:39, cfgs/houv.yaml).
        bs = max((cfg.batch_size // n_dev) * n_dev, n_dev)
        chunks = []
        n_retry = 0
        n = len(ds)
        for start in range(0, n, bs):
            idx = np.arange(start, min(start + bs, n))
            pad = bs - len(idx)  # keep jit shapes static on the tail
            batch = ds.get_batch(np.resize(idx, bs))
            src = jnp.asarray(batch["src"])
            tgt = jnp.asarray(batch["tgt"])
            ckey = jax.random.fold_in(key, start)
            if scorer is not None:
                out = sharded_houv_solve_rescored(
                    src, tgt, ckey, mesh, scfg, scorer,
                    n_cand=cfg.rescore_cands, angle_deg=cfg.rescore_angle,
                    margin=cfg.rescore_margin,
                )
            elif n_dev == 1:
                # single chip: bounded dispatches (long single XLA programs
                # can trip remote-runtime watchdogs)
                out = houv_solve_chunked(src, tgt, ckey, scfg)
            else:
                out = sharded_houv_solve(src, tgt, ckey, mesh, scfg)
            tf = np.asarray(out["transform"])
            chunks.append(tf[: bs - pad] if pad else tf)
            n_retry += int(out["n_retry"])
            log.info("solved pairs [%d, %d)/%d", start, start + len(idx), n)
        results = np.concatenate(chunks, axis=0)
        log.info("solved %d pairs, %d retries", n, n_retry)
    else:
        trainer = make_trainer(cfg)
        first = ds.get_batch(np.arange(min(cfg.batch_size, len(ds))))
        # test split has no gt: init with inputs as stand-in gt
        init_batch = dict(first)
        init_batch.setdefault("gt", first.get("partial", first.get("src")))
        init_batch.setdefault("transform", np.broadcast_to(
            np.eye(4, dtype=np.float32), (len(init_batch["gt"]), 4, 4)
        ))
        trainer.init_state(init_batch)
        outs = []
        from houv_tpu.data.pipeline import batch_iterator

        # jit-cached test step (pad_last keeps shapes static, so the whole
        # sweep compiles exactly once — reference completion/test.py runs
        # the 59,800-cloud sweep in 1-2 h on 4 GPUs; the jitted step here
        # matches the cached validate step's device time)
        for i, batch in enumerate(
            batch_iterator(ds, cfg.batch_size, pad_last=True)
        ):
            valid = int(batch.pop("valid"))
            out = trainer.predict_batch(batch, step=i)
            outs.append(np.asarray(out)[:valid])
        results = np.concatenate(outs, axis=0)

    suffix = f"_{args.l}_{args.r}" if index_range else ""
    out_dir = os.path.join(cfg.work_dir, cfg.model_name)
    h5_path = write_results_h5(
        os.path.join(out_dir, f"results{suffix}.h5"), results
    )
    zip_path = write_submission(
        os.path.join(out_dir, f"submission{suffix}.zip"), h5_path
    )
    log.info("wrote %s and %s", h5_path, zip_path)
    return h5_path
