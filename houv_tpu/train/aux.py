"""Trainers for the auxiliary experiment models.

The reference trains these through bespoke scripts:

- instance embeddings for the MVPN clustering (completion/train_one_gpu_v2
  .py over MVP_CP_choose_triple, completion/models/model_embedding.py),
- the alignment-quality classifier (registration/train_model.py /
  train_aligned.py over MVP_RG_Aligned, registration/models/spconv.py),
- the voxel-occupancy net (completion/train_one_gpu_v2.py with
  cfgs/spconv.yaml, completion/models/vox_asym.py + utils_loss.py getGt).

Here each is a small `_TrainerBase` subclass: a dataset view supplies the
trainer's batch format and a `_make_loss_fn` override supplies the loss,
so the shared jit/step/fit/checkpoint machinery is reused unchanged.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from houv_tpu.data.pipeline import batch_iterator
from houv_tpu.models.alignment import alignment_bce_loss, make_aligned_pairs
from houv_tpu.models.embedding import triplet_loss
from houv_tpu.ops.voxel import voxel_grid_indices
from houv_tpu.train.harness import _TrainerBase
from houv_tpu.utils.meters import AverageValueMeter

Array = jax.Array


# ---------------------------------------------------------------------------
# dataset views
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TripletView:
    """get_batch -> get_triplet_batch (reference MVP_CP_choose_triple)."""

    ds: object

    def __len__(self):
        return len(self.ds)

    def get_batch(self, indices, rng=None):
        return self.ds.get_triplet_batch(indices, rng=rng)


@dataclasses.dataclass
class AlignedPairView:
    """Registration batches -> candidate-aligned classification batches
    (reference MVP_RG_Aligned + getTransform, dataset.py:481-639): for each
    pair one 'true' candidate (GT perturbed <=5°) and one 'false' (>5°
    rotation), src moved by the candidate, labels 1/0."""

    ds: object

    def __len__(self):
        return len(self.ds)

    def get_batch(self, indices, rng=None):
        rng = rng or np.random.default_rng()
        batch = self.ds.get_batch(indices, rng=rng)
        src, tgt = batch["src"], batch["tgt"]
        transform = batch.get("transform")
        if transform is None:  # test split: classify the identity candidate
            transform = np.broadcast_to(
                np.eye(4, dtype=np.float32), (len(src), 4, 4)
            )
        moved = np.empty((2 * len(src),) + src.shape[1:], np.float32)
        for i in range(len(src)):
            t_true, t_false = make_aligned_pairs(rng, transform[i])
            moved[2 * i] = src[i] @ t_true[:3, :3].T + t_true[:3, 3]
            moved[2 * i + 1] = src[i] @ t_false[:3, :3].T + t_false[:3, 3]
        tgt2 = np.repeat(tgt, 2, axis=0).astype(np.float32)
        labels = np.tile(np.array([1.0, 0.0], np.float32), len(src))
        return {"src_moved": moved, "tgt": tgt2, "lbl": labels}


class PoolCandidateDataset(AlignedPairView):
    """Precomputed candidate-pool classification rows
    (scripts/make_rescore_dataset.py): the rescorer's REAL input
    distribution — rotation-NMS'd CD optima from solver pools, labeled by
    GT rotation error — instead of AlignedPairView's random perturbations
    of the GT transform.

    Motivation (BENCH_NOTES r4): the perturbation-trained classifier hit
    0.90 held-out acc yet destroyed solve quality when wired into
    rescoring (median 1.80° -> 5.0°+, half the pairs falsely overridden):
    random >5° perturbations are trivially separable, while the actual
    candidates are all CD-converged optima. Train on the pools instead.

    Subclasses AlignedPairView only so AlignmentTrainer.wrap_dataset
    passes it through; rows are already classifier-shaped."""

    def __init__(self, source, balance: bool = True, seed: int = 0,
                 augment: bool = False):
        if isinstance(source, str):
            z = np.load(source)
            source = {k: z[k] for k in ("src_moved", "tgt", "lbl")
                      if k in z}
        self.rows = {k: np.asarray(v) for k, v in source.items()}
        self.augment = augment
        lbl = self.rows["lbl"]
        idx = np.arange(len(lbl))
        if balance:
            pos = idx[lbl > 0.5]
            neg = idx[lbl <= 0.5]
            if len(pos) and len(neg) > len(pos):
                idx = np.concatenate(
                    [neg] + [pos] * int(round(len(neg) / len(pos)))
                )
        self._index = np.random.default_rng(seed).permutation(idx)

    def __len__(self):
        return len(self._index)

    def get_batch(self, indices, rng=None):
        rows = self._index[np.asarray(indices) % len(self._index)]
        batch = {k: v[rows] for k, v in self.rows.items()}
        if self.augment:
            # joint random rotation of the overlay: alignment quality is
            # SO(3)-invariant but the voxel grid is axis-aligned — rotating
            # (src_moved, tgt) together multiplies the effective training
            # set without changing any label
            from houv_tpu.data.mvp import random_pose_np

            rng = rng or np.random.default_rng()
            for i in range(len(rows)):
                r = random_pose_np(rng, np.pi, 0.0)[:3, :3].astype(
                    np.float32)
                batch["src_moved"][i] = batch["src_moved"][i] @ r.T
                batch["tgt"][i] = batch["tgt"][i] @ r.T
        return batch


@dataclasses.dataclass
class VoxelTargetView:
    """Completion batches + per-point voxel coords for both partial and gt
    (the analogue of the reference's getGt target construction,
    completion/utils_loss.py:6-38)."""

    ds: object

    def __len__(self):
        return len(self.ds)

    def get_batch(self, indices, rng=None):
        batch = self.ds.get_batch(indices, rng=rng)
        if "coords" not in batch:
            batch["coords"] = self.ds._voxel_coords(batch["partial"])
        if "gt" in batch:
            batch["gt_coords"] = self.ds._voxel_coords(batch["gt"])
        return batch


# ---------------------------------------------------------------------------
# trainers
# ---------------------------------------------------------------------------

class EmbeddingTrainer(_TrainerBase):
    """InstanceEmbedding on triplet batches: margin triplet loss on the
    L2-normalized embeddings + cross-entropy on the class logits."""

    _loss_key = "loss"

    def __post_init__(self):
        super().__post_init__()
        self.best = {"acc": (0, -float("inf"))}

    def wrap_dataset(self, ds):
        return TripletView(ds) if not isinstance(ds, TripletView) else ds

    def _init_args(self, batch):
        return dict(x=jnp.asarray(batch["anchor"]))

    def _make_loss_fn(self, has_bn):
        model = self.model

        def loss_fn(params, batch_stats, batch, alpha, rngs):
            variables = {"params": params}
            emb_a, logits = model.apply(variables, batch["anchor"])
            emb_p, _ = model.apply(variables, batch["positive"])
            emb_n, _ = model.apply(variables, batch["negative"])
            t_loss = triplet_loss(emb_a, emb_p, emb_n)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]
            ).mean()
            return t_loss + ce, ({"triplet": t_loss, "ce": ce}, {})

        return loss_fn

    def _build_eval_step(self):
        @jax.jit
        def eval_step(variables, batch):
            emb_a, logits = self.model.apply(variables, batch["anchor"])
            emb_p, _ = self.model.apply(variables, batch["positive"])
            emb_n, _ = self.model.apply(variables, batch["negative"])
            d_pos = jnp.sum((emb_a - emb_p) ** 2, axis=-1)
            d_neg = jnp.sum((emb_a - emb_n) ** 2, axis=-1)
            return {
                "acc": jnp.mean((d_pos < d_neg).astype(jnp.float32)),
                "cls_acc": jnp.mean(
                    (jnp.argmax(logits, -1) == batch["label"]).astype(
                        jnp.float32
                    )
                ),
            }

        return eval_step

    def validate(self, val_ds, epoch: int = 0):
        val_ds = self.wrap_dataset(val_ds)
        meters = {m: AverageValueMeter() for m in ("acc", "cls_acc")}
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        variables = self._variables()
        for batch in batch_iterator(val_ds, self.cfg.batch_size,
                                    drop_last=True):
            out = self._eval_step(variables, self._put(batch))
            for m in meters:
                meters[m].update(float(out[m]), self.cfg.batch_size)
        if meters["acc"].count and meters["acc"].avg > self.best["acc"][1]:
            self.best["acc"] = (epoch, meters["acc"].avg)
            self.save("best_acc_network.ckpt")
        import logging

        logging.getLogger("houv_tpu").info(
            "val: triplet_acc %.4f cls_acc %.4f",
            meters["acc"].avg, meters["cls_acc"].avg,
        )
        return {m: v.avg for m, v in meters.items()}


class AlignmentTrainer(_TrainerBase):
    """AlignmentClassifier on true/false candidate-transform pairs, BCE."""

    _loss_key = "loss"

    def __post_init__(self):
        super().__post_init__()
        self.best = {"acc": (0, -float("inf"))}

    def wrap_dataset(self, ds):
        return AlignedPairView(ds) if not isinstance(ds, AlignedPairView) \
            else ds

    def _init_args(self, batch):
        kw = dict(src_moved=jnp.asarray(batch["src_moved"]),
                  tgt=jnp.asarray(batch["tgt"]), train=True)
        if "extra" in batch:
            kw["extra"] = jnp.asarray(batch["extra"])
        return kw

    def _make_loss_fn(self, has_bn):
        model = self.model

        def loss_fn(params, batch_stats, batch, alpha, rngs):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            out = model.apply(
                variables,
                batch["src_moved"], batch["tgt"], True,
                extra=batch.get("extra"),
                mutable=["batch_stats"] if has_bn else False,
            )
            if has_bn:
                logits, updates = out
            else:
                logits, updates = out, {}
            loss = alignment_bce_loss(logits, batch["lbl"])
            return loss, ({"logits": logits}, updates)

        return loss_fn

    def _build_eval_step(self):
        @jax.jit
        def eval_step(variables, batch):
            logits = self.model.apply(
                variables, batch["src_moved"], batch["tgt"], False,
                extra=batch.get("extra"),
            )
            pred = (logits > 0).astype(jnp.float32)
            return {"acc": jnp.mean((pred == batch["lbl"]).astype(
                jnp.float32))}

        return eval_step

    def validate(self, val_ds, epoch: int = 0):
        val_ds = self.wrap_dataset(val_ds)
        meter = AverageValueMeter()
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        variables = self._variables()
        for batch in batch_iterator(val_ds, self.cfg.batch_size,
                                    drop_last=True):
            out = self._eval_step(variables, self._put(batch))
            meter.update(float(out["acc"]), self.cfg.batch_size)
        if meter.count and meter.avg > self.best["acc"][1]:
            self.best["acc"] = (epoch, meter.avg)
            self.save("best_acc_network.ckpt")
        import logging

        logging.getLogger("houv_tpu").info("val: align_acc %.4f", meter.avg)
        # optional deployed-decision-rule gate (set by the training
        # script): balanced-val acc saturates ~0.99 while margin-gated
        # override behavior still varies run to run (BENCH_NOTES r4), so
        # rescorer training selects a second checkpoint on override
        # precision over held-out candidate pools
        if getattr(self, "override_gate", None) is not None:
            self.override_gate(self._variables(), epoch)
        return {"acc": meter.avg}


def _voxel_targets(gt: Array, gt_coords: Array, grid_size: int):
    """Per-input-voxel targets from the GT cloud (getGt semantics,
    completion/utils_loss.py:6-38): occupancy = does the GT occupy the same
    voxel; position = mean GT point of that voxel (0 where unoccupied).

    gt (B,N,3); gt_coords/coords (B,N,3) int32 -> gathered at the *input*
    point coords (targets are constant across points of one voxel, exactly
    like the packed voxel rows they will be compared against)."""
    g = grid_size
    flat_gt = (gt_coords[..., 0] * g + gt_coords[..., 1]) * g \
        + gt_coords[..., 2]

    def single(gt_pts, fgt):
        num_vox = g * g * g
        cnt = jnp.zeros((num_vox,), jnp.float32).at[fgt].add(1.0)
        sums = jnp.zeros((num_vox, 3), jnp.float32).at[fgt].add(gt_pts)
        occ = (cnt > 0).astype(jnp.float32)
        mean = sums / jnp.maximum(cnt, 1.0)[:, None]
        return occ, mean

    occ_grid, pos_grid = jax.vmap(single)(gt, flat_gt)
    return occ_grid, pos_grid


class VoxelOccupancyTrainer(_TrainerBase):
    """VoxAsym: per-occupied-input-voxel GT occupancy (CE) + masked GT mean
    position regression (MSE)."""

    _loss_key = "loss"

    def __post_init__(self):
        super().__post_init__()
        self.best = {"iou": (0, -float("inf"))}

    def wrap_dataset(self, ds):
        return VoxelTargetView(ds) if not isinstance(ds, VoxelTargetView) \
            else ds

    def _init_args(self, batch):
        return dict(points=jnp.asarray(batch["partial"]),
                    coords=jnp.asarray(batch["coords"]), train=True)

    def _vox_loss(self, variables, batch, train, has_bn):
        g = self.model.grid_size
        out = self.model.apply(
            variables, batch["partial"], batch["coords"], train,
            mutable=["batch_stats"] if (has_bn and train) else False,
        )
        if has_bn and train:
            (probs, pos, vox_coords, mask), updates = out
        else:
            probs, pos, vox_coords, mask = out
            updates = {}
        occ_grid, pos_grid = _voxel_targets(
            batch["gt"], batch["gt_coords"], g
        )
        flat = (vox_coords[..., 0] * g + vox_coords[..., 1]) * g \
            + vox_coords[..., 2]
        occ_t = jnp.take_along_axis(occ_grid, flat, axis=1)  # (B, V)
        pos_t = jnp.take_along_axis(
            pos_grid, flat[..., None], axis=1
        )  # (B, V, 3)
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)
        logp = jnp.log(jnp.maximum(probs, 1e-9))
        ce = -(occ_t * logp[..., 1] + (1 - occ_t) * logp[..., 0])
        ce = (ce * m).sum() / denom
        pos_m = m * occ_t
        pos_mse = (((pos - pos_t) ** 2).sum(-1) * pos_m).sum() \
            / jnp.maximum(pos_m.sum(), 1.0)
        pred = (probs[..., 1] > 0.5).astype(jnp.float32)
        inter = (pred * occ_t * m).sum()
        union = (jnp.maximum(pred, occ_t) * m).sum()
        metrics = {
            "ce": ce, "pos_mse": pos_mse,
            "iou": inter / jnp.maximum(union, 1.0),
        }
        return ce + pos_mse, metrics, updates

    def _make_loss_fn(self, has_bn):
        def loss_fn(params, batch_stats, batch, alpha, rngs):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            loss, metrics, updates = self._vox_loss(
                variables, batch, True, has_bn
            )
            return loss, (metrics, updates)

        return loss_fn

    def _build_eval_step(self):
        has_bn = bool(jax.tree_util.tree_leaves(self.state["batch_stats"]))

        @jax.jit
        def eval_step(variables, batch):
            _, metrics, _ = self._vox_loss(variables, batch, False, has_bn)
            return metrics

        return eval_step

    def validate(self, val_ds, epoch: int = 0):
        val_ds = self.wrap_dataset(val_ds)
        meters = {m: AverageValueMeter() for m in ("ce", "pos_mse", "iou")}
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        variables = self._variables()
        for batch in batch_iterator(val_ds, self.cfg.batch_size,
                                    drop_last=True):
            out = self._eval_step(variables, self._put(batch))
            for m in meters:
                meters[m].update(float(out[m]), self.cfg.batch_size)
        if meters["iou"].count and meters["iou"].avg > self.best["iou"][1]:
            self.best["iou"] = (epoch, meters["iou"].avg)
            self.save("best_iou_network.ckpt")
        import logging

        logging.getLogger("houv_tpu").info(
            "val: " + "".join(f"{m}: {v.avg:.4f}; " for m, v in
                              meters.items())
        )
        return {m: v.avg for m, v in meters.items()}
