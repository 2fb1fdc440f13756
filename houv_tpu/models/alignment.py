"""Alignment-quality classifier + voxel-occupancy net (flax).

Covers two experimental reference components:

1. The spconv alignment classifier (registration/models/spconv.py — whose
   decoder is commented out in the reference, leaving a voxel-feature
   extractor — trained by registration/train_model.py / train_aligned.py on
   MVP_RG_Aligned true/near/false transform pairs, registration/
   dataset.py:481-639 with ``getTransform`` :580-590: "true" = GT perturbed
   by <5° / 1e-3, "false" = GT perturbed by a >5° rotation).
   ``AlignmentClassifier`` scores whether a candidate transform aligns a
   pair: the two clouds are voxelized jointly with one-hot source tags as
   features and run through the sparse-conv trunk to a binary logit.

2. ``VoxAsym`` — the voxel-occupancy prediction net (completion/models/
   vox_asym.py: per-point MLP -> scatter-mean into voxels -> Asymm spconv
   trunk -> per-voxel class softmax + position regression, trained by
   train_one_gpu_v2.py, cfgs/spconv.yaml).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from houv_tpu.models.common import PointMLP
from houv_tpu.models.voxelnet import Asymm3DSpconv, ResContextBlock, ResBlock
from houv_tpu.ops.sparse_conv import (
    build_lookup,
    from_point_voxels,
    masked_max,
)
from houv_tpu.ops.voxel import voxel_grid_indices

Array = jax.Array


def make_aligned_pairs(rng: np.random.Generator, transform: np.ndarray):
    """(transform_true, transform_false) candidates per GT transform
    (reference getTransform: true = <=5° / 1e-3 perturbation, false = a
    rotation in (5°, 180°])."""
    from houv_tpu.data.mvp import random_pose_np

    pose_t = random_pose_np(rng, np.pi / 36, 0.001)
    pose_f = random_pose_np(rng, np.pi, 0.001, min_angle=np.pi / 36)
    return pose_t @ transform, pose_f @ transform


class AlignmentClassifier(nn.Module):
    """Binary alignment score for (src moved by candidate T, tgt).

    Clouds are voxelized on a shared grid with 2-channel one-hot source
    tags (+mean position); sparse conv trunk -> masked max -> logit."""

    grid_size: int = 50
    init_size: int = 32
    axis_name: str | None = None
    compute_dtype: str | None = None  # bf16 = AMP in the conv trunk

    # optional scalar side-inputs (e.g. the CD-loss gap between a rescore
    # challenger and the loss pick, solvers/rescore.py) appended to the
    # pooled feature. New parameters appear only when used, so plain
    # checkpoints stay loadable by plain models.
    n_extra: int = 0

    @nn.compact
    def __call__(self, src_moved: Array, tgt: Array,
                 train: bool = False, extra: Array | None = None) -> Array:
        b = src_moved.shape[0]
        merged = jnp.concatenate([src_moved, tgt], axis=1)  # (B, N1+N2, 3)
        tags = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.array([1.0, 0.0]),
                                 src_moved.shape[:2] + (2,)),
                jnp.broadcast_to(jnp.array([0.0, 1.0]),
                                 tgt.shape[:2] + (2,)),
            ],
            axis=1,
        )
        feats = jnp.concatenate([merged, tags], axis=-1)  # (B, N, 5)
        coords = voxel_grid_indices(merged, self.grid_size, -1.0, 1.0)
        sg = from_point_voxels(coords, feats, self.grid_size)
        lk = build_lookup(sg)
        c = self.init_size
        dt = self.compute_dtype
        sg = ResContextBlock(c, self.axis_name, dt)(sg, lk, train)
        down1, _ = ResBlock(c * 2, height_pooling=True,
                            compute_dtype=dt)(sg, lk)
        lk1 = build_lookup(down1)
        down2, _ = ResBlock(c * 4, height_pooling=True,
                            compute_dtype=dt)(down1, lk1)
        g = masked_max(down2)  # (B, 4c)
        h = nn.relu(nn.Dense(128)(g))
        logit = nn.Dense(1)(h)[..., 0]  # logits (B,) f32
        if self.n_extra:
            if extra is None:
                extra = jnp.zeros((b, self.n_extra), logit.dtype)
            # zero-init: the geometry logit is untouched until training
            # moves the side-input weights
            logit = logit + nn.Dense(
                1, kernel_init=nn.initializers.zeros,
            )(extra.astype(logit.dtype))[..., 0]
        return logit


def alignment_bce_loss(logits: Array, labels: Array) -> Array:
    """BCE-with-logits (the classifier's training loss)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class VoxAsym(nn.Module):
    """Voxel-occupancy prediction (reference vox_asym: PPmodel point MLP ->
    voxel scatter-mean -> sparse trunk -> per-voxel (2-class softmax,
    position))."""

    grid_size: int = 50
    embedding_dim: int = 64
    init_size: int = 32
    axis_name: str | None = None
    compute_dtype: str | None = None  # bf16 = AMP (heads/softmax f32)

    @nn.compact
    def __call__(self, points: Array, coords: Array, train: bool = False):
        """points (B, N, 3), coords (B, N, 3) int voxel indices ->
        (probs (B, V, 2), positions (B, V, 3), voxel_coords (B, V, 3),
        mask (B, V))."""
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        pt_fea = PointMLP((64, self.embedding_dim), relu_last=True,
                          dtype=dt)(points)
        sg = from_point_voxels(coords, pt_fea, self.grid_size)
        lk = build_lookup(sg)
        c = self.init_size
        h = ResContextBlock(c, self.axis_name, self.compute_dtype)(
            sg, lk, train)
        pred = nn.Dense(5)(h.features)  # 2 class logits + 3 position dims
        probs = jax.nn.softmax(pred[..., :2], axis=-1)
        pos = pred[..., 2:]
        return probs, pos, h.coords, h.mask
