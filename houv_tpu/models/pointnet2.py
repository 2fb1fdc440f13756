"""PointNet++ set-abstraction / feature-propagation modules + samplers (flax).

Replaces utils/mm3d_pn2/ops/pointnet_modules/*.py (PointSAModule(MSG) /
PointFPModule — commented out of the reference's package exports but part
of its component inventory) and ops/furthest_point_sample/points_sampler.py
(multi-strategy D-FPS / F-FPS / random sampler).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from houv_tpu.models.common import PointMLP
from houv_tpu.ops.chamfer import pairwise_sqdist
from houv_tpu.ops.grouping import query_and_group
from houv_tpu.ops.interpolate import three_interpolate, three_nn_upsampling
from houv_tpu.ops.sampling import (
    furthest_point_sample,
    furthest_point_sample_with_dist,
)

Array = jax.Array


def points_sampler(points: Array, num: int, strategy: str = "d-fps",
                   features: Array | None = None,
                   key: Array | None = None) -> Array:
    """Multi-strategy sampling indices (reference points_sampler.py):
    'd-fps' (euclidean FPS), 'f-fps' (feature-distance FPS), 'random'."""
    if strategy == "d-fps":
        return furthest_point_sample(points, num)
    if strategy == "f-fps":
        feats = points if features is None else jnp.concatenate(
            [points, features], axis=-1
        )
        dist = pairwise_sqdist(feats, feats)
        return furthest_point_sample_with_dist(dist, num)
    if strategy == "random":
        if key is None:
            raise ValueError("random strategy needs a PRNG key")
        b, n, _ = points.shape
        return jax.vmap(
            lambda k: jax.random.choice(k, n, (num,), replace=False)
        )(jax.random.split(key, b)).astype(jnp.int32)
    raise ValueError(f"unknown strategy {strategy!r}")


class PointSAModule(nn.Module):
    """Set abstraction: sample centers, group neighborhoods (ball query or
    kNN), per-group MLP, max-pool. Multi-scale grouping via parallel radii
    (the MSG variant). Features-last layout.

    Returns (new_xyz (B, npoint, 3), new_features (B, npoint, sum(C_out)))."""

    npoint: int
    radii: Sequence[float | None] = (0.2,)
    nsamples: Sequence[int] = (32,)
    mlps: Sequence[Sequence[int]] = ((64, 64, 128),)
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz: Array, features: Array | None = None,
                 train: bool = False):
        idx = furthest_point_sample(xyz, self.npoint)
        new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        feats_cm = None if features is None else jnp.swapaxes(features, 1, 2)
        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            grouped = query_and_group(
                xyz, new_xyz, feats_cm, nsample=nsample,
                max_radius=radius, use_xyz=self.use_xyz,
            )  # (B, C, npoint, nsample)
            h = jnp.transpose(grouped, (0, 2, 3, 1))  # (B, npoint, ns, C)
            h = PointMLP(tuple(mlp), relu_last=True)(h)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointFPModule(nn.Module):
    """Feature propagation: three-NN inverse-distance upsampling + unit MLP
    (the reference's PointFPModule)."""

    mlp: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, target_xyz: Array, source_xyz: Array,
                 target_feats: Array | None, source_feats: Array,
                 train: bool = False) -> Array:
        idx, w = three_nn_upsampling(target_xyz, source_xyz)
        up = jnp.swapaxes(
            three_interpolate(jnp.swapaxes(source_feats, 1, 2), idx, w), 1, 2
        )  # (B, N_target, C)
        if target_feats is not None:
            up = jnp.concatenate([target_feats, up], axis=-1)
        return PointMLP(tuple(self.mlp), relu_last=True)(up)
