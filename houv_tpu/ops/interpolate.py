"""3-NN search + inverse-distance-weighted interpolation — TPU-native.

Replacement for the reference CUDA ops
(utils/mm3d_pn2/ops/interpolate/src/{three_nn_cuda.cu,three_interpolate_cuda.cu}
and wrappers three_nn.py / three_interpolate.py). Implemented as blockwise
distances + top_k and a differentiable weighted gather (the gather's
transpose is exactly the scatter-add of three_interpolate_grad_kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from houv_tpu.ops.chamfer import pairwise_sqdist

Array = jax.Array


def three_nn(target: Array, source: Array) -> tuple[Array, Array]:
    """For each target point, its 3 nearest source points.

    (B, N, 3) × (B, M, 3) -> (dist (B, N, 3), idx (B, N, 3) int32).
    dist is the actual (non-squared) euclidean distance like the CUDA op.
    """
    d2 = pairwise_sqdist(target, source)
    _, idx = jax.lax.top_k(-d2, 3)
    idx = idx.astype(jnp.int32)
    # Recompute the 3 selected distances directly: the a²+b²-2ab form has a
    # ~1e-6 cancellation floor that corrupts inverse-distance weights at
    # coincident points; the direct form is exact there.
    bsz, n, _ = target.shape
    gathered = jnp.take_along_axis(
        jnp.broadcast_to(source[:, None, :, :], (bsz, n, source.shape[1], 3)),
        idx[..., None],
        axis=2,
    )  # (B, N, 3, 3)
    diff = target[:, :, None, :] - gathered
    # Floored sqrt: FPS-derived upsampling targets coincide with sources
    # exactly (d = 0), where sqrt's gradient is inf -> NaNs in training.
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))
    return dist, idx


def three_interpolate(features: Array, idx: Array, weight: Array) -> Array:
    """Weighted sum of 3 gathered source features.

    features (B, C, M), idx (B, N, 3), weight (B, N, 3) -> (B, C, N).
    Differentiable in features and weight.
    """
    bsz, c, _ = features.shape
    n = idx.shape[1]
    gathered = jnp.take_along_axis(
        features, idx.reshape(bsz, 1, n * 3), axis=2
    ).reshape(bsz, c, n, 3)
    return jnp.sum(gathered * weight[:, None, :, :], axis=-1)


def three_nn_upsampling(target: Array, source: Array) -> tuple[Array, Array]:
    """idx + normalized inverse-distance weights for feature upsampling
    (reference completion/model_utils.py:307-314, dist clamped at 1e-10)."""
    dist, idx = three_nn(target, source)
    dist = jnp.maximum(dist, 1e-10)
    inv = 1.0 / dist
    weight = inv / jnp.sum(inv, axis=2, keepdims=True)
    return idx, weight
