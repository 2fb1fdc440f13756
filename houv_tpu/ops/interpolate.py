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

from houv_tpu.ops.grouping import knn_points

Array = jax.Array


def three_nn(target: Array, source: Array) -> tuple[Array, Array]:
    """For each target point, its 3 nearest source points.

    (B, N, 3) × (B, M, 3) -> (dist (B, N, 3), idx (B, N, 3) int32).
    dist is the actual (non-squared) euclidean distance like the CUDA op.
    """
    # knn_points auto-dispatches to the blockwise Pallas kernel at large
    # volumes — lax.top_k lowers to a full stable SORT of every row on TPU
    # (measured 28 ms at (16, 3072, 1536) in the vrcnet_knn decoder, the
    # single largest op in the champion train step). The unused distance
    # output is dead-code-eliminated; distances are recomputed exactly
    # below either way.
    _, idx = knn_points(target, source, 3)
    idx = idx.astype(jnp.int32)
    # Recompute the 3 selected distances directly: the a²+b²-2ab form has a
    # ~1e-6 cancellation floor that corrupts inverse-distance weights at
    # coincident points; the direct form is exact there.
    # Row-index per batch: the VJP scatters into (B, M, 3). (The previous
    # broadcast + take_along_axis(axis=2) form made XLA materialize the
    # full (B, N, M, 3) broadcast in its backward — a 900 MB scatter at
    # champion decoder shapes, ~12 ms/step.)
    gathered = jax.vmap(lambda s, i: s[i])(source, idx)  # (B, N, 3, 3)
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
