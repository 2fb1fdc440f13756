"""2-D image ops re-exported by the reference from mmcv — TPU-native.

The reference's op package re-exports ``nms``, ``RoIAlign`` and
``sigmoid_focal_loss`` from the external mmcv package
(utils/mm3d_pn2/ops/__init__.py:1-3). The MVP workloads never call them,
but a reference user importing the op surface gets them — so here they
are, batched jnp (nms lives in ops/boxes.py as ``nms_bev``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def sigmoid_focal_loss(logits: Array, targets: Array, gamma: float = 2.0,
                       alpha: float = 0.25, reduction: str = "mean") -> Array:
    """Focal loss for binary/one-hot targets (mmcv semantics, Lin et al.).

    logits (..., C), targets (..., C) in {0, 1} ->
    alpha-balanced FL = -alpha_t (1 - p_t)^gamma log(p_t).
    """
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))      # stable BCE-with-logits
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = alpha_t * (1 - p_t) ** gamma * ce
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def _bilinear(feat: Array, y: Array, x: Array) -> Array:
    """feat (C, H, W); y/x (...,) float coords -> (..., C) bilinear samples
    (out-of-bounds clamped like mmcv's zero-padding border behavior on the
    valid region)."""
    h, w = feat.shape[1], feat.shape[2]
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(y - y0, 0.0, 1.0)
    wx = jnp.clip(x - x0, 0.0, 1.0)
    y0i, y1i, x0i, x1i = (a.astype(jnp.int32) for a in (y0, y1, x0, x1))
    f00 = feat[:, y0i, x0i]
    f01 = feat[:, y0i, x1i]
    f10 = feat[:, y1i, x0i]
    f11 = feat[:, y1i, x1i]
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    out = top * (1 - wy) + bot * wy                  # (C, ...)
    return jnp.moveaxis(out, 0, -1)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(features: Array, rois: Array, output_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2) -> Array:
    """RoIAlign (mmcv/Mask-R-CNN ``aligned=True`` semantics).

    features (B, C, H, W); rois (R, 5) = (batch_idx, x1, y1, x2, y2) in
    input coordinates -> (R, C, output_size, output_size). Each output bin
    averages ``sampling_ratio²`` bilinear samples at the aligned
    (half-pixel-shifted) grid positions.
    """
    out = output_size
    sr = sampling_ratio

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        x1, y1, x2, y2 = roi[1] * spatial_scale, roi[2] * spatial_scale, \
            roi[3] * spatial_scale, roi[4] * spatial_scale
        # aligned=True: shift by half a pixel
        x1, y1, x2, y2 = x1 - 0.5, y1 - 0.5, x2 - 0.5, y2 - 0.5
        bw = jnp.maximum(x2 - x1, 1e-6) / out
        bh = jnp.maximum(y2 - y1, 1e-6) / out
        iy = (jnp.arange(out)[:, None, None, None]
              + (jnp.arange(sr)[None, :, None, None] + 0.5) / sr)
        ix = (jnp.arange(out)[None, None, :, None]
              + (jnp.arange(sr)[None, None, None, :] + 0.5) / sr)
        ys = y1 + iy * bh                             # (out, sr, 1, 1)
        xs = x1 + ix * bw                             # (1, 1, out, sr)
        ys = jnp.broadcast_to(ys, (out, sr, out, sr))
        xs = jnp.broadcast_to(xs, (out, sr, out, sr))
        samples = _bilinear(features[b], ys, xs)      # (out, sr, out, sr, C)
        return jnp.moveaxis(samples.mean(axis=(1, 3)), -1, 0)

    return jax.vmap(one_roi)(rois.astype(jnp.float32))
