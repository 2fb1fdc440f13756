"""EMD loss wrapper (reference completion/model_utils.py:82-88)."""

from __future__ import annotations

import jax

from houv_tpu.ops.emd import emd_auction

Array = jax.Array
import jax.numpy as jnp


def calc_emd(
    output: Array, gt: Array, eps: float = 0.005, iterations: int = 50
) -> Array:
    """Mean L2 matched distance: sqrt of auction-EMD squared distances,
    averaged per cloud. Train default eps/iters 0.005/50; eval uses
    0.002/10000 (reference utils/metrics/EMD/README.md:8)."""
    # optimization_barrier: keeps XLA from fusing the model's bf16 matmul
    # converts into the EMD program — a TPU fusion pass Check-fails on the
    # combined graph at larger batches (fusion_util.cc TransformWindow)
    output, gt = jax.lax.optimization_barrier((output, gt))
    dist, _ = emd_auction(output, gt, eps, iterations)
    return jnp.sqrt(dist).mean(axis=-1)
