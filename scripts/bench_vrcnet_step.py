"""A/B the vrcnet_knn train step on the real chip.

Variants: voxel-branch conv remat on/off, batch size, and (implicitly)
the banded match conv now used by every factorized submanifold conv on
TPU (ops/sparse_conv.py _banded_match_subm).

Usage: python scripts/bench_vrcnet_step.py [B] [conv_remat:0|1] [steps]
Prints compile time and steady-state ms/step + clouds/s.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from houv_tpu.models import get_model
from houv_tpu.ops.voxel import voxel_grid_indices
from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _sync(x) -> float:
    return float(jnp.asarray(x).ravel()[0])


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    conv_remat = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    compute_dtype = sys.argv[4] if len(sys.argv) > 4 else None
    sa_remat = bool(int(sys.argv[5])) if len(sys.argv) > 5 else True
    fused_cd = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False

    model = get_model(
        "vrcnet_knn", num_native=2048, num_coarse=1024, num_fine=3072,
        feature_size=2048, layers=(1, 1, 1, 1), knn_list=(16,), pk=10,
        remat=sa_remat, voxel_conv_remat=conv_remat,
        compute_dtype=compute_dtype, fused_cd=fused_cd,
    )
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (bsz, 2048, 3), jnp.float32) * 0.3
    gt = jax.random.normal(jax.random.fold_in(key, 1), (bsz, 2048, 3)) * 0.3
    label = jnp.zeros((bsz,), jnp.int32)
    coords = voxel_grid_indices(x, 50)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    t0 = time.perf_counter()
    variables = jax.jit(
        lambda: model.init(rngs, x, gt, label=label, coords=coords,
                           prefix="train")
    )()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x, gt, label=label, coords=coords, prefix="train",
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"],
            )
            return out["total_loss"]

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state)
    _sync(loss)
    print(f"first step (incl. compile) {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
    _sync(loss)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    print(f"B={bsz} conv_remat={conv_remat} sa_remat={sa_remat} "
          f"fused_cd={fused_cd} "
          f"dtype={compute_dtype or 'f32'}: {ms:.0f} ms/step "
          f"= {bsz / (ms / 1e3):.1f} clouds/s (loss {_sync(loss):.4f})",
          flush=True)


if __name__ == "__main__":
    main()
