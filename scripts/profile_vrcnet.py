"""Op-level profile of the vrcnet_knn champion train step.

Traces a few steady-state steps with jax.profiler, then aggregates the
device-track events from the perfetto trace json and prints the top ops
by total time. Directs kernel-level optimization without TensorBoard.

Usage: python scripts/profile_vrcnet.py [B] [trace_dir]
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
from trace_agg import aggregate_trace

enable_compilation_cache()


def _sync(x) -> float:
    return float(jnp.asarray(x).ravel()[0])


def build_step(bsz):
    # champion settings (bench.py / cfgs/vrcnet_knn.yaml): remat off, bf16
    model = get_model(
        "vrcnet_knn", num_native=2048, num_coarse=1024, num_fine=3072,
        feature_size=2048, layers=(1, 1, 1, 1), knn_list=(16,), pk=10,
        remat=False, compute_dtype="bfloat16",
    )
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (bsz, 2048, 3), jnp.float32) * 0.3
    gt = jax.random.normal(jax.random.fold_in(key, 1), (bsz, 2048, 3)) * 0.3
    label = jnp.zeros((bsz,), jnp.int32)
    coords = voxel_grid_indices(x, 50)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jax.jit(
        lambda: model.init(rngs, x, gt, label=label, coords=coords,
                           prefix="train")
    )()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x, gt, label=label, coords=coords,
                prefix="train", rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"],
            )
            return out["total_loss"]

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    return step, params, opt_state


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vrc_trace"
    step, params, opt_state = build_step(bsz)
    params, opt_state, loss = step(params, opt_state)
    _sync(loss)
    t0 = time.perf_counter()
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state)
    _sync(loss)
    print(f"steady state {(time.perf_counter() - t0) / 3 * 1e3:.0f} ms/step",
          flush=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state)
        _sync(loss)
    aggregate_trace(trace_dir)


if __name__ == "__main__":
    main()
