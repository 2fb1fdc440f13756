"""A/B mixed-precision (compute_dtype=bfloat16) vs f32 train steps on chip.

Covers the two models the round-3 notes flagged as unmeasured under AMP:
DCP (reference registration/models/dcp.py) and PCN
(reference completion/models/pcn.py). Params, losses, and the SVD head
stay f32 in both; only layer compute switches.

Usage: python scripts/bench_amp_models.py [steps]
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
from houv_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _sync(x) -> float:
    return float(jnp.asarray(x).ravel()[0])


def bench_dcp(compute_dtype, n_steps):
    model = get_model("dcp", compute_dtype=compute_dtype)
    key = jax.random.PRNGKey(0)
    bsz = 8
    src = jax.random.normal(key, (bsz, 2048, 3), jnp.float32) * 0.3
    tgt = jax.random.normal(jax.random.fold_in(key, 1), (bsz, 2048, 3)) * 0.3
    t_gt = jnp.tile(jnp.eye(4), (bsz, 1, 1))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), src, tgt, t_gt,
                           prefix="train", train=True)
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
                src, tgt, t_gt, prefix="train", train=True,
                mutable=["batch_stats"],
            )
            return out["loss"]

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    params, opt_state, loss = step(params, opt_state)
    _sync(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
    _sync(loss)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    print(f"dcp  B={bsz} dtype={compute_dtype or 'f32'}: {ms:.0f} ms/step "
          f"(loss {_sync(loss):.4f})", flush=True)


def bench_pcn(compute_dtype, n_steps):
    model = get_model("pcn", num_points=2048, num_coarse=1024,
                      compute_dtype=compute_dtype)
    key = jax.random.PRNGKey(3)
    bsz = 32
    x = jax.random.normal(key, (bsz, 2048, 3), jnp.float32)
    gt = jax.random.normal(jax.random.fold_in(key, 1), (bsz, 2048, 3))
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, gt, "train", 0.5)
    )()["params"]
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return model.apply({"params": p}, x, gt, "train", 0.5)[
                "total_loss"]

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    params, opt_state, loss = step(params, opt_state)
    _sync(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
    _sync(loss)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    print(f"pcn  B={bsz} dtype={compute_dtype or 'f32'}: {ms:.1f} ms/step "
          f"= {bsz / (ms / 1e3):.0f} clouds/s (loss {_sync(loss):.4f})",
          flush=True)


def bench_ecg(compute_dtype, n_steps):
    model = get_model("ecg", compute_dtype=compute_dtype)
    key = jax.random.PRNGKey(7)
    bsz = 16
    x = jax.random.normal(key, (bsz, 2048, 3), jnp.float32) * 0.3
    gt = jax.random.normal(jax.random.fold_in(key, 1), (bsz, 2048, 3)) * 0.3
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, gt, "train", 0.5)
    )()["params"]
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return model.apply({"params": p}, x, gt, "train", 0.5)[
                "total_loss"]

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    params, opt_state, loss = step(params, opt_state)
    _sync(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
    _sync(loss)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    print(f"ecg  B={bsz} dtype={compute_dtype or 'f32'}: {ms:.0f} ms/step "
          f"= {bsz / (ms / 1e3):.0f} clouds/s (loss {_sync(loss):.4f})",
          flush=True)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    models = sys.argv[2:] or ["pcn", "dcp", "ecg"]
    for name in models:
        fn = {"pcn": bench_pcn, "dcp": bench_dcp, "ecg": bench_ecg}[name]
        for dt in (None, "bfloat16"):
            fn(dt, n_steps)


if __name__ == "__main__":
    main()
