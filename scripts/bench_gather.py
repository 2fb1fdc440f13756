"""Microbenchmark: row-gather strategies for the HOUV step (VERDICT r2 #1).

The solver's _objective_gather does two XLA row gathers per step:
  tg    = take_along_axis(tgt_r (B·K, M, 3),  i2 (B·K, N)[...,None], axis=1)
  s_sel = take_along_axis(src_rep (B·K, N, 3), i1 (B·K, M)[...,None], axis=1)
each profiled at ~14.6 ms (B·K=1024, N=M=2048). This measures alternatives.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, K, N, M = 16, 64, 2048, 2048
BK = B * K


def timed(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        # tunnel sync: force a host read
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
tgt = jax.random.normal(k1, (B, M, 3), jnp.float32)
i2 = jax.random.randint(k2, (BK, N), 0, M, jnp.int32)
i2_bk = i2.reshape(B, K, N)


@jax.jit
def current(tgt, i2):
    tgt_r = jnp.broadcast_to(tgt[:, None], (B, K, M, 3)).reshape(BK, M, 3)
    return jnp.take_along_axis(tgt_r, i2[..., None], axis=1)


@jax.jit
def reshaped(tgt, i2_bk):
    # one batch dim = pair; K·N indices gather from the SAME (M, 3) table
    idx = i2_bk.reshape(B, K * N)
    return jnp.take_along_axis(tgt, idx[..., None], axis=1)


@jax.jit
def vmap_take(tgt, i2_bk):
    idx = i2_bk.reshape(B, K * N)
    return jax.vmap(lambda t, i: t[i])(tgt, idx)


@jax.jit
def padded8(tgt, i2):
    tgt8 = jnp.pad(tgt, ((0, 0), (0, 0), (0, 5)))
    tgt_r = jnp.broadcast_to(tgt8[:, None], (B, K, M, 8)).reshape(BK, M, 8)
    return jnp.take_along_axis(tgt_r, i2[..., None], axis=1)[..., :3]


@jax.jit
def onehot_bf16(tgt, i2_bk):
    # (B, K·N, M) one-hot (fused iota-compare) @ (B, M, 3) on the MXU
    idx = i2_bk.reshape(B, K * N)
    oh = (idx[..., None] == jnp.arange(M)[None, None, :]).astype(jnp.bfloat16)
    return jnp.einsum("bnm,bmc->bnc", oh, tgt.astype(jnp.bfloat16))


@jax.jit
def onehot_f32(tgt, i2_bk):
    idx = i2_bk.reshape(B, K * N)
    oh = (idx[..., None] == jnp.arange(M)[None, None, :]).astype(jnp.float32)
    return jnp.einsum("bnm,bmc->bnc", oh, tgt)


@jax.jit
def gather_lax_batched(tgt, i2_bk):
    # lax.gather with explicit operand batching dims
    idx = i2_bk.reshape(B, K * N)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    out = jax.lax.gather(
        tgt, idx[..., None], dnums, slice_sizes=(1, 1, 3),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return out


@jax.jit
def take_axis0_flat(tgt, i2_bk):
    # flatten batch into the index: one big (B·M, 3) table, absolute rows
    table = tgt.reshape(B * M, 3)
    absidx = i2_bk.reshape(B, K * N) + (jnp.arange(B) * M)[:, None]
    return jnp.take(table, absidx.reshape(-1), axis=0).reshape(B, K * N, 3)


@jax.jit
def take_axis0_flat8(tgt, i2_bk):
    table = jnp.pad(tgt, ((0, 0), (0, 0), (0, 5))).reshape(B * M, 8)
    absidx = i2_bk.reshape(B, K * N) + (jnp.arange(B) * M)[:, None]
    return jnp.take(table, absidx.reshape(-1), axis=0).reshape(B, K * N, 8)


@jax.jit
def dynamic_slice_sort(tgt, i2_bk):
    # sort-based gather: sort indices, segment-gather, unsort — O(n log n)
    idx = i2_bk.reshape(B, K * N)
    order = jnp.argsort(idx, axis=1)
    sorted_idx = jnp.take_along_axis(idx, order, axis=1)
    g = jnp.take_along_axis(tgt, sorted_idx[..., None], axis=1)
    inv = jnp.argsort(order, axis=1)
    return jnp.take_along_axis(g, inv[..., None], axis=1)


results = {}
for name, fn, args in [
    ("current take_along_axis (BK,M,3)", current, (tgt, i2)),
    ("reshaped (B, K*N) take_along_axis", reshaped, (tgt, i2_bk)),
    ("vmap fancy-index", vmap_take, (tgt, i2_bk)),
    ("padded to 8 lanes", padded8, (tgt, i2)),
    ("one-hot matmul bf16", onehot_bf16, (tgt, i2_bk)),
    ("one-hot matmul f32", onehot_f32, (tgt, i2_bk)),
    ("lax.gather batching dims", gather_lax_batched, (tgt, i2_bk)),
    ("flat take axis0 (absolute rows)", take_axis0_flat, (tgt, i2_bk)),
    ("flat take axis0, 8 lanes", take_axis0_flat8, (tgt, i2_bk)),
]:
    try:
        ms = timed(fn, *args)
        results[name] = ms
        print(f"{name:40s} {ms:8.2f} ms")
    except Exception as e:  # noqa
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:200]}")

# correctness spot-check vs current
ref = np.asarray(current(tgt, i2)).reshape(B, K, N, 3)
for name, fn, args in [
    ("reshaped", reshaped, (tgt, i2_bk)),
    ("onehot_f32", onehot_f32, (tgt, i2_bk)),
    ("flat", take_axis0_flat, (tgt, i2_bk)),
]:
    try:
        got = np.asarray(fn(*args)).reshape(B, K, N, -1)[..., :3]
        print(name, "max err", np.abs(got - ref).max())
    except Exception as e:
        print(name, "check failed", e)
