"""hi/lo-split one-hot matmul gather: exact f32 row gather at bf16-matmul cost."""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, K, N, M = 16, 64, 2048, 2048
BK = B * K


def timed(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
tgt = jax.random.normal(k1, (B, M, 3), jnp.float32)
i2 = jax.random.randint(k2, (B, K, N), 0, M, jnp.int32)


@jax.jit
def current(tgt, i2):
    tgt_r = jnp.broadcast_to(tgt[:, None], (B, K, M, 3)).reshape(BK, M, 3)
    return jnp.take_along_axis(
        tgt_r, i2.reshape(BK, N)[..., None], axis=1)


@jax.jit
def onehot_hilo(tgt, i2):
    idx = i2.reshape(B, K * N)
    hi = tgt.astype(jnp.bfloat16)
    lo = (tgt - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    table = jnp.concatenate([hi, lo], axis=-1)          # (B, M, 6) bf16
    oh = (idx[..., None] == jnp.arange(M)[None, None, :]).astype(jnp.bfloat16)
    out = jnp.einsum("bnm,bmc->bnc", oh, table,
                     preferred_element_type=jnp.float32)
    return out[..., :3] + out[..., 3:]                   # exact f32


@jax.jit
def onehot_hilo_flatbatch(tgt, i2):
    # same but with (B·K) batch dims like the solver's layout
    idx = i2.reshape(BK, N)
    hi = tgt.astype(jnp.bfloat16)
    lo = (tgt - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    table = jnp.concatenate([hi, lo], axis=-1)
    table_r = jnp.broadcast_to(table[:, None], (B, K, M, 6)).reshape(BK, M, 6)
    oh = (idx[..., None] == jnp.arange(M)[None, None, :]).astype(jnp.bfloat16)
    out = jnp.einsum("bnm,bmc->bnc", oh, table_r,
                     preferred_element_type=jnp.float32)
    return out[..., :3] + out[..., 3:]


ref = np.asarray(current(tgt, i2)).reshape(B, K, N, 3)
for name, fn in [
    ("current", current),
    ("onehot hi/lo (B batch)", onehot_hilo),
    ("onehot hi/lo (B*K batch)", onehot_hilo_flatbatch),
]:
    ms = timed(fn, tgt, i2)
    got = np.asarray(fn(tgt, i2)).reshape(B, K, N, 3)
    err = np.abs(got - ref).max()
    print(f"{name:30s} {ms:8.2f} ms   max err {err:.2e}")
