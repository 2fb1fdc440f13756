"""Bisect vrcnet_knn's compile time + HBM temporaries per submodule
(VERDICT r2 #2 / NEXT_ROUND #3: 12.5-min compile, B=16 OOM at 25.1G).

AOT-compiles fwd+bwd of each piece at the full shapes and prints compile
seconds + XLA memory analysis. Usage:
  python scripts/bisect_vrcnet.py [batch] [part ...]
Parts: encoder voxel sasknn decoder fps cd full
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax  # noqa: F401

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PARTS = sys.argv[2:] or ["encoder", "voxel", "sasknn", "fps", "cd",
                         "decoder", "full"]

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, 2048, 3), jnp.float32) * 0.3
gt = jax.random.normal(jax.random.fold_in(key, 1), (B, 2048, 3)) * 0.3
label = jnp.zeros((B,), jnp.int32)


def report(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    try:
        m = compiled.memory_analysis()
        mem = (f"temp={m.temp_size_in_bytes/2**30:.2f}G "
               f"arg={m.argument_size_in_bytes/2**30:.2f}G "
               f"code={m.generated_code_size_in_bytes/2**20:.0f}M")
    except Exception as e:
        mem = f"(mem analysis failed: {e})"
    # timed execution (host-read sync; tunnel-safe)
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])
    sync(compiled(*args))
    te0 = time.perf_counter()
    for _ in range(3):
        out = compiled(*args)
    sync(out)
    ms = (time.perf_counter() - te0) / 3 * 1e3
    print(f"{name:10s} trace {t1-t0:6.1f}s  compile {t2-t1:6.1f}s  "
          f"exec {ms:7.1f}ms  {mem}", flush=True)


def grad_of(loss_fn, params):
    return jax.grad(lambda p: loss_fn(p))(params)


if "encoder" in PARTS:
    from houv_tpu.models.pcn import PCNEncoderLabel

    enc = PCNEncoderLabel(1024)
    p = jax.jit(enc.init)(key, x, label)["params"]

    def f(p):
        feat, pf = enc.apply({"params": p}, x, label)
        return (feat ** 2).sum() + (pf ** 2).sum()

    report("encoder", lambda p: jax.grad(f)(p), p)

if "voxel" in PARTS:
    from houv_tpu.models.voxelnet import Asymm3DSpconv
    from houv_tpu.ops.voxel import voxel_grid_indices

    coords = voxel_grid_indices(x, 50)
    pf = jax.random.normal(key, (B, 2048, 1024), jnp.float32)
    vox = Asymm3DSpconv(128, 50)
    vars_ = jax.jit(lambda k, c, f: vox.init(k, c, f, train=True))(key, coords, pf)

    def f(p):
        out, _ = vox.apply(
            {"params": p, "batch_stats": vars_.get("batch_stats", {})},
            coords, pf, train=True, mutable=["batch_stats"],
        )
        return (out ** 2).sum()

    report("voxel", lambda p: jax.grad(f)(p), vars_["params"])

if "sasknn" in PARTS:
    from houv_tpu.models.vrcnet import SASKNResEncoder

    pts = jax.random.normal(key, (B, 3072, 3), jnp.float32) * 0.3
    enc = SASKNResEncoder(ks=(16,), pk=10, output_size=256,
                          layers=(1, 1, 1, 1),
                          pts_num=(3072, 1536, 768, 384))
    p = jax.jit(lambda r, q: enc.init(r, q, True))({"params": key, "dropout": key}, pts)["params"]

    def f(p):
        out = enc.apply({"params": p}, pts, True,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        return (out ** 2).sum()

    report("sasknn", lambda p: jax.grad(f)(p), p)

if "fps" in PARTS:
    from houv_tpu.ops.sampling import furthest_point_sample

    fine = jax.random.normal(key, (B, 3072, 3), jnp.float32)

    def f(fine):
        return furthest_point_sample(fine, 2048).sum()

    report("fps", f, fine)

if "cd" in PARTS:
    from houv_tpu.metrics import calc_cd

    fine = jax.random.normal(key, (B, 3072, 3), jnp.float32)

    def f(fine):
        l1, _ = calc_cd(fine, gt)
        return l1.sum()

    report("cd", lambda fine: jax.grad(f)(fine), fine)

if "decoder" in PARTS:
    from houv_tpu.models.vrcnet_knn import KNNDecoder

    gfeat = jax.random.normal(key, (B, 2048), jnp.float32)
    dec = KNNDecoder(2048, 1024, 3072, (1, 1, 1, 1), (16,), 10)
    p = jax.jit(lambda r, g, q: dec.init(r, g, q, True))({"params": key, "dropout": key}, gfeat, x)["params"]

    def f(p):
        c, fi, na = dec.apply({"params": p}, gfeat, x, True,
                              rngs={"dropout": jax.random.PRNGKey(1)})
        return (c ** 2).sum() + (fi ** 2).sum() + (na ** 2).sum()

    report("decoder", lambda p: jax.grad(f)(p), p)

if "full" in PARTS:
    from houv_tpu.models import get_model
    from houv_tpu.ops.voxel import voxel_grid_indices

    model = get_model(
        "vrcnet_knn", num_native=2048, num_coarse=1024, num_fine=3072,
        feature_size=2048, layers=(1, 1, 1, 1), knn_list=(16,), pk=10,
    )
    coords = voxel_grid_indices(x, 50)
    rngs = {"params": key, "dropout": jax.random.fold_in(key, 9)}
    variables = jax.jit(lambda r, a, b, l, c: model.init(
        r, a, b, label=l, coords=c, prefix="train"))(rngs, x, gt, label, coords)

    def f(p):
        out, _ = model.apply(
            {"params": p,
             "batch_stats": variables.get("batch_stats", {})},
            x, gt, label=label, coords=coords,
            prefix="train", rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return out["total_loss"]

    report("full", lambda p: jax.grad(f)(p), variables["params"])
