"""Device-mesh parallelism layer.

Replaces ALL of the reference's multi-device machinery (SURVEY.md §2.8):

- ``torch.nn.DataParallel`` replication (registration/train.py:65,
  completion/train.py:58) -> data-parallel sharding over a ``Mesh`` with
  psum gradient reduction inside one jit-compiled step,
- the 4-process CUDA_VISIBLE_DEVICES index-shard sweep with sleep-600
  filesystem rendezvous (registration/run_test.sh:6-23,
  registration/test_mult.py:83-125) -> a single ``shard_map`` over the
  pair axis; the "combine" step is just the unsharded output,
- NaiveSyncBatchNorm's all_gather (utils/mm3d_pn2/ops/norm.py:9-24) ->
  ``psum`` batch stats (see houv_tpu.models.common.BatchNorm).

Collectives ride ICI via XLA; multi-host extends the same mesh over DCN via
jax.distributed initialization — no NCCL/MPI code anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from houv_tpu.solvers.houv import HOUVConfig, houv_solve

Array = jax.Array


def make_mesh(n_devices: int | None = None, axis: str = "data",
              devices=None) -> Mesh:
    """A 1-D mesh over the pair/batch axis — the natural parallel dimension
    of the MVP workloads (2000 independent registration pairs, 59800
    completion clouds)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays with the leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), batch
    )


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree
    )


def sharded_houv_solve(
    src: Array,
    tgt: Array,
    key: Array,
    mesh: Mesh,
    cfg: HOUVConfig = HOUVConfig(),
    axis: str = "data",
):
    """The entire run_test.sh choreography as one SPMD program.

    src/tgt: (B, N, 3) with B divisible by mesh width. Each device solves its
    pair shard with an independent PRNG fold; outputs come back sharded and
    XLA reassembles them — no .npy shards, no sleep, no combine pass.
    """
    n_dev = mesh.shape[axis]
    if src.shape[0] % n_dev:
        raise ValueError(
            f"batch {src.shape[0]} not divisible by mesh width {n_dev}"
        )

    def local_solve(src_l, tgt_l, key_l):
        my_key = jax.random.fold_in(key_l[0], jax.lax.axis_index(axis))
        out = houv_solve(src_l, tgt_l, my_key, cfg)
        # n_retry is a per-shard scalar -> global sum for observability.
        n_retry = jax.lax.psum(out["n_retry"], axis)
        return out["transform"], out["rmse"], n_retry

    fn = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P()),
    )
    keys = jnp.broadcast_to(key, (1,) + key.shape)
    transform, rmse, n_retry = jax.jit(fn)(src, tgt, keys)
    return {"transform": transform, "rmse": rmse, "n_retry": n_retry}


def make_mesh_2d(n_data: int, n_restart: int, devices=None) -> Mesh:
    """2-D mesh for the HOUV sweep: pairs shard over 'data', the kernel
    (restart) axis shards over 'restart' — the TPU analogue of model
    parallelism for an optimization-as-inference workload: each device owns
    kernel/n_restart optimization replicas of its pair shard."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_data * n_restart]).reshape(
        n_data, n_restart
    )
    return Mesh(devices, ("data", "restart"))


def sharded_houv_solve_2d(
    src: Array,
    tgt: Array,
    key: Array,
    mesh: Mesh,
    cfg: HOUVConfig = HOUVConfig(),
):
    """HOUV sweep over a (data, restart) mesh.

    Each device optimizes kernel/n_restart restarts of B/n_data pairs.
    Retry semantics match the 1-D path exactly: after the base pass, the
    >threshold retry mask is computed from the CROSS-SHARD best (pmin over
    'restart') — a pair already solved by any restart shard never triggers
    extra passes on the others, so pass counts and n_retry are identical
    to the unsharded solver (reference's single retry list,
    train_utils.py:493-513). Final best-restart selection is a pmin +
    owner-masked psum (replaces the host-side topk, :536-544)."""
    from houv_tpu.solvers.houv import (
        _best_restart,
        houv_pass,
        init_params,
        rt_to_transformation,
        voxel_downsample_clouds,
    )

    src, tgt = voxel_downsample_clouds(src, tgt, cfg)
    n_data = mesh.shape["data"]
    n_restart = mesh.shape["restart"]
    if src.shape[0] % n_data:
        raise ValueError(
            f"batch {src.shape[0]} not divisible by data axis {n_data}"
        )
    if cfg.kernel % n_restart:
        raise ValueError(
            f"kernel {cfg.kernel} not divisible by restart axis {n_restart}"
        )
    if cfg.two_bracket and n_restart > 1:
        raise NotImplementedError(
            "two_bracket splits the restart axis itself — use the 1-D mesh"
        )
    if cfg.window_select != "loss" and n_restart > 1:
        raise NotImplementedError(
            "window_select='consensus' counts agreement across the FULL "
            "restart axis — use the 1-D mesh (pairs-only sharding)"
        )
    local_cfg = dataclasses_replace_kernel(cfg, cfg.kernel // n_restart)

    def local_solve(src_l, tgt_l, key_l):
        di = jax.lax.axis_index("data")
        ri = jax.lax.axis_index("restart")
        my_key = jax.random.fold_in(key_l[0], di)
        # Initialize the FULL kernel-wide parameter set (identical to what
        # a 1-D data shard would draw) and slice this shard's restart rows:
        # the 26-axis lattice is PARTITIONED across restart shards instead
        # of duplicated (duplication re-optimized lattice axes 0..lk n_r
        # times and never tried the rest). n_restart=1 degenerates to the
        # 1-D initialization bit-for-bit.
        params_full = init_params(
            my_key, src_l.shape[0], cfg.kernel,
            cfg.lattice_init, cfg.two_bracket
        )
        lk = local_cfg.kernel
        params0 = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, ri * lk, lk, axis=1),
            params_full,
        )
        min_1, r, t = houv_pass(src_l, tgt_l, params0, 0, local_cfg)
        lb, _ = _best_restart(min_1, local_cfg)        # (Bl,) local best
        best = jax.lax.pmin(lb, "restart")             # cross-shard best
        if cfg.retry_mode == "always":
            need = jnp.ones_like(best, bool)
        else:
            need = best > cfg.retry_threshold
        # identical across restart shards -> count pairs over 'data' only
        n_retry = jax.lax.psum(jnp.sum(need), "data")

        def retry_pass(carry, angle_base):
            min_1, r, t, best = carry

            def run(_):
                m2, r2, t2 = houv_pass(
                    src_l, tgt_l, params0, angle_base, local_cfg
                )
                lb2, _ = _best_restart(m2, local_cfg)
                best2 = jax.lax.pmin(lb2, "restart")
                improved = jnp.logical_and(need, best2 < best)
                # the merge decision is global; every shard swaps its own
                # slice of the restart row — exactly the 1-D jnp.where
                m = jnp.where(improved[:, None], m2, min_1)
                rr = jnp.where(improved[:, None, None, None], r2, r)
                tt = jnp.where(improved[:, None, None], t2, t)
                b = jnp.where(improved, best2, best)
                return m, rr, tt, b

            return jax.lax.cond(
                jnp.any(need), run, lambda _: (min_1, r, t, best), None
            ), None

        if cfg.angle_passes > 1:
            bases = jnp.arange(1, cfg.angle_passes, dtype=jnp.float32)
            (min_1, r, t, best), _ = jax.lax.scan(
                retry_pass, (min_1, r, t, best), bases
            )

        lv, li = _best_restart(min_1, local_cfg)
        r_best = jnp.take_along_axis(
            r, li[:, None, None, None], axis=1
        )[:, 0]
        t_best = jnp.take_along_axis(t, li[:, None, None], axis=1)[:, 0]
        tf = rt_to_transformation(r_best, t_best)
        is_best = lv <= best
        # Break ties toward the lowest restart-shard index.
        owner = jax.lax.pmin(
            jnp.where(is_best, ri, jnp.int32(2**30)), "restart"
        )
        mine = (owner == ri)[:, None, None]
        tf_global = jax.lax.psum(jnp.where(mine, tf, 0.0), "restart")
        return tf_global, best, n_retry

    fn = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=(P("data"), P("data"), P()),
        check_rep=False,
    )
    keys = jnp.broadcast_to(key, (1,) + key.shape)
    transform, rmse, n_retry = jax.jit(fn)(src, tgt, keys)
    return {"transform": transform, "rmse": rmse, "n_retry": n_retry}


def dataclasses_replace_kernel(cfg: HOUVConfig, kernel: int) -> HOUVConfig:
    import dataclasses

    return dataclasses.replace(cfg, kernel=kernel)


def data_parallel_grads(loss_fn, params, batch, axis: str = "data"):
    """Per-shard grads + psum-mean — the inside of a DP train step under
    shard_map. Returns (loss, grads), both psum-averaged over the mesh."""
    loss, grads = jax.value_and_grad(loss_fn)(params, batch)
    loss = jax.lax.pmean(loss, axis)
    grads = jax.lax.pmean(grads, axis)
    return loss, grads
