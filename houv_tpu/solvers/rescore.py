"""Classifier-rescored restart selection for the HOUV solver.

Closes the loop the reference opened with its alignment-quality classifier
(registration/models/spconv.py trained by train_model.py / train_aligned.py
on MVP_RG_Aligned candidate pairs, dataset.py:481-639): the classifier was
built to score whether a candidate transform aligns a pair, but the
reference never wires it back into the solver. Here it becomes a selection
stage: the per-restart diagnostic (BENCH_NOTES r3) showed that on
plane-symmetric objects every failing pair HAS a restart within a few
degrees of ground truth — the truncated-CD loss just prefers an impostor
optimum (a 50%+ loss gap in the impostor's favor), so no CD-derived rule
can pick it. A learned, geometry-based score is the remaining signal.

Pipeline (host-driven, built on the chunked solver segments):

1. run the usual angle-window passes, keeping EVERY restart's (loss, R, T)
   — not just the argmin,
2. ``extract_candidates``: per pair, greedily take the ``n_cand``
   lowest-loss restarts that are pairwise ≥ ``angle_deg`` apart (geodesic)
   — rotation-NMS, so a candidate list spans distinct optima instead of
   64 copies of one basin,
3. score each candidate with the alignment classifier
   (models/alignment.py:AlignmentClassifier on the src-moved-by-candidate /
   tgt overlay),
4. pick: candidate 0 is the loss choice (reference semantics); another
   candidate wins only when its logit beats candidate 0's by ``margin``.
   margin=+inf degenerates to the reference selection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from houv_tpu.geometry.rotations import rt_to_transformation
from houv_tpu.solvers.houv import (
    HOUVConfig,
    _best_restart,
    chunked_pass,
    init_params,
    voxel_downsample_clouds,
)

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("n_cand",))
def extract_candidates(pool_loss: Array, pool_r: Array, pool_t: Array,
                       n_cand: int = 8, angle_deg: float = 10.0):
    """Greedy rotation-diverse top-k restarts per pair.

    pool_loss (B, P) — +inf marks masked slots (windows a pair never ran);
    pool_r (B, P, 3, 3); pool_t (B, P, 3). Returns
    (cand_loss (B, C), cand_r (B, C, 3, 3), cand_t (B, C, 3)) in ascending
    loss order of the picks; candidate 0 is always the pool loss-argmin
    (the reference's selection). When fewer than ``n_cand`` restarts are
    ≥ ``angle_deg`` apart the tail repeats the best candidate (harmless:
    duplicates score identically and argmax keeps the first).
    """
    cos_thresh = jnp.cos(jnp.radians(jnp.float32(angle_deg)))

    def per_pair(loss, rk, tk):
        order = jnp.argsort(loss)
        loss_s = loss[order]
        r_s = rk[order]
        t_s = tk[order]
        excluded = ~jnp.isfinite(loss_s)

        def body(c, state):
            excluded, idxs = state
            i = jnp.argmax(~excluded)  # first available in loss order
            idxs = idxs.at[c].set(i.astype(jnp.int32))
            tr = jnp.einsum("kij,ij->k", r_s, r_s[i])
            cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
            # exclude everything in this pick's rotation neighborhood
            # (including the pick itself: cos(0) = 1 > threshold)
            excluded = excluded | (cos > cos_thresh)
            return excluded, idxs

        _, idxs = jax.lax.fori_loop(
            0, n_cand, body,
            (excluded, jnp.zeros((n_cand,), jnp.int32)),
        )
        return loss_s[idxs], r_s[idxs], t_s[idxs]

    return jax.vmap(per_pair)(pool_loss, pool_r, pool_t)


def apply_candidates(src: Array, cand_r: Array, cand_t: Array) -> Array:
    """src (B, N, 3) × (B, C, 3, 3)/(B, C, 3) -> (B, C, N, 3) moved clouds."""
    return (
        jnp.einsum("bnc,bkdc->bknd", src, cand_r,
                   precision=jax.lax.Precision.HIGHEST)
        + cand_t[:, :, None, :]
    )


def _tta_rotations(n: int):
    """Deterministic SO(3) test-time-augmentation set: identity + axis
    rotations (the classifier trains under joint random rotations of the
    overlay — PoolCandidateDataset augment=True — so logits are
    approximately invariant and averaging cancels voxel-grid aliasing
    noise)."""
    import numpy as np

    rots = [jnp.eye(3, dtype=jnp.float32)]
    axes = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1],
                     [1, 1, 0], [0, 1, 1], [1, 0, 1], [1, 1, 1]],
                    np.float32)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = [np.pi / 2, np.pi, -np.pi / 2] * 3
    i = 0
    while len(rots) < n:
        from houv_tpu.geometry.rotations import rodrigues

        rots.append(rodrigues(
            jnp.asarray([angles[i % len(angles)]], jnp.float32),
            jnp.asarray(axes[i % len(axes)][None]))[0])
        i += 1
    return jnp.stack(rots[:n])


def make_classifier_scorer(model, variables, micro_batch: int = 32,
                           n_aug: int = 1, use_gap: bool = False):
    """Scorer closure over a trained ``AlignmentClassifier``:
    (moved (B, C, N, 3), tgt (B, M, 3), cand_r, cand_t[, cand_loss]) ->
    logits (B, C).

    Flattens (pair, candidate) into classifier batches and pads the tail
    chunk so exactly one (micro_batch-shaped) program is compiled
    regardless of B·C. ``n_aug`` > 1 averages logits over that many
    deterministic joint rotations of the overlay (test-time
    augmentation; cost scales linearly). ``use_gap`` feeds the relative
    CD-loss gap vs the loss pick as the model's ``extra`` side input —
    requires a checkpoint trained with n_extra=1
    (RESCORE_GAP=1 scripts/train_rescorer_pool.py)."""

    @jax.jit
    def _apply(src_moved, tgt, extra):
        if n_aug > 1:
            rots = _tta_rotations(n_aug)                 # (A, 3, 3)
            sm = jnp.einsum("aij,bnj->abni", rots, src_moved)
            tg = jnp.einsum("aij,bmj->abmi", rots, tgt)
            logits = jax.vmap(
                lambda s, t: model.apply(variables, s, t, False,
                                         extra=extra)
            )(sm, tg)                                    # (A, B)
            return jnp.mean(logits, axis=0)
        return model.apply(variables, src_moved, tgt, False, extra=extra)

    def scorer(moved: Array, tgt: Array, cand_r=None, cand_t=None,
               cand_loss=None) -> Array:
        bsz, c = moved.shape[:2]
        src_moved = moved.reshape(bsz * c, *moved.shape[2:])
        tgt_rep = jnp.repeat(tgt, c, axis=0)
        if use_gap:
            if cand_loss is None:
                raise ValueError("use_gap scorer needs cand_loss")
            base = jnp.maximum(cand_loss[:, :1], 1e-6)
            gap = jnp.clip((cand_loss - cand_loss[:, :1]) / base, 0.0, 4.0)
            extra_rows = gap.reshape(bsz * c, 1).astype(jnp.float32)
        else:
            extra_rows = jnp.zeros((bsz * c, 1), jnp.float32)
        q = bsz * c
        outs = []
        for s in range(0, q, micro_batch):
            chunk_s = src_moved[s:s + micro_batch]
            chunk_t = tgt_rep[s:s + micro_batch]
            chunk_e = extra_rows[s:s + micro_batch]
            pad = micro_batch - chunk_s.shape[0]
            if pad:
                chunk_s = jnp.concatenate(
                    [chunk_s, jnp.broadcast_to(chunk_s[:1],
                                               (pad,) + chunk_s.shape[1:])])
                chunk_t = jnp.concatenate(
                    [chunk_t, jnp.broadcast_to(chunk_t[:1],
                                               (pad,) + chunk_t.shape[1:])])
                chunk_e = jnp.concatenate(
                    [chunk_e, jnp.broadcast_to(chunk_e[:1],
                                               (pad,) + chunk_e.shape[1:])])
            logits = _apply(chunk_s, chunk_t,
                            chunk_e if use_gap else None)
            outs.append(logits[:micro_batch - pad] if pad else logits)
        return jnp.concatenate(outs).reshape(bsz, c)

    return scorer


def make_oracle_scorer(gt_transforms):
    """Diagnostic scorer: negative geodesic rotation error vs ground truth
    — the upper bound on what any rescoring signal can recover (separates
    candidate-coverage misses from scoring misses)."""
    gt = jnp.asarray(gt_transforms)

    def scorer(moved, tgt, cand_r, cand_t, cand_loss=None):
        return oracle_logits(cand_r, gt)

    return scorer


def rescore_pick(cand_loss: Array, logits: Array, margin: float = 0.0):
    """Per-pair choice: candidate 0 (the loss argmin — reference
    semantics) unless some candidate's logit beats candidate 0's by more
    than ``margin``. Returns (B,) indices."""
    challenger = jnp.argmax(logits, axis=1)
    chal_logit = jnp.take_along_axis(
        logits, challenger[:, None], axis=1)[:, 0]
    override = chal_logit > logits[:, 0] + margin
    return jnp.where(override, challenger, 0).astype(jnp.int32)


def houv_candidate_pools(src: Array, tgt: Array, key: Array,
                         cfg: HOUVConfig, step_chunk: int = 100,
                         sharding=None):
    """Run the angle-window passes (chunked-driver semantics, threshold
    retries included) keeping EVERY restart: returns
    (pool_loss (B, W·K), pool_r (B, W·K, 3, 3), pool_t (B, W·K, 3),
    n_retry). A pair that never entered window w carries +inf losses in
    that window's slots, so its candidates come from window 0 only.
    Solve once, rescore many ways (the quality gate compares pick rules
    on identical pools).

    ``sharding``: optional NamedSharding over the pair axis — committing
    clouds + restart params to it makes XLA's SPMD partitioner split
    every segment program across the mesh (the per-pair math has no
    cross-pair dependency); see ``sharded_houv_solve_rescored``."""
    if cfg.two_bracket:
        raise NotImplementedError(
            "rescored selection assumes the plain restart axis "
            "(two_bracket folds its own preference rule)"
        )
    if cfg.window_select != "loss":
        raise ValueError(
            "rescoring replaces the window merge itself — "
            "use window_select='loss'"
        )
    src, tgt = voxel_downsample_clouds(src, tgt, cfg)
    params0 = init_params(key, src.shape[0], cfg.kernel, cfg.lattice_init,
                          cfg.two_bracket)
    if sharding is not None:
        src = jax.device_put(src, sharding)
        tgt = jax.device_put(tgt, sharding)
        # params carry the pair axis first -> same pair-axis partitioning
        params0 = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharding), params0)

    min_1, r, t = chunked_pass(src, tgt, params0, 0, cfg, step_chunk)
    best, _ = _best_restart(min_1, cfg)
    always = cfg.retry_mode == "always"
    retry_mask = (jnp.ones_like(best, bool) if always
                  else best > cfg.retry_threshold)
    n_retry = int(jnp.sum(retry_mask))
    pools = [(min_1, r, t)]
    if n_retry:
        for base in range(1, cfg.angle_passes):
            m2, r2, t2 = chunked_pass(
                src, tgt, params0, float(base), cfg, step_chunk)
            m2 = jnp.where(retry_mask[:, None], m2, jnp.inf)
            pools.append((m2, r2, t2))

    pool_loss = jnp.concatenate([p[0] for p in pools], axis=1)  # (B, W·K)
    pool_r = jnp.concatenate([p[1] for p in pools], axis=1)
    pool_t = jnp.concatenate([p[2] for p in pools], axis=1)
    return pool_loss, pool_r, pool_t, n_retry


def houv_solve_rescored(src: Array, tgt: Array, key: Array,
                        cfg: HOUVConfig, scorer,
                        n_cand: int = 8, angle_deg: float = 10.0,
                        margin: float = 0.0, step_chunk: int = 100,
                        pools=None):
    """``houv_solve_chunked`` with classifier-rescored candidate selection.

    ``scorer``: (moved (B, C, N, 3), tgt (B, M, 3), cand_r (B, C, 3, 3),
    cand_t (B, C, 3)) -> logits (B, C) — any callable (see
    ``make_classifier_scorer`` / ``make_oracle_scorer``); higher = better
    aligned.

    The restart POOL — every (window, restart) slot from
    ``houv_candidate_pools`` (or a precomputed ``pools`` tuple) — feeds the
    extract → score → pick stages. Returns the chunked driver's dict plus
    ``n_override`` (pairs where the classifier overrode the loss choice)
    and ``cand_loss``/``cand_logits``/``pick`` diagnostics.
    """
    if pools is None:
        pools = houv_candidate_pools(src, tgt, key, cfg, step_chunk)
    pool_loss, pool_r, pool_t, n_retry = pools
    src, tgt = voxel_downsample_clouds(src, tgt, cfg)
    cand_loss, cand_r, cand_t = extract_candidates(
        pool_loss, pool_r, pool_t, n_cand, angle_deg)

    moved = apply_candidates(src, cand_r, cand_t)          # (B, C, N, 3)
    logits = jnp.asarray(
        scorer(moved, tgt, cand_r, cand_t, cand_loss=cand_loss))

    pick = rescore_pick(cand_loss, logits, margin)          # (B,)
    r_best = jnp.take_along_axis(
        cand_r, pick[:, None, None, None], axis=1)[:, 0]
    t_best = jnp.take_along_axis(cand_t, pick[:, None, None], axis=1)[:, 0]
    rmse = jnp.take_along_axis(cand_loss, pick[:, None], axis=1)[:, 0]
    return {
        "transform": rt_to_transformation(r_best, t_best),
        "rmse": rmse,
        "n_retry": jnp.asarray(n_retry),
        "n_override": jnp.sum(pick != 0),
        "cand_loss": cand_loss,
        "cand_logits": logits,
        "pick": pick,
    }


def make_sharded_classifier_scorer(model, variables, mesh,
                                   micro_batch: int = 16,
                                   axis: str = "data",
                                   use_gap: bool = False):
    """``make_classifier_scorer`` with the classifier applications SPMD
    over the mesh's pair axis (VERDICT r4 #5: the scorer is per-pair, so
    a 1-D mesh suffices). The flattened (pair · candidate) rows are
    partitioned across devices by shard_map; each device lax.maps over
    its rows in ``micro_batch`` chunks, so per-device memory stays
    bounded exactly like the host scorer's micro-batching while all
    devices score concurrently. Logits match the host scorer's (same
    model, eval-mode BatchNorm — deterministic per row)."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    n_dev = mesh.shape[axis]

    def scorer(moved: Array, tgt: Array, cand_r=None, cand_t=None,
               cand_loss=None) -> Array:
        bsz, c = moved.shape[:2]
        rows = bsz * c
        if bsz % n_dev:
            raise ValueError(
                f"pair count {bsz} not divisible by mesh width {n_dev}")
        src_moved = moved.reshape(rows, *moved.shape[2:])
        tgt_rep = jnp.repeat(tgt, c, axis=0)
        if use_gap:
            if cand_loss is None:
                raise ValueError("use_gap scorer needs cand_loss")
            base = jnp.maximum(cand_loss[:, :1], 1e-6)
            gap = jnp.clip((cand_loss - cand_loss[:, :1]) / base, 0.0, 4.0)
            extra = gap.reshape(rows, 1).astype(jnp.float32)
        else:
            extra = jnp.zeros((rows, 1), jnp.float32)
        per_dev = rows // n_dev
        mb = min(micro_batch, per_dev)

        def local(sm, tg, ex):
            # pad this shard's rows to a whole number of chunks (repeat
            # row 0: duplicates score identically, tail discarded below)
            pad = (-per_dev) % mb
            if pad:
                rep = lambda a: jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
                sm, tg, ex = rep(sm), rep(tg), rep(ex)
            n_chunks = sm.shape[0] // mb
            chunks = (
                sm.reshape(n_chunks, mb, *sm.shape[1:]),
                tg.reshape(n_chunks, mb, *tg.shape[1:]),
                ex.reshape(n_chunks, mb, *ex.shape[1:]),
            )
            logits = jax.lax.map(
                lambda a: model.apply(variables, a[0], a[1], False,
                                      extra=a[2]),
                chunks,
            )                                             # (n_chunks, mb)
            return logits.reshape(-1)[:per_dev]

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis), check_rep=False,
        )
        return jax.jit(fn)(src_moved, tgt_rep, extra).reshape(bsz, c)

    return scorer


def sharded_houv_solve_rescored(src: Array, tgt: Array, key: Array,
                                mesh, cfg: HOUVConfig, scorer,
                                n_cand: int = 8, angle_deg: float = 10.0,
                                margin: float = 0.0, step_chunk: int = 100,
                                axis: str = "data"):
    """``houv_solve_rescored`` with every stage riding the mesh: clouds
    and restart params are committed to a pair-axis NamedSharding, so the
    host-driven segment choreography dispatches SPMD programs (pool
    solve, candidate extraction, overlay construction all split over
    devices); pair scoring shards via ``make_sharded_classifier_scorer``.
    Completes the run_test.sh replacement (registration/run_test.sh:6-26)
    at full quality-mode parity: the promoted rescored config no longer
    falls back to one chip on a slice (VERDICT r4 weak #4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    if src.shape[0] % n_dev:
        raise ValueError(
            f"batch {src.shape[0]} not divisible by mesh width {n_dev}")
    sharding = NamedSharding(mesh, P(axis))
    src = jax.device_put(jnp.asarray(src), sharding)
    tgt = jax.device_put(jnp.asarray(tgt), sharding)
    pools = houv_candidate_pools(src, tgt, key, cfg, step_chunk,
                                 sharding=sharding)
    return houv_solve_rescored(src, tgt, key, cfg, scorer, n_cand=n_cand,
                               angle_deg=angle_deg, margin=margin,
                               step_chunk=step_chunk, pools=pools)


def oracle_logits(cand_r: Array, gt_transforms: Array) -> Array:
    """-rotation_error(candidate, GT) per candidate — the oracle rescoring
    signal. cand_r (B, C, 3, 3), gt (B, 4, 4) -> (B, C)."""
    gt_r = gt_transforms[:, :3, :3]
    tr = jnp.einsum("bcij,bij->bc", cand_r, gt_r)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return -jnp.degrees(jnp.arccos(cos))
