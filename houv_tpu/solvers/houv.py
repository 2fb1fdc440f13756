"""HOUV — Hybrid Optimization with Unconstrained Variables, TPU-native.

The champion MVP-registration solver, rebuilt as a single jit-compiled
program. Reference semantics (registration/train_utils.py:359-572 ``solve``/
``getPredict_angle`` — the canonical submission path via registration/
test.py:64 — and the module twin registration/models/houv.py:13-222):

- Each source/target pair is expanded to ``kernel`` random restarts.
- Per restart, four unconstrained parameters: rotation axis V_c (3,),
  angle_c (1,), translation direction tran_c (3,), translation scale
  tran_s (1,), all ~ N(0,1). Optionally the first 26 axes are seeded on the
  3x3x3 integer lattice minus the origin (houv.py:22-31 — the README's
  "parameter initialization method").
- Sine reparametrization: angle = sin(angle_c·π)·π/8 + π/8 + base·π/4
  (a 45° window per angle_base quadrant), tran_s = sin(tran_s·π)·scale
  (scale=1 for MVP, train_utils.py:405; the module variant uses
  0.125+0.125·sin, houv.py:99).
- Loss = 6·min(cd_p, cd_t) of the 50%-truncated chamfer
  (train_utils.py:439); the module variant adds the three axis-projected
  view CDs (houv.py:209-222).
- Adam(lr=0.1) for 500 steps; best restart wins.
- Hybrid retry: pairs whose best loss > 0.030 are re-solved at angle_base
  1..3 keeping the better result (train_utils.py:493-513).

TPU redesign: no per-pair Python loops or retry lists. The restart axis is
just batch; the 500-step Adam loop is a ``lax.fori_loop`` inside one jit;
retry passes are static, executed under ``lax.cond`` so they cost nothing
when no pair exceeds the threshold, with ``jnp.where`` merging — on a mesh,
pairs shard over devices via shard_map (houv_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from houv_tpu.geometry.rotations import (
    rodrigues,
    rotation_xyz,
    normalize_translation,
    rt_to_transformation,
    rotation_error,
    translation_error,
)
from houv_tpu.metrics.cd import calc_cd_percent, loss_view

Array = jax.Array

_PI = float(jnp.pi)


@dataclasses.dataclass(frozen=True)
class HOUVConfig:
    """Solver hyperparameters (defaults = the canonical submission settings)."""

    kernel: int = 64          # random restarts per pair (train_utils.py:360)
    steps: int = 500          # Adam iterations (train_utils.py:489)
    lr: float = 0.1           # module variant uses 0.01 (houv.py:118)
    percent: float = 0.5      # truncated-CD keep fraction (train_utils.py:417)
    loss_weight: float = 6.0  # weight on the truncated-CD term
    use_view_loss: bool = False   # module variant adds projected CDs (houv.py:215)
    tran_mode: str = "mvp"    # 'mvp': sin·1 (train_utils.py:405); 'bounded': 0.125+0.125·sin
    lattice_init: bool = True     # seed first 26 axes on the integer lattice
    retry_threshold: float = 0.030  # train_utils.py:493
    angle_passes: int = 4     # angle_base 0..3 (train_utils.py:501)
    retry_mode: str = "threshold"  # 'threshold' (reference) | 'always':
    # run every angle window for every pair and keep the lowest loss —
    # threshold-free (0.030 is MVP-tuned; other data distributions can
    # converge to sub-threshold wrong-window optima), ~angle_passes× cost.
    use_pallas: bool | None = None  # chamfer dispatch (None = auto by backend)
    fast_trim: bool = True    # bisected truncated mean instead of top_k
    # Ablation family (the reference's getPredict variants / cd_keba module,
    # train_utils.py:150-338, models/simple_icp.py:16-61; histogram-compared
    # in visu_utils.analyseDises):
    exact_scores: bool = True  # f32 nearest-neighbor scores (bf16 costs ~1° rot)
    grad_mode: str = "gather"  # 'gather': fused dual-direction NN + loss
    # recomputed from gathered matches so the backward is pure einsum
    # transposes (no scatter, no second NN pass); 'scatter': the r1 path
    # (chamfer custom-VJP with the matmul-scatter backward)
    reparam: str = "sine"     # 'sine' | 'sigmoid' | 'unconstrained' | 'v3'
    rotation_mode: str = "axis_angle"  # 'axis_angle' | 'euler' (rotation_v2)
    voxel_downsample: int | None = None  # getPredict_cd_vox-style input reduction
    # getPredict_cd_keba_v3 family (train_utils.py:575-757):
    # objective 'multi_percent' = adaptive multi-percent weighting — loss =
    # min@1.0 + 8·sg(min1/min@0.3)·min@0.3 + 24·sg(min1/min@0.1)·min@0.1 +
    # 2·sg(min1/min_view_i)·min_view_i (each extra term contributes a fixed
    # multiple of the full loss's magnitude but its own gradient direction);
    # restart selection by the 10%-truncated loss (:706-718). Requires
    # grad_mode='gather'.
    objective: str = "trunc"  # 'trunc' (canonical) | 'multi_percent' (v3)
    # two-bracket angle split (:628-634): the restart axis is halved —
    # first half optimizes in window [base·45°, base·45°+45°], second half
    # one window up; bracket 1 wins only if clearly better (:718).
    two_bracket: bool = False
    bracket_preference: float = 1.3  # rmse1 < 1.3·rmse2 keeps bracket 0
    # Selection-only truncation override (ours, not in the reference):
    # rank restarts / merge angle windows by the CD at this keep-fraction
    # while the optimized loss stays at cfg.percent. select_percent=1.0
    # ranks by the FULL CD, exposing wrong-window optima that fit the
    # truncated overlap but misfit globally. None = rank by the loss
    # truncation (reference semantics). gather grad_mode only.
    select_percent: float | None = None
    # Emit matched-neighbor COORDINATES straight from the NN kernel
    # (ops/chamfer.py nn_select_pallas) instead of indices + one-hot
    # gathers. MEASURED NEGATIVE on v5e at flagship shapes — 50 vs 37
    # ms/pass even at tile=512 (scripts/bench_nn_select.py, r3): the
    # in-kernel row loop serializes the selection matmuls that the
    # post-kernel one-hot gathers overlap with other work. Kept as an
    # opt-in for re-measurement on other topologies.
    nn_select: bool = False
    # Correspondence-refresh cadence (ours, not in the reference): recompute
    # the O(N·M) nearest-neighbor matches every `nn_refresh` Adam steps and
    # reuse the cached matched rows in between (block-coordinate descent:
    # the match step IS piecewise-constant in (R, T), so the in-between
    # gradients are exact gradients of the same majorizing objective —
    # ICP-style). The NN pass + gathers are ~22 of the 24 ms step
    # (BENCH_NOTES r3 trace), so refresh=R cuts step cost ~R×. 1 =
    # reference semantics (refresh every step). Requires grad_mode='gather',
    # objective='trunc', use_view_loss=False, select_percent=None, and
    # steps (and any segment length) divisible by nn_refresh.
    nn_refresh: int = 1
    # Coarse-to-fine cadence schedule (overrides nn_refresh when set): a
    # tuple of (n_steps, refresh[, subsample]) phases summing to `steps`,
    # e.g. ((400, 5), (100, 2)). Early steps move the params far per step,
    # so stale matches cost nothing there; the FINAL phase sets the
    # answer's precision and wants a fine cadence (ending coarse measured
    # ~3x worse rot mean; coarse->fine measured equal-or-better than
    # uniform refresh=2 at ~1.8x its speed — BENCH_NOTES r3). The optional
    # third element runs the phase on FPS-downsampled clouds (N/subsample
    # points; the NN pass is O(N·M), so subsample=2 cuts the match cost
    # ~4x) — the FPS runs once per phase. Same support restrictions as
    # nn_refresh; each phase length must be divisible by its refresh (and
    # by the segment chunk in the chunked driver). The string "auto"
    # scales the measured champion split (300:5:4,150:5:2,50:2 of 500 —
    # BENCH_NOTES r3) to any step budget via auto_refresh_schedule().
    nn_refresh_schedule: tuple | str | None = None
    # Angle-window selection rule (ours, not in the reference). 'loss':
    # keep-if-better by the truncated CD — reference semantics
    # (train_utils.py:501-513). 'consensus': restart-consensus rescoring —
    # each window candidate carries agreement = #restarts whose loss is
    # within consensus_loss_ratio of the window best AND whose rotation is
    # within consensus_angle degrees (geodesic) of the window-best
    # rotation; among windows whose best loss is within
    # consensus_window_ratio of the global best, the most-agreed-upon wins
    # (loss breaks ties). MEASURED NEGATIVE on the structured fixture
    # (BENCH_NOTES r3 late session): agreement does not correlate with the
    # oracle window (lazy wrong optima — e.g. translation-only fits in the
    # small-angle window — also have large basins), every ratio >= 1.05
    # degrades mean rot error, and the ORACLE window merge itself only
    # moves mean 5.21 -> 4.75 (the residual tail is in-window, not a
    # window-choice problem). Kept opt-in for re-measurement on real MVP
    # statistics.
    window_select: str = "loss"
    consensus_angle: float = 15.0
    consensus_loss_ratio: float = 1.3
    consensus_window_ratio: float = 1.5


def init_params(key: Array, batch: int, kernel: int, lattice_init: bool = True,
                two_bracket: bool = False):
    """Unconstrained parameters for (batch, kernel) optimization replicas.

    With two_bracket, EACH half of the restart axis gets the 26-point
    lattice axes (the reference's v3 keeps two full parameter sets, both
    lattice-initialized: train_utils.py:585-603 vc_numpy reused for V_c
    and V_c2)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    angle_xyz = jax.random.normal(k5, (batch, kernel, 3), jnp.float32)
    v_c = jax.random.normal(k1, (batch, kernel, 3), jnp.float32)
    if lattice_init:
        lattice = jnp.array(
            [
                (x, y, z)
                for x in (-1, 0, 1)
                for y in (-1, 0, 1)
                for z in (-1, 0, 1)
                if (x, y, z) != (0, 0, 0)
            ],
            jnp.float32,
        )  # (26, 3)
        if two_bracket:
            h = kernel // 2
            n_lat = min(26, h)
            v_c = v_c.at[:, :n_lat].set(lattice[None, :n_lat])
            v_c = v_c.at[:, h:h + n_lat].set(lattice[None, :n_lat])
        else:
            n_lat = min(26, kernel)
            v_c = v_c.at[:, :n_lat].set(lattice[None, :n_lat])
    return {
        "v_c": v_c,
        "angle_c": jax.random.normal(k2, (batch, kernel, 1), jnp.float32),
        "tran_c": jax.random.normal(k3, (batch, kernel, 3), jnp.float32),
        "tran_s": jax.random.normal(k4, (batch, kernel, 1), jnp.float32),
        "angle_xyz": angle_xyz,
    }


def reparametrize(params, angle_base: Array | int, tran_mode: str = "mvp",
                  reparam: str = "sine", rotation_mode: str = "axis_angle",
                  two_bracket: bool = False):
    """Unconstrained params -> (R, T).

    reparam: 'sine' — the champion's quadrant-sliced sine windows
    (train_utils.py:404-405); 'sigmoid' — the cd_keba ablation
    (simple_icp.py:55-58: angle = sigmoid·2π, tran_s = tanh·0.25);
    'unconstrained' — raw angle (getPredict, train_utils.py:150-180);
    'v3' — the getPredict_cd_keba_v3 windows (train_utils.py:628-631:
    angle = sigmoid·45° + window·45°, tran_s = sigmoid·0.20).
    rotation_mode 'euler' uses the Rx·Ry·Rz ablation (rotation_v2,
    train_utils.py:132-142) driven by the angle_xyz parameters.
    two_bracket offsets the second half of the restart axis one angle
    window up (the v3 two-bracket split, :628-634)."""
    if two_bracket:
        kernel = params["angle_c"].shape[1]
        bracket = (
            jax.lax.broadcasted_iota(jnp.float32, (1, kernel, 1), 1)
            >= kernel // 2
        ).astype(jnp.float32)
        angle_base = angle_base + bracket  # (1, K, 1) broadcasts over pairs
    if reparam == "sine":
        angle = (
            jnp.sin(params["angle_c"] * _PI) * (_PI / 8)
            + _PI / 8
            + angle_base * (_PI / 4)
        )  # (B, K, 1) in [base·45°, base·45° + 45°]
        if tran_mode == "mvp":
            tran_s = jnp.sin(params["tran_s"] * _PI)  # scale 1
        elif tran_mode == "bounded":
            tran_s = jnp.sin(params["tran_s"] * _PI) * 0.125 + 0.125
        else:
            raise ValueError(f"unknown tran_mode {tran_mode!r}")
    elif reparam == "sigmoid":
        angle = jax.nn.sigmoid(params["angle_c"]) * 2 * _PI
        tran_s = jnp.tanh(params["tran_s"]) * 0.25
    elif reparam == "v3":
        angle = (
            jax.nn.sigmoid(params["angle_c"]) * (_PI / 4)
            + angle_base * (_PI / 4)
        )
        tran_s = jax.nn.sigmoid(params["tran_s"]) * 0.20
    elif reparam == "unconstrained":
        angle = params["angle_c"]
        tran_s = params["tran_s"]
    else:
        raise ValueError(f"unknown reparam {reparam!r}")

    if rotation_mode == "euler":
        r = rotation_xyz(params["angle_xyz"])            # (B, K, 3, 3)
    else:
        r = rodrigues(angle[..., 0], params["v_c"])      # (B, K, 3, 3)
    t = normalize_translation(params["tran_c"], tran_s)  # (B, K, 3)
    return r, t


def _apply(src: Array, r: Array, t: Array) -> Array:
    """src (B, N, 3) × per-restart (B, K, 3, 3)/(B, K, 3) -> (B, K, N, 3)."""
    return (
        jnp.einsum(
            "bnc,bkdc->bknd", src, r, precision=jax.lax.Precision.HIGHEST
        )
        + t[:, :, None, :]
    )


def _objective_scatter(params, src, tgt, angle_base, cfg: HOUVConfig):
    """r1 formulation: chamfer custom-VJP per direction (matmul-scatter
    backward). Kept for A/B comparison and the view-loss/ablation paths."""
    r, t = reparametrize(params, angle_base, cfg.tran_mode, cfg.reparam,
                         cfg.rotation_mode, cfg.two_bracket)
    bsz, kernel = r.shape[:2]
    n = src.shape[1]
    src_t = _apply(src, r, t).reshape(bsz * kernel, n, 3)
    tgt_r = jnp.broadcast_to(tgt[:, None], (bsz, kernel) + tgt.shape[1:]).reshape(
        bsz * kernel, -1, 3
    )
    cd_p, cd_t = calc_cd_percent(
        src_t, tgt_r, cfg.percent, cfg.use_pallas, fast=cfg.fast_trim,
        exact_scores=cfg.exact_scores,
    )
    min_1 = jnp.minimum(cd_p, cd_t)  # (B·K,)
    loss = cfg.loss_weight * min_1
    if cfg.use_view_loss:
        for dim in range(3):
            vp, vt = loss_view(src_t, tgt_r, dim=dim, use_pallas=cfg.use_pallas)
            loss = loss + jnp.minimum(vp, vt)
    return loss.mean(), min_1.reshape(bsz, kernel)


def _trunc_mean_sqrt(d, k, fast):
    from houv_tpu.metrics.cd import _safe_sqrt, _smallest_k, \
        smallest_k_sqrt_mean_fast

    if k >= d.shape[-1]:
        return _safe_sqrt(d).mean(axis=-1)
    if fast:
        return smallest_k_sqrt_mean_fast(d, k)
    return _safe_sqrt(_smallest_k(d, k)).mean(axis=-1)


def _pair_matches(src, tgt, src_t, r, t, use_pallas, dim_mask=None,
                  interpret=False, nn_select=False):
    """One NN pass -> stop-gradient matched rows.

    src (B, N, 3) raw, tgt (B, M, 3) (already projected when the caller
    uses a view mask), src_t (B, K, N, 3) transformed. Returns
      tg    (B, K, N, 3) — matched tgt row per src point,
      s_sel (B, K, M, 3) — matched RAW src row per tgt point,
    both piecewise-constant in (R, T) (stop-gradient), so they can be
    cached across Adam steps (HOUVConfig.nn_refresh).

    ``nn_select`` (opt-in; MEASURED NEGATIVE on v5e, see
    HOUVConfig.nn_select): ``nn_select_pallas`` emits the matched-neighbor
    COORDINATES straight from kernel VMEM — no broadcast of tgt across
    restarts, no dim-3→8 pad of the broadcast, and no post-kernel one-hot
    row gathers. The matched raw-src rows are recovered by un-transforming
    the selected transformed coords with the stop-gradient transform:
    s_sel = R₀ᵀ(c1 - t₀), identical in value to gathering raw src rows
    (up to the 2^-17 selection contract the hi/lo gather also carried).
    """
    from houv_tpu.ops.chamfer import _BATCH_BLOCK, chamfer_indices, \
        nn_select_pallas
    from houv_tpu.ops.gather import gather_rows

    bsz, kernel = r.shape[:2]
    n = src.shape[1]
    m = tgt.shape[1]
    select_ok = (
        (nn_select or interpret)
        and dim_mask is None
        and kernel % _BATCH_BLOCK == 0
        and (use_pallas or interpret)
    )
    flat_src_t = src_t.reshape(bsz * kernel, n, 3)

    if select_ok:
        # stop-grad the INPUTS too: pallas_call has no JVP rule, and the
        # matched coordinates are piecewise-constant in (R, T) anyway
        c1, c2 = nn_select_pallas(
            jax.lax.stop_gradient(tgt),
            jax.lax.stop_gradient(flat_src_t),
            interpret=interpret,
        )
        tg = jax.lax.stop_gradient(c2).reshape(bsz, kernel, n, 3)
        src_t_sel = jax.lax.stop_gradient(c1).reshape(bsz, kernel, m, 3)
        r0 = jax.lax.stop_gradient(r)
        t0 = jax.lax.stop_gradient(t)
        s_sel = jnp.einsum(
            "bkmd,bkdc->bkmc", src_t_sel - t0[:, :, None, :], r0,
            precision=jax.lax.Precision.HIGHEST,
        )                                           # matched raw src rows
        return tg, s_sel

    # cd(gt=tgt, out=src_t) direction convention (metrics/cd.py): d1 is
    # per-tgt-point (nearest src point), d2 per-src-point (nearest tgt).
    # Shared-query layout: the Pallas kernel stores tgt ONCE and maps the
    # flat B·K batch row back to its pair (no HBM broadcast+pad across
    # restarts); the XLA fallback broadcasts inside chamfer_indices.
    if kernel % _BATCH_BLOCK == 0:
        i1, i2 = chamfer_indices(tgt, flat_src_t, use_pallas)
    else:
        tgt_r = jnp.broadcast_to(
            tgt[:, None], (bsz, kernel, m, 3)
        ).reshape(bsz * kernel, m, 3)
        i1, i2 = chamfer_indices(tgt_r, flat_src_t, use_pallas)
    i1 = jax.lax.stop_gradient(i1)                  # (B·K, M) -> src rows
    i2 = jax.lax.stop_gradient(i2)                  # (B·K, N) -> tgt rows
    # Row gathers as hi/lo one-hot matmuls (ops/gather.py): all K restarts
    # of a pair index the SAME raw cloud, so the (B, K·L) layout gathers
    # from (B, L, 3) tables — ~5 ms each vs ~15 ms for XLA's row gather at
    # solver shapes (the r2 in-KERNEL one-hot variant stays a dead end:
    # transposed contractions relayout, BENCH_NOTES r2).
    tg = jax.lax.stop_gradient(
        gather_rows(tgt, i2.reshape(bsz, kernel * n))
    ).reshape(bsz, kernel, n, 3)                    # matched tgt per src pt
    s_sel = jax.lax.stop_gradient(
        gather_rows(src, i1.reshape(bsz, kernel * m))
    ).reshape(bsz, kernel, m, 3)                    # matched raw src rows
    return tg, s_sel


def _dists_from_matches(tgt, src_t, tg, s_sel, r, t, dim_mask=None):
    """Scatter-free loss rebuild from matched rows: (d1 (B·K, M),
    d2 (B·K, N)) squared distances, differentiable through (R, T) via
    einsum transposes only — NO scatter in the backward (the r2 OOM at
    view/multi_percent settings came from these terms routing through the
    chamfer custom-VJP scatter path)."""
    bsz, kernel, n = src_t.shape[:3]
    m = tgt.shape[1]
    # d2: differentiable through src_t only; matched tgt points constant.
    d2 = jnp.sum((src_t - tg) ** 2, axis=-1).reshape(bsz * kernel, n)

    # d1: RAW matched src rows re-transformed — the gradient to (R, T) is
    # an einsum transpose instead of a scatter.
    matched_t = jnp.einsum(
        "bkmc,bkdc->bkmd", s_sel, r,
        precision=jax.lax.Precision.HIGHEST,
    ) + t[:, :, None, :]
    if dim_mask is not None:
        matched_t = matched_t * dim_mask
    d1 = jnp.sum(
        (tgt[:, None] - matched_t) ** 2, axis=-1
    ).reshape(bsz * kernel, m)
    return d1, d2


def _gathered_pair_dists(src, tgt, src_t, r, t, use_pallas, dim_mask=None,
                         interpret=False, nn_select=False):
    """One NN pass (stop-gradient matches) + scatter-free loss rebuild.

    With ``dim_mask`` (a (3,) 0/1 vector) both clouds are projected before
    matching — the view-CD geometry (metrics/cd.py:loss_view)."""
    if dim_mask is not None:
        src_t = src_t * dim_mask
        tgt = tgt * dim_mask
    tg, s_sel = _pair_matches(src, tgt, src_t, r, t, use_pallas,
                              dim_mask=dim_mask, interpret=interpret,
                              nn_select=nn_select)
    return _dists_from_matches(tgt, src_t, tg, s_sel, r, t, dim_mask)


def _gathered_view_min(src, tgt, src_t, r, t, use_pallas, dim, fast):
    """min(vp, vt) of the axis-``dim`` projected CD (loss_view), built in
    the gather formulation. Matches calc_cd_percent's exact semantics at
    percent=1.0: k = the OUTPUT (src) point count truncates BOTH sides —
    with N != M the per-gt side keeps only the smallest N of its M
    distances (metrics/cd.py:94-108, reference
    model_utils_completion.py:83-100 quirk)."""
    mask = jnp.ones((3,), src.dtype).at[dim].set(0.0)
    d1v, d2v = _gathered_pair_dists(
        src, tgt, src_t, r, t, use_pallas, dim_mask=mask
    )
    k = src.shape[1]
    vp = _trunc_mean_sqrt(d1v, k, fast)
    vt = _trunc_mean_sqrt(d2v, k, fast)
    return jnp.minimum(vp, vt)


def _objective_gather(params, src, tgt, angle_base, cfg: HOUVConfig):
    """Scatter-free formulation (r2): the O(N·M) search runs ONCE in the
    fused dual-direction kernel (stop-gradient), then the loss is rebuilt
    from the matched pairs with the transform re-applied to the *gathered*
    raw source points. Autodiff therefore sees only elementwise ops and the
    two small (·, 3, 3) einsums — the backward pass has no nearest-neighbor
    recomputation and no scatter (VERDICT r1 weak #1).

    Semantics match the reference loss exactly (registration/
    train_utils.py:417-439): the match indices are identical to the
    argmin at the current (R, T); reference autograd likewise treats the
    argmin as piecewise-constant.
    """
    from houv_tpu.ops.chamfer import _use_pallas

    r, t = reparametrize(params, angle_base, cfg.tran_mode, cfg.reparam,
                         cfg.rotation_mode, cfg.two_bracket)
    bsz, kernel = r.shape[:2]
    n = src.shape[1]
    src_t = _apply(src, r, t)                       # (B, K, N, 3)
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = _use_pallas()
    d1, d2 = _gathered_pair_dists(src, tgt, src_t, r, t, use_pallas,
                                  nn_select=cfg.nn_select)

    if cfg.objective == "multi_percent":
        # getPredict_cd_keba_v3's adaptive weighting (train_utils.py:
        # 645-672): min@{1.0, 0.3, 0.1} truncations all reuse the ONE NN
        # pass above; each auxiliary term is scaled by a detached
        # min1/term ratio so it contributes a fixed multiple of the full
        # loss's magnitude with its own gradient direction. Restart
        # selection (the returned per-replica metric) is the 10% loss
        # (:706: rmse_loss = min_1_1).
        eps = 1e-12
        mins = {}
        for pct in (1.0, 0.3, 0.1):
            # calc_cd_percent quirk: k from the OUTPUT (src) count for
            # BOTH sides (model_utils_completion.py:85-92)
            k = int(n * pct)
            cp = _trunc_mean_sqrt(d1, k, cfg.fast_trim)
            ct = _trunc_mean_sqrt(d2, k, cfg.fast_trim)
            mins[pct] = jnp.minimum(cp, ct)
        min1 = mins[1.0]
        loss = min1
        for pct, w in ((0.3, 8.0), (0.1, 24.0)):
            term = mins[pct]
            ratio = jax.lax.stop_gradient(min1 / jnp.maximum(term, eps))
            loss = loss + ratio * w * term
        for dim in range(3):
            mv = _gathered_view_min(src, tgt, src_t, r, t, use_pallas,
                                    dim, cfg.fast_trim)
            ratio = jax.lax.stop_gradient(min1 / jnp.maximum(mv, eps))
            loss = loss + ratio * 2.0 * mv
        return loss.mean(), mins[0.1].reshape(bsz, kernel)

    # calc_cd_percent quirk: k from the OUTPUT (src) count for BOTH sides
    # (model_utils_completion.py:85-92; N == M == 2048 on MVP)
    k = int(n * cfg.percent)
    cd_p = _trunc_mean_sqrt(d1, k, cfg.fast_trim)
    cd_t = _trunc_mean_sqrt(d2, k, cfg.fast_trim)
    min_1 = jnp.minimum(cd_p, cd_t)
    loss = cfg.loss_weight * min_1
    if cfg.use_view_loss:
        for dim in range(3):
            loss = loss + _gathered_view_min(
                src, tgt, src_t, r, t, use_pallas, dim, cfg.fast_trim
            )
    sel = min_1
    if cfg.select_percent is not None:
        # Selection-only metric at a different truncation (not in the
        # reference): a wrong-window optimum fits the truncated overlap
        # but misfits globally, so ranking restarts/windows by the FULL
        # CD (select_percent=1.0) exposes it. Reuses the one NN pass.
        ks = int(n * cfg.select_percent)
        sel = jnp.minimum(
            _trunc_mean_sqrt(d1, ks, cfg.fast_trim),
            _trunc_mean_sqrt(d2, ks, cfg.fast_trim),
        )
    return loss.mean(), sel.reshape(bsz, kernel)


def _objective(params, src, tgt, angle_base, cfg: HOUVConfig):
    """Mean loss over all (pair, restart) replicas + per-replica min_1."""
    if cfg.grad_mode == "gather":
        return _objective_gather(params, src, tgt, angle_base, cfg)
    if cfg.objective == "multi_percent":
        raise NotImplementedError(
            "objective='multi_percent' requires grad_mode='gather'"
        )
    if cfg.select_percent is not None:
        raise NotImplementedError(
            "select_percent requires grad_mode='gather' (the scatter path "
            "has no spare NN pass to rank with)"
        )
    return _objective_scatter(params, src, tgt, angle_base, cfg)


def _check_refresh_supported(cfg: HOUVConfig):
    if cfg.grad_mode != "gather" or cfg.objective != "trunc" \
            or cfg.use_view_loss or cfg.select_percent is not None:
        raise NotImplementedError(
            "nn_refresh > 1 supports the canonical objective only "
            "(grad_mode='gather', objective='trunc', use_view_loss=False, "
            "select_percent=None)"
        )


def _objective_matches(params, src, tgt, angle_base, cfg: HOUVConfig):
    """The match half of ``_objective_gather``: one NN pass at the current
    (R, T) — cached rows for nn_refresh-step reuse."""
    from houv_tpu.ops.chamfer import _use_pallas

    r, t = reparametrize(params, angle_base, cfg.tran_mode, cfg.reparam,
                         cfg.rotation_mode, cfg.two_bracket)
    src_t = _apply(src, r, t)
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = _use_pallas()
    return _pair_matches(src, tgt, src_t, r, t, use_pallas,
                         nn_select=cfg.nn_select)


def _objective_cached(params, matches, src, tgt, angle_base,
                      cfg: HOUVConfig):
    """``_objective_gather``'s loss rebuild against CACHED matches
    (canonical trunc objective only — see ``_check_refresh_supported``)."""
    tg, s_sel = matches
    r, t = reparametrize(params, angle_base, cfg.tran_mode, cfg.reparam,
                         cfg.rotation_mode, cfg.two_bracket)
    bsz, kernel = r.shape[:2]
    n = src.shape[1]
    src_t = _apply(src, r, t)
    d1, d2 = _dists_from_matches(tgt, src_t, tg, s_sel, r, t)
    k = int(n * cfg.percent)
    cd_p = _trunc_mean_sqrt(d1, k, cfg.fast_trim)
    cd_t = _trunc_mean_sqrt(d2, k, cfg.fast_trim)
    min_1 = jnp.minimum(cd_p, cd_t)
    loss = cfg.loss_weight * min_1
    return loss.mean(), min_1.reshape(bsz, kernel)


def _adam_loop(src, tgt, angle_base, cfg: HOUVConfig, opt, params,
               opt_state, n_steps: int):
    """``n_steps`` Adam steps over all (pair, restart) replicas. With
    ``cfg.nn_refresh > 1`` the NN matches are recomputed once per refresh
    block and the loss/gradients in between are rebuilt against the cached
    matched rows (the matches are piecewise-constant in (R, T), so each
    in-between gradient is the exact gradient of the same majorizing
    objective — the NN pass + gathers are ~22 of the 24 ms step)."""
    refresh = cfg.nn_refresh
    if refresh <= 1:
        grad_fn = jax.grad(
            lambda p: _objective(p, src, tgt, angle_base, cfg)[0])

        def body(_, state):
            params, opt_state = state
            grads = grad_fn(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        return jax.lax.fori_loop(0, n_steps, body, (params, opt_state))

    _check_refresh_supported(cfg)
    if n_steps % refresh:
        raise ValueError(
            f"step count {n_steps} not divisible by nn_refresh {refresh}"
        )
    grad_fn = jax.grad(
        lambda p, m: _objective_cached(p, m, src, tgt, angle_base, cfg)[0])

    def body(_, state):
        params, opt_state = state
        matches = _objective_matches(params, src, tgt, angle_base, cfg)
        for _ in range(refresh):
            grads = grad_fn(params, matches)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, opt_state

    return jax.lax.fori_loop(
        0, n_steps // refresh, body, (params, opt_state))


def auto_refresh_schedule(steps: int) -> tuple:
    """Scale the measured champion 3-phase split (60% at refresh 5 on N/4
    clouds, 30% at refresh 5 on N/2, final 10% full-resolution at
    refresh 2; BENCH_NOTES r3) to an arbitrary step budget. Tiny budgets
    fall back to one full-resolution phase at reference semantics."""
    if steps < 50:
        return ((steps, 1),)
    p1 = 5 * int(0.6 * steps / 5)
    p2 = 5 * int(0.3 * steps / 5)
    p3 = steps - p1 - p2
    # the final phase sets the answer's precision: refresh 2 when the
    # remainder allows, else exact per-step matches
    r3 = 2 if p3 % 2 == 0 else 1
    return ((p1, 5, 4), (p2, 5, 2), (p3, r3))


def _refresh_phases(cfg: HOUVConfig) -> tuple:
    """Resolve the (n_steps, refresh, subsample) phase list: the
    coarse-to-fine schedule when set ("auto" = auto_refresh_schedule),
    else one uniform full-resolution phase at cfg.nn_refresh."""
    if cfg.nn_refresh_schedule is None:
        return ((cfg.steps, cfg.nn_refresh, 1),)
    if cfg.nn_refresh_schedule == "auto":
        sched = auto_refresh_schedule(cfg.steps)
        return _refresh_phases(
            dataclasses.replace(cfg, nn_refresh_schedule=sched))
    phases = tuple(
        (int(p[0]), int(p[1]), int(p[2]) if len(p) > 2 else 1)
        for p in cfg.nn_refresh_schedule
    )
    total = sum(n for n, _, _ in phases)
    if total != cfg.steps:
        raise ValueError(
            f"nn_refresh_schedule phases sum to {total}, steps={cfg.steps}"
        )
    if phases[-1][2] != 1:
        raise ValueError(
            "the final schedule phase must run at full resolution "
            "(subsample=1) — it sets the answer's precision"
        )
    for n, r, _ in phases:
        if r > 1 and n % r:
            raise ValueError(
                f"schedule phase length {n} not divisible by its "
                f"nn_refresh {r}"
            )
    return phases


def _phase_clouds(src: Array, tgt: Array, sub: int):
    """FPS-downsample both clouds by `sub` for a coarse schedule phase
    (runs once per phase — amortized over its hundreds of Adam steps)."""
    if sub <= 1:
        return src, tgt
    from houv_tpu.ops.sampling import furthest_point_sample

    def reduce(cloud):
        idx = furthest_point_sample(cloud, cloud.shape[1] // sub)
        return jnp.take_along_axis(cloud, idx[..., None], axis=1)

    return reduce(src), reduce(tgt)


@functools.partial(jax.jit, static_argnames=("sub",))
def _phase_clouds_jit(src: Array, tgt: Array, sub: int):
    """Jitted ``_phase_clouds`` for host-driven (chunked) phase loops."""
    return _phase_clouds(src, tgt, sub)


def _best_restart(min_1: Array, cfg: HOUVConfig):
    """(best_value (B,), best_index (B,)) over the restart axis.

    With two_bracket, the halves are separate brackets and bracket 0 wins
    unless bracket 1 is clearly better (reference train_utils.py:714-725:
    ``if rmse[i] < rmse2[i] * 1.3`` keep bracket 0)."""
    if not cfg.two_bracket:
        idx = jnp.argmin(min_1, axis=1)
        return jnp.min(min_1, axis=1), idx
    h = min_1.shape[1] // 2
    v0 = jnp.min(min_1[:, :h], axis=1)
    i0 = jnp.argmin(min_1[:, :h], axis=1)
    v1 = jnp.min(min_1[:, h:], axis=1)
    i1 = jnp.argmin(min_1[:, h:], axis=1) + h
    use0 = v0 < v1 * cfg.bracket_preference
    return jnp.where(use0, v0, v1), jnp.where(use0, i0, i1)


def _restart_agreement(min_1: Array, r: Array, best: Array, idx: Array,
                       cfg: HOUVConfig) -> Array:
    """#restarts that converged onto the window-best optimum: loss within
    ``consensus_loss_ratio`` of the best AND rotation within
    ``consensus_angle`` degrees (geodesic) of the best restart's.

    min_1 (B, K), r (B, K, 3, 3), best/idx (B,) from ``_best_restart``.
    Returns (B,) float32 counts (>= 1: the best restart agrees with
    itself). O(B·K) — negligible next to the solve."""
    r_best = jnp.take_along_axis(
        r, idx[:, None, None, None], axis=1
    )[:, 0]                                          # (B, 3, 3)
    tr = jnp.einsum("bkij,bij->bk", r, r_best)       # trace(R_k R_bestᵀ)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cos))               # (B, K)
    near_opt = min_1 <= best[:, None] * cfg.consensus_loss_ratio + 1e-4
    agree = jnp.logical_and(ang < cfg.consensus_angle, near_opt)
    return jnp.sum(agree, axis=1).astype(jnp.float32)


def _consensus_merge(cand_loss: Array, cand_agree: Array,
                     cfg: HOUVConfig) -> Array:
    """Pick the angle window per pair: among windows whose best loss is
    within ``consensus_window_ratio`` of the global best (+ small absolute
    slack for near-zero CDs), maximum agreement wins; the loss breaks
    agreement ties. cand_loss/cand_agree (B, P); returns (B,) indices."""
    gbest = jnp.min(cand_loss, axis=1, keepdims=True)
    valid = cand_loss <= gbest * cfg.consensus_window_ratio + 1e-4
    # agreement counts are integers >= 1 apart; the loss tie-break term is
    # clipped to (-0.5, 0] so it can only order windows of EQUAL agreement
    tie = jnp.clip(1.0 - cand_loss / (gbest + 1e-9), -1.0, 0.0) * 0.49
    score = jnp.where(valid, cand_agree + tie, -jnp.inf)
    return jnp.argmax(score, axis=1)


def _window_candidate(min_1: Array, r: Array, t: Array, cfg: HOUVConfig):
    """One angle window's per-pair candidate for the consensus merge:
    (loss (B,), agree (B,), R (B, 3, 3), T (B, 3))."""
    best, idx = _best_restart(min_1, cfg)
    agree = _restart_agreement(min_1, r, best, idx, cfg)
    r_b = jnp.take_along_axis(r, idx[:, None, None, None], axis=1)[:, 0]
    t_b = jnp.take_along_axis(t, idx[:, None, None], axis=1)[:, 0]
    return best, agree, r_b, t_b


@functools.partial(jax.jit, static_argnames=("cfg",))
def houv_pass(
    src: Array, tgt: Array, params0, angle_base: Array | int, cfg: HOUVConfig
):
    """One full optimization pass at a given angle window.

    Replaces ``getPredict_angle`` (train_utils.py:359-456): Adam over all
    (pair, restart) replicas jointly for cfg.steps iterations.

    Returns (min_1 (B, K), R (B, K, 3, 3), T (B, K, 3)).
    """
    opt = optax.adam(cfg.lr)
    params, opt_state = params0, opt.init(params0)
    for n_steps, refresh, sub in _refresh_phases(cfg):
        cfg_r = dataclasses.replace(
            cfg, nn_refresh=refresh, nn_refresh_schedule=None)
        src_p, tgt_p = _phase_clouds(src, tgt, sub)
        params, opt_state = _adam_loop(
            src_p, tgt_p, angle_base, cfg_r, opt, params, opt_state,
            n_steps)
    _, min_1 = _objective(params, src, tgt, angle_base, cfg)
    r, t = reparametrize(params, angle_base, cfg.tran_mode, cfg.reparam,
                         cfg.rotation_mode, cfg.two_bracket)
    return min_1, r, t

def voxel_downsample_clouds(src: Array, tgt: Array, cfg: HOUVConfig):
    """getPredict_cd_vox-style input reduction (train_utils.py:762-863):
    voxel-mean the clouds before optimizing. Empty-voxel rows are
    zero-padded; they sit far from both clouds only if the data is
    centered, so we fall back to repeating the first rows instead.
    Shared by houv_solve / houv_solve_chunked / the 2-D mesh path so the
    ablation means the same thing everywhere."""
    if not cfg.voxel_downsample:
        return src, tgt
    from houv_tpu.ops.voxel import voxelize_mean

    def reduce(cloud):
        vp, cnt = voxelize_mean(
            cloud,
            grid_size=cfg.voxel_downsample,
            min_bound=float(-1.0),
            max_bound=float(1.0),
        )
        n = vp.shape[1]
        rows = jnp.arange(n)[None, :]
        src_rows = rows % jnp.maximum(cnt[:, None], 1)
        return jnp.take_along_axis(vp, src_rows[..., None], axis=1)

    return reduce(src), reduce(tgt)




@functools.partial(jax.jit, static_argnames=("cfg",))
def houv_solve(src: Array, tgt: Array, key: Array, cfg: HOUVConfig = HOUVConfig()):
    """Full hybrid solve (reference ``solve``, train_utils.py:467-572).

    src, tgt: (B, N, 3). Returns a dict:
      transform (B, 4, 4) — best rigid transform per pair,
      rmse (B,)           — best-restart truncated-CD loss,
      n_retry (,)         — how many pairs entered the retry passes.

    The reference gathers the >0.030 pairs into a ragged list and re-solves
    at angle_base 1..3; here each retry pass is a statically-shaped solve of
    the full batch, executed under ``lax.cond`` (skipped entirely when no
    pair needs it) and merged with ``jnp.where`` — same results, no host
    round-trips, and shard_map-compatible.
    """
    src, tgt = voxel_downsample_clouds(src, tgt, cfg)
    params0 = init_params(key, src.shape[0], cfg.kernel, cfg.lattice_init,
                         cfg.two_bracket)
    if cfg.window_select == "consensus":
        return _houv_solve_consensus(src, tgt, params0, cfg)
    if cfg.window_select != "loss":
        raise ValueError(f"unknown window_select {cfg.window_select!r}")

    min_1, r, t = houv_pass(src, tgt, params0, 0, cfg)
    best, _ = _best_restart(min_1, cfg)  # (B,)
    if cfg.retry_mode == "always":
        need_retry = jnp.ones_like(best, dtype=bool)
    else:
        need_retry = best > cfg.retry_threshold
    n_retry = jnp.sum(need_retry)

    def retry_pass(carry, angle_base):
        min_1, r, t, best = carry

        def run(_):
            m2, r2, t2 = houv_pass(src, tgt, params0, angle_base, cfg)
            best2, _ = _best_restart(m2, cfg)
            improved = jnp.logical_and(need_retry, best2 < best)  # (B,)
            m = jnp.where(improved[:, None], m2, min_1)
            rr = jnp.where(improved[:, None, None, None], r2, r)
            tt = jnp.where(improved[:, None, None], t2, t)
            b = jnp.where(improved, best2, best)
            return m, rr, tt, b

        out = jax.lax.cond(
            jnp.any(need_retry), run, lambda _: (min_1, r, t, best), None
        )
        return out, None

    if cfg.angle_passes > 1:
        bases = jnp.arange(1, cfg.angle_passes, dtype=jnp.float32)
        (min_1, r, t, best), _ = jax.lax.scan(
            retry_pass, (min_1, r, t, best), bases
        )

    # Best restart per pair -> (B, 4, 4) transform.
    _, idx = _best_restart(min_1, cfg)  # (B,)
    r_best = jnp.take_along_axis(r, idx[:, None, None, None], axis=1)[:, 0]
    t_best = jnp.take_along_axis(t, idx[:, None, None], axis=1)[:, 0]
    return {
        "transform": rt_to_transformation(r_best, t_best),
        "rmse": best,
        "n_retry": n_retry,
    }


def _houv_solve_consensus(src: Array, tgt: Array, params0,
                          cfg: HOUVConfig):
    """``houv_solve`` with ``window_select='consensus'``: every angle
    window contributes a per-pair candidate (best restart's loss, R, T,
    and its restart-agreement count); the final window choice is by
    ``_consensus_merge`` instead of lowest-loss-wins. In threshold retry
    mode, windows 1..P-1 are still skipped wholesale under ``lax.cond``
    when no pair exceeds the threshold, and non-retried pairs keep only
    their window-0 candidate (reference retry semantics,
    train_utils.py:493-513)."""
    bsz = src.shape[0]
    min_1, r, t = houv_pass(src, tgt, params0, 0, cfg)
    loss0, agree0, r0, t0 = _window_candidate(min_1, r, t, cfg)
    if cfg.retry_mode == "always":
        need_retry = jnp.ones_like(loss0, dtype=bool)
    else:
        need_retry = loss0 > cfg.retry_threshold
    n_retry = jnp.sum(need_retry)

    p = cfg.angle_passes
    cand_loss = jnp.full((bsz, p), jnp.inf).at[:, 0].set(loss0)
    cand_agree = jnp.zeros((bsz, p)).at[:, 0].set(agree0)
    cand_r = jnp.zeros((bsz, p, 3, 3)).at[:, 0].set(r0)
    cand_t = jnp.zeros((bsz, p, 3)).at[:, 0].set(t0)

    def retry_pass(carry, angle_base):
        cand_loss, cand_agree, cand_r, cand_t = carry

        def run(_):
            m2, r2, t2 = houv_pass(src, tgt, params0, angle_base, cfg)
            loss_b, agree_b, r_b, t_b = _window_candidate(m2, r2, t2, cfg)
            # non-retried pairs never see this window (reference ragged
            # retry list); inf loss keeps the slot out of the merge
            loss_b = jnp.where(need_retry, loss_b, jnp.inf)
            return loss_b, agree_b, r_b, t_b

        # the skip branch derives its outputs from the window-0 candidate
        # (loss0 is a finite truncated CD) so both branches carry the same
        # shard_map varying-axis types (fresh constants would be unvarying)
        loss_b, agree_b, r_b, t_b = jax.lax.cond(
            jnp.any(need_retry),
            run,
            lambda _: (loss0 * 0.0 + jnp.inf, agree0 * 0.0,
                       r0 * 0.0, t0 * 0.0),
            None,
        )
        slot = angle_base.astype(jnp.int32)
        cand_loss = cand_loss.at[:, slot].set(loss_b)
        cand_agree = cand_agree.at[:, slot].set(agree_b)
        cand_r = cand_r.at[:, slot].set(r_b)
        cand_t = cand_t.at[:, slot].set(t_b)
        return (cand_loss, cand_agree, cand_r, cand_t), None

    if cfg.angle_passes > 1:
        bases = jnp.arange(1, cfg.angle_passes, dtype=jnp.float32)
        (cand_loss, cand_agree, cand_r, cand_t), _ = jax.lax.scan(
            retry_pass, (cand_loss, cand_agree, cand_r, cand_t), bases
        )

    widx = _consensus_merge(cand_loss, cand_agree, cfg)  # (B,)
    r_best = jnp.take_along_axis(
        cand_r, widx[:, None, None, None], axis=1
    )[:, 0]
    t_best = jnp.take_along_axis(cand_t, widx[:, None, None], axis=1)[:, 0]
    rmse = jnp.take_along_axis(cand_loss, widx[:, None], axis=1)[:, 0]
    return {
        "transform": rt_to_transformation(r_best, t_best),
        "rmse": rmse,
        "n_retry": n_retry,
    }


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"))
def houv_pass_segment(src, tgt, params, opt_state, angle_base, cfg: HOUVConfig,
                      n_steps: int):
    """n_steps Adam steps of one angle-window pass, resumable: takes and
    returns (params, opt_state). Lets a long solve be split into bounded
    dispatches (a single multi-minute XLA program can trip remote-runtime
    watchdogs; 100-step segments keep each dispatch ~10s).

    Note: segments have no global step position, so a coarse-to-fine
    ``nn_refresh_schedule`` must be resolved by the DRIVER (e.g.
    ``houv_solve_chunked`` iterates phases and passes per-phase cfgs)."""
    if cfg.nn_refresh_schedule is not None:
        raise ValueError(
            "houv_pass_segment cannot place itself in a "
            "nn_refresh_schedule — resolve phases in the driver and pass "
            "per-phase cfgs (see houv_solve_chunked)"
        )
    opt = optax.adam(cfg.lr)
    return _adam_loop(src, tgt, angle_base, cfg, opt, params, opt_state,
                      n_steps)


@functools.partial(jax.jit, static_argnames=("cfg",))
def houv_opt_init(params, cfg: HOUVConfig):
    return optax.adam(cfg.lr).init(params)


@functools.partial(jax.jit, static_argnames=("cfg",))
def houv_finalize(src, tgt, params, angle_base, cfg: HOUVConfig):
    _, min_1 = _objective(params, src, tgt, angle_base, cfg)
    r, t = reparametrize(params, angle_base, cfg.tran_mode, cfg.reparam,
                         cfg.rotation_mode, cfg.two_bracket)
    return min_1, r, t


def chunked_pass(src: Array, tgt: Array, params0, angle_base,
                 cfg: HOUVConfig, step_chunk: int = 100):
    """One angle-window pass as bounded jitted segments (host-driven):
    the schedule phases are resolved here and each dispatch runs a whole
    number of refresh blocks (phase lengths are validated divisible in
    ``_refresh_phases``). Shared by ``houv_solve_chunked`` and the
    classifier-rescored driver (solvers/rescore.py)."""
    params = params0
    opt_state = houv_opt_init(params, cfg)
    for n_steps, refresh, sub in _refresh_phases(cfg):
        cfg_r = dataclasses.replace(
            cfg, nn_refresh=refresh, nn_refresh_schedule=None)
        src_p, tgt_p = _phase_clouds_jit(src, tgt, sub)
        done = 0
        while done < n_steps:
            n = min(step_chunk, n_steps - done)
            n -= n % refresh
            if n == 0:
                n = min(refresh, n_steps - done)
            params, opt_state = houv_pass_segment(
                src_p, tgt_p, params, opt_state, angle_base, cfg_r, n
            )
            done += n
    return houv_finalize(src, tgt, params, angle_base, cfg)


def houv_solve_chunked(src: Array, tgt: Array, key: Array,
                       cfg: HOUVConfig = HOUVConfig(),
                       step_chunk: int = 100):
    """Host-driven variant of ``houv_solve`` for long single-chip runs: the
    500-step loop is split into jitted segments and the retry logic runs on
    the host (like the reference's solve), so no dispatch exceeds ~10s and
    retry passes only run when some pair actually needs them."""
    src, tgt = voxel_downsample_clouds(src, tgt, cfg)
    params0 = init_params(key, src.shape[0], cfg.kernel, cfg.lattice_init,
                         cfg.two_bracket)

    def run_pass(angle_base):
        return chunked_pass(src, tgt, params0, angle_base, cfg, step_chunk)

    min_1, r, t = run_pass(0)
    if cfg.window_select == "consensus":
        loss0, agree0, r0, t0 = _window_candidate(min_1, r, t, cfg)
        need_retry = (jnp.ones_like(loss0, bool)
                      if cfg.retry_mode == "always"
                      else loss0 > cfg.retry_threshold)
        n_retry = int(jnp.sum(need_retry))
        cand = [(loss0, agree0, r0, t0)]
        if n_retry:
            for base in range(1, cfg.angle_passes):
                m2, r2, t2 = run_pass(float(base))
                loss_b, agree_b, r_b, t_b = _window_candidate(
                    m2, r2, t2, cfg)
                cand.append((jnp.where(need_retry, loss_b, jnp.inf),
                             agree_b, r_b, t_b))
        cand_loss = jnp.stack([c[0] for c in cand], axis=1)
        cand_agree = jnp.stack([c[1] for c in cand], axis=1)
        cand_r = jnp.stack([c[2] for c in cand], axis=1)
        cand_t = jnp.stack([c[3] for c in cand], axis=1)
        widx = _consensus_merge(cand_loss, cand_agree, cfg)
        r_best = jnp.take_along_axis(
            cand_r, widx[:, None, None, None], axis=1)[:, 0]
        t_best = jnp.take_along_axis(
            cand_t, widx[:, None, None], axis=1)[:, 0]
        rmse = jnp.take_along_axis(cand_loss, widx[:, None], axis=1)[:, 0]
        return {
            "transform": rt_to_transformation(r_best, t_best),
            "rmse": rmse,
            "n_retry": jnp.asarray(n_retry),
        }
    if cfg.window_select != "loss":
        raise ValueError(f"unknown window_select {cfg.window_select!r}")
    best, _ = _best_restart(min_1, cfg)
    always = cfg.retry_mode == "always"
    n_retry = int(jnp.sum(best > cfg.retry_threshold)) if not always \
        else src.shape[0]
    if n_retry:
        retry_mask = (jnp.ones_like(best, bool) if always
                      else best > cfg.retry_threshold)
        for base in range(1, cfg.angle_passes):
            m2, r2, t2 = run_pass(float(base))
            best2, _ = _best_restart(m2, cfg)
            improved = retry_mask & (best2 < best)
            min_1 = jnp.where(improved[:, None], m2, min_1)
            r = jnp.where(improved[:, None, None, None], r2, r)
            t = jnp.where(improved[:, None, None], t2, t)
            best = jnp.where(improved, best2, best)

    _, idx = _best_restart(min_1, cfg)
    r_best = jnp.take_along_axis(r, idx[:, None, None, None], axis=1)[:, 0]
    t_best = jnp.take_along_axis(t, idx[:, None, None], axis=1)[:, 0]
    return {
        "transform": rt_to_transformation(r_best, t_best),
        "rmse": best,
        "n_retry": jnp.asarray(n_retry),
    }


def combine(src: Array, tgt: Array, n_points: int = 2048) -> Array:
    """FPS-merge two clouds back to n_points (reference ``combine``,
    train_utils.py:459-464: concat then furthest_point_sample)."""
    from houv_tpu.ops.sampling import furthest_point_sample

    merged = jnp.concatenate([src, tgt], axis=1)
    idx = furthest_point_sample(merged, n_points)
    return jnp.take_along_axis(merged, idx[..., None], axis=1)


def evaluate_solution(transform: Array, pose_gt: Array):
    """Rotation (deg) / translation errors vs ground-truth 4x4 poses
    (reference solve() tail, train_utils.py:566-570)."""
    r_err = rotation_error(transform[:, :3, :3], pose_gt[:, :3, :3])
    t_err = translation_error(transform[:, :3, 3], pose_gt[:, :3, 3])
    return r_err, t_err
