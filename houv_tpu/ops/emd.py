"""Earth Mover's Distance via the auction algorithm — TPU-native.

Replacement for the reference CUDA extension
(utils/metrics/EMD/emd_cuda.cu:23-284 — kernels clear/calc_unass_cnt/Bid/
GetMax/Assign/CalcDist — wrapped by utils/metrics/EMD/emd_module.py).
Same contract:

  emd_auction(x1, x2, eps, iters) -> (dist, assignment)

- dist[b, i] = ||x1[b,i] - x2[b, assignment[b,i]]||² (squared; callers take
  sqrt, see houv_tpu.metrics.emd.calc_emd),
- assignment is an approximate bijection onto x2 (exact when the auction
  converges within ``iters`` rounds),
- gradient flows only to x1 (matching the reference: emd_module.py:14
  "we only calculate gradient for xyz1").

Design: instead of the CUDA kernels' atomic bid scatters, each auction round
is a dense, fully-vectorized step — value = -dist - price, top-2 per
bidder, scatter-max per item to pick winners — executed under
``lax.while_loop`` with early exit once every point is assigned. All state
is O(N); the (N, M) value matrix is transient and fuses on-chip. Unlike the
reference we exit early on convergence, which makes the eval setting
(iters=10000, emd README) affordable. Any points still unassigned after
``iters`` rounds fall back to their nearest neighbor (the reference leaves
them at assignment -1 and reads garbage — we do strictly better).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from houv_tpu.ops.chamfer import pairwise_sqdist

Array = jax.Array

# plain python floats: creating jnp scalars at import time initializes the
# XLA backend, which breaks jax.distributed.initialize in multi-host jobs
_NEG_INF = -1e30
_BIG_INT = 2**30


def _auction_single(x1: Array, x2: Array, eps: float, iters: int):
    """Auction for one pair of clouds: x1 (N,3) bidders, x2 (M,3) items."""
    n = x1.shape[0]
    m = x2.shape[0]
    dist = pairwise_sqdist(x1[None], x2[None])[0]  # (N, M)

    def cond(state):
        it, assignment, _, _ = state
        return jnp.logical_and(it < iters, jnp.any(assignment < 0))

    def body(state):
        it, assignment, assignment_inv, price = state
        unass = assignment < 0  # (N,)
        value = -dist - price[None, :]  # (N, M)
        # top-2 via two max passes (cheaper than lax.top_k's sort on TPU)
        best = jnp.max(value, axis=1)
        best_idx = jnp.argmax(value, axis=1).astype(jnp.int32)
        cols = jnp.arange(m, dtype=jnp.int32)
        masked = jnp.where(cols[None, :] == best_idx[:, None], -jnp.inf, value)
        better = jnp.max(masked, axis=1)
        inc = best - better + eps  # bid increment per bidder

        # Winner per item: max increment among unassigned bidders whose best
        # item is this one (replaces the atomicMax in the GetMax kernel).
        inc_masked = jnp.where(unass, inc, _NEG_INF)
        win_inc = jnp.full((m,), _NEG_INF).at[best_idx].max(
            inc_masked, mode="drop"
        )
        has_winner = win_inc > _NEG_INF / 2
        # Recover the argmax bidder: smallest row index achieving win_inc.
        is_winner = jnp.logical_and(unass, inc >= win_inc[best_idx])
        rows = jnp.arange(n, dtype=jnp.int32)
        win_row = jnp.full((m,), _BIG_INT).at[best_idx].min(
            jnp.where(is_winner, rows, _BIG_INT), mode="drop"
        )
        winner_exists = jnp.logical_and(has_winner, win_row < _BIG_INT)

        # Evict previous owners of items that changed hands.
        prev_owner = assignment_inv  # (M,)
        evict = jnp.logical_and(winner_exists, prev_owner >= 0)
        assignment = assignment.at[jnp.where(evict, prev_owner, n)].set(
            -1, mode="drop"
        )
        # Assign winners.
        items = jnp.arange(m, dtype=jnp.int32)
        assignment = assignment.at[jnp.where(winner_exists, win_row, n)].set(
            jnp.where(winner_exists, items, -1), mode="drop"
        )
        assignment_inv = jnp.where(winner_exists, win_row, assignment_inv)
        price = jnp.where(winner_exists, price + win_inc, price)
        return it + 1, assignment, assignment_inv, price

    init = (
        jnp.int32(0),
        jnp.full((n,), -1, dtype=jnp.int32),
        jnp.full((m,), -1, dtype=jnp.int32),
        jnp.zeros((m,), jnp.float32),
    )
    _, assignment, _, _ = jax.lax.while_loop(cond, body, init)

    # Leftover unassigned points (auction hit the iteration cap): nearest item.
    fallback = jnp.argmin(dist, axis=1).astype(jnp.int32)
    assignment = jnp.where(assignment < 0, fallback, assignment)
    d = jnp.take_along_axis(dist, assignment[:, None].astype(jnp.int32), axis=1)[:, 0]
    return d, assignment


def _emd_fwd_impl(x1: Array, x2: Array, eps: float, iters: int,
                  phases: int = 1, theta: float = 0.25):
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    if jax.default_backend() == "tpu" and x1.shape[1] == x2.shape[1]:
        # single-kernel auction: whole while_loop in VMEM (ops/emd_kernel.py)
        # — 17.5 ms per 8×2048-pt batch at train settings vs 8.9 s for the
        # per-round XLA chain below (BENCH_NOTES.md r2). Eval-grade budgets
        # (small ε -> thousands of price-war rounds among a few hundred
        # bidders) switch to compacted K-bidder tail rounds — same auction,
        # K/N the per-round cost (BENCH_NOTES r4 diagnosed dense rounds as
        # the reason ε-scaling lost; this removes the dense-round tax:
        # 542 -> 185 ms per 8x2048 eval batch). K=128/tail_rounds=64 is
        # pinned by measurement — current Mosaic's codegen quality swings
        # >100x between static configs of this kernel (BENCH_NOTES r5),
        # so deviate only with fresh chip numbers.
        from houv_tpu.ops.emd_kernel import emd_auction_pallas

        # Measurement-pinned configs (BENCH_NOTES r5): eval-grade budgets
        # K=128 (8x2048: 542 -> 181 ms), train-grade K=96 (11.7 ms, also
        # beats the r2 dense binary's 12.5). Both survive the current
        # toolchain's per-config codegen lottery; neighboring configs
        # (K=128 at iters=50, K=256, dense at iters<=300) compile into
        # binaries 100-5000x slower. Deviate only with fresh chip numbers.
        compact = (128 if iters >= 500 else 96) if phases == 1 else 0
        return emd_auction_pallas(x1, x2, eps, iters, phases=phases,
                                  theta=theta, compact_tail=compact,
                                  tail_rounds=64)
    # XLA fallback ignores phases: it is the correctness path, and a
    # single fixed-ε run at the requested ε meets the same contract.
    return jax.vmap(lambda a, b: _auction_single(a, b, eps, iters))(x1, x2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def emd_auction(
    x1: Array, x2: Array, eps: float = 0.005, iters: int = 50,
    phases: int = 1, theta: float = 0.25,
) -> tuple[Array, Array]:
    """Approximate EMD assignment. (B,N,3),(B,M,3) -> dist (B,N), assignment (B,N).

    eps/iters defaults follow the reference train setting (EMD README:8).
    Unlike the CUDA version there is no n % 1024 == 0 or batch <= 512
    constraint; n == m is still required for a meaningful matching.

    ``phases`` > 1 enables ε-scaling on the TPU kernel (ops/emd_kernel.py):
    same final-ε complementary-slackness guarantee, far fewer auction
    rounds at eval-grade ε. The reference's fixed-ε semantics are the
    default (phases=1).
    """
    return _emd_fwd_impl(x1, x2, eps, iters, phases, theta)


def _emd_fwd(x1, x2, eps, iters, phases, theta):
    dist, assignment = _emd_fwd_impl(x1, x2, eps, iters, phases, theta)
    return (dist, assignment), (x1, x2, assignment)


def _emd_bwd(eps, iters, phases, theta, res, g):
    x1, x2, assignment = res
    g_dist, _ = g
    matched = jnp.take_along_axis(
        x2.astype(jnp.float32), assignment[..., None].astype(jnp.int32), axis=1
    )
    g1 = 2.0 * g_dist[..., None] * (x1.astype(jnp.float32) - matched)
    return g1.astype(x1.dtype), jnp.zeros_like(x2)


emd_auction.defvjp(_emd_fwd, _emd_bwd)
