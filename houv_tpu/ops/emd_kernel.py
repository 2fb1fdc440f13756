"""Auction EMD as ONE Pallas kernel — the r2 rework of ops/emd.py.

Reference: utils/metrics/EMD/emd_cuda.cu:23-284 (kernels clear/
calc_unass_cnt/calc_unass_cnt_sum/calc_unass_idx/Bid/GetMax/Assign/
CalcDist). The r1 JAX implementation ran each auction round as a separate
XLA dispatch chain with three serialized scatters per round (~1.1 s/pair,
~4.5 min compile). Here the whole auction lives in one kernel:

- the (N, M) distance matrix is computed once into VMEM scratch,
- each round is ~12 VPU passes over that block: packed-key top-2 per
  bidder, a packed column max-reduce electing the winning bid per item
  (replacing the CUDA atomic GetMax), and an ownership-membership pass
  replacing the assignment scatters,
- rounds run in an in-kernel ``lax.while_loop`` with early exit once every
  bidder owns an item.

The packed-key trick (shared with ops/chamfer.py): an IEEE f32 v <= 0 maps
monotonically to int32 via ``bitcast(v) ^ 0x7FFFFFFF``; clearing the low
``idx_bits`` and OR-ing a complemented index makes (value, index) maxima
recoverable from one int max-reduce. Bid values are <= 0 because prices
are nonnegative and distances nonnegative; bid increments are packed with
their own sign handled by the same map (increments are >= eps > 0, so
their packed form uses the nonnegative branch: ``bitcast(v) | 0x80000000``
— handled by always packing ``-inc`` instead, keeping values <= 0).

Gradient contract matches the reference (emd_module.py:14): gradient flows
to x1 only, through the matched pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _emd_kernel(x1_ref, x2_ref, eps_ref, assign_ref, dist_ref, dmat_ref, *,
                n_valid: int, iters: int, idx_bits: int, phases: int = 1,
                theta: float = 0.25):
    """One pair per grid step.

    x1_ref/x2_ref: (1, 8, Np/Mp) coordinate-major clouds; eps_ref: (1, 1)
    SMEM scalar; assign_ref: (1, Np) int32 item per bidder; dist_ref:
    (1, Np) matched squared distance; dmat_ref: (Np, Mp) f32 VMEM scratch.

    ``phases`` > 1 enables ε-SCALING (Bertsekas' standard acceleration,
    absent from the reference's fixed-ε CUDA auction): phase p runs the
    auction at ε·θ^(phases-1-p), keeping the learned PRICES across phases
    but restarting the assignment. Early phases move prices in large
    steps; the final phase runs at the requested ε, so the result carries
    the same ε-complementary-slackness guarantee as a fixed-ε run — only
    reached in far fewer total rounds (the fixed-ε round count scales
    like max|d|/ε; scaling costs ~N rounds per phase).
    """
    np_ = dmat_ref.shape[0]
    mp = dmat_ref.shape[1]
    low = (1 << idx_bits) - 1
    neg_inf = -(2**31) + 1
    order_flip = 0x7FFFFFFF
    eps = eps_ref[0, 0]

    x1 = x1_ref[0]   # (8, Np)
    x2 = x2_ref[0]   # (8, Mp)

    # Distance matrix once into scratch: rows = bidders, cols = items.
    # Padded rows/cols carry +4e18 so real bidders never prefer them.
    a0 = x1[0:1, :].T  # (Np, 1)
    a1 = x1[1:2, :].T
    a2 = x1[2:3, :].T
    dmat = (
        jnp.square(a0 - x2[0:1, :])
        + jnp.square(a1 - x2[1:2, :])
        + jnp.square(a2 - x2[2:3, :])
    )
    if n_valid < np_:
        rows = jax.lax.broadcasted_iota(jnp.int32, (np_, mp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (np_, mp), 1)
        pad = jnp.logical_or(rows >= n_valid, cols >= n_valid)
        # padded bidder <-> padded item matches are free; everything else
        # involving padding is prohibitively far
        diag_pad = jnp.logical_and(pad, rows == cols)
        dmat = jnp.where(pad, jnp.float32(4e18), dmat)
        dmat = jnp.where(diag_pad, 0.0, dmat)
    dmat_ref[:, :] = dmat

    col_i = jax.lax.broadcasted_iota(jnp.int32, (np_, mp), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (np_, mp), 0)
    bidder_i = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    item_rows = jax.lax.broadcasted_iota(jnp.int32, (mp, np_), 0)

    def pack_leq0(v, inv_idx):
        """v (..., K) f32 <= 0 -> monotonic int32 key with index low bits."""
        ordered = pltpu.bitcast(v, jnp.int32) ^ order_flip
        return jnp.bitwise_or(
            jnp.bitwise_and(ordered, ~jnp.int32(low)), inv_idx
        )

    def body(state):
        it, owner, price, n_unass, eps_p = state
        # owner (1, Mp) int32 bidder-per-item (-1 = unowned);
        # price (1, Mp) f32 >= 0; n_unass traced scalar; eps_p the
        # phase's bid increment (== eps when phases == 1).
        d = dmat_ref[:, :]
        value = -d - price  # (Np, Mp), <= 0
        kv = pack_leq0(value, low - col_i)
        rowmax = jnp.max(kv, axis=1, keepdims=True)       # (Np, 1)
        onehot = kv == rowmax                              # exact one-hot
        best = jnp.max(jnp.where(onehot, value, -jnp.inf), axis=1,
                       keepdims=True)
        better = jnp.max(jnp.where(onehot, -jnp.inf, value), axis=1,
                         keepdims=True)                    # (Np, 1)
        inc = best - better + eps_p                        # (Np, 1) > 0

        # membership: bidder i is assigned iff some item's owner == i
        assigned = jnp.max(
            jnp.where(owner.T == bidder_i, 1, 0), axis=0, keepdims=True
        )                                                  # (1, Np)
        unass_col = assigned.T == 0                        # (Np, 1)

        # bids: unassigned bidders bid inc on their best item; packed as
        # -inc (<= 0) so the same order map applies; column max elects the
        # winning (largest-inc, smallest-row) bid per item
        bid_ok = jnp.logical_and(onehot, unass_col)
        kb = jnp.where(
            bid_ok,
            pack_leq0(jnp.broadcast_to(-inc, (np_, mp)), low - row_i),
            neg_inf,
        )
        win = jnp.max(kb, axis=0, keepdims=True)           # (1, Mp)
        has_winner = win > neg_inf
        win_row = low - jnp.bitwise_and(win, low)          # (1, Mp)
        # recover the (quantized) increment: clear index bits, invert map
        win_inc = -pltpu.bitcast(
            jnp.bitwise_and(win, ~jnp.int32(low)) ^ order_flip, jnp.float32
        )
        owner = jnp.where(has_winner, win_row, owner)
        price = jnp.where(has_winner, price + win_inc, price)

        assigned2 = jnp.max(
            jnp.where(owner.T == bidder_i, 1, 0), axis=0, keepdims=True
        )
        n_unass = jnp.sum(1 - assigned2)
        return it + 1, owner, price, n_unass, eps_p

    def cond(state):
        it, _, _, n_unass, _ = state
        return jnp.logical_and(it < iters, n_unass > 0)

    no_owner = jnp.full((1, mp), -1, jnp.int32)
    zero_price = jnp.zeros((1, mp), jnp.float32)
    if phases == 1:
        init = (jnp.int32(0), no_owner, zero_price, jnp.int32(np_), eps)
        _, owner, _, _, _ = jax.lax.while_loop(cond, body, init)
    else:
        # ε-scaling: each phase restarts the assignment but keeps prices;
        # the last phase runs at the requested ε. The per-phase ε rides
        # the loop carry (eps·θ^k with a traced exponent lowers to
        # math.powf, which Mosaic cannot legalize).
        def run_phase(p, carry):
            _, price, eps_p = carry
            init = (jnp.int32(0), no_owner, price, jnp.int32(np_), eps_p)
            _, owner, price, _, _ = jax.lax.while_loop(cond, body, init)
            return owner, price, eps_p * theta

        eps0 = eps * float(theta) ** -(phases - 1)
        owner, _, _ = jax.lax.fori_loop(
            0, phases, run_phase, (no_owner, zero_price, eps0)
        )

    # assignment per bidder from owner-per-item: packed max over the
    # membership matrix (complemented item index -> smallest item wins)
    member = owner.T == bidder_i                           # (Mp, Np)
    ka = jnp.where(member, low - item_rows, neg_inf)
    amax = jnp.max(ka, axis=0, keepdims=True)              # (1, Np)
    assignment = low - jnp.bitwise_and(amax, low)
    has_item = amax > neg_inf

    # fallback for bidders left unassigned at the iteration cap: nearest
    # item (the reference leaves them at -1 and reads garbage)
    d = dmat_ref[:, :]
    kn = pack_leq0(-d, low - col_i)
    nnmax = jnp.max(kn, axis=1, keepdims=True)             # (Np, 1)
    nearest = (low - jnp.bitwise_and(nnmax, low)).T        # (1, Np)
    assignment = jnp.where(has_item, assignment, nearest)
    assign_ref[0, 0, :] = assignment[0]

    # matched distance via the exact one-hot of the chosen column
    chosen = col_i == assignment.T                         # (Np, Mp)
    dist_ref[0, 0, :] = jnp.max(jnp.where(chosen, d, -jnp.inf), axis=1)


@functools.partial(
    jax.jit, static_argnames=("iters", "interpret", "phases", "theta")
)
def emd_auction_pallas(x1: Array, x2: Array, eps: float | Array = 0.005,
                       iters: int = 50, interpret: bool = False,
                       phases: int = 1, theta: float = 0.25):
    """(B, N, 3) × (B, N, 3) -> (dist (B, N), assignment (B, N)).

    ``phases`` > 1 = ε-scaling (see _emd_kernel): same final-ε guarantee,
    far fewer rounds at small ε. ``iters`` caps EACH phase (early exit
    makes the cap slack)."""
    bsz, n, _ = x1.shape
    m = x2.shape[1]
    if n != m:
        raise ValueError("auction EMD requires n == m")
    np_ = _round_up(n, _LANE)
    idx_bits = int(np_ - 1).bit_length()

    x1t = jnp.swapaxes(x1.astype(jnp.float32), 1, 2)
    x1t = jnp.pad(x1t, ((0, 0), (0, 8 - 3), (0, np_ - n)))
    x2t = jnp.swapaxes(x2.astype(jnp.float32), 1, 2)
    x2t = jnp.pad(x2t, ((0, 0), (0, 8 - 3), (0, np_ - m)))
    eps_arr = jnp.full((1, 1), eps, jnp.float32)

    assignment, dist = pl.pallas_call(
        functools.partial(
            _emd_kernel, n_valid=n, iters=iters, idx_bits=idx_bits,
            phases=phases, theta=theta,
        ),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, 8, np_), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, np_), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, np_), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 1, np_), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 1, np_), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((np_, np_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x1t, x2t, eps_arr)
    return dist[:, 0, :n], assignment[:, 0, :n]
