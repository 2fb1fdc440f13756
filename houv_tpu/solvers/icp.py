"""Batched point-to-point ICP — TPU-native.

Replaces the per-pair Open3D CPU loop of the reference
(registration/train_ICP.py:137-154: ``o3d.registration.registration_icp``
point-to-point, threshold 0.02, 500 iterations) and stands in for the
Go-ICP branch-and-bound baseline (registration/test_goicp.py:153-177) when
combined with multi-restart initialization.

Everything is batched: nearest neighbors come from the chamfer kernel's
argmin, the rigid update is a weighted Kabsch (correspondences beyond the
rejection threshold get zero weight), and the whole iteration runs in a
``lax.fori_loop`` under one jit — no per-pair Python, no host sync.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from houv_tpu.geometry.kabsch import weighted_kabsch
from houv_tpu.geometry.rotations import rt_to_transformation, rodrigues
from houv_tpu.ops.chamfer import chamfer

Array = jax.Array


@functools.partial(
    jax.jit, static_argnames=("max_iters", "use_pallas")
)
def icp_solve(
    src: Array,
    tgt: Array,
    *,
    threshold: float = 0.02,
    max_iters: int = 50,
    init_transform: Array | None = None,
    use_pallas: bool | None = None,
):
    """(B, N, 3) × (B, M, 3) -> dict(transform (B, 4, 4), inlier_rmse (B,)).

    threshold: max correspondence distance (Open3D semantics — pairs beyond
    it are excluded from the Kabsch update and the inlier RMSE).
    """
    bsz, n, _ = src.shape

    if init_transform is None:
        r0 = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), (bsz, 3, 3))
        t0 = jnp.zeros((bsz, 3), src.dtype)
    else:
        r0 = init_transform[:, :3, :3]
        t0 = init_transform[:, :3, 3]

    thresh_sq = threshold * threshold

    def body(_, state):
        r, t = state
        moved = (
            jnp.einsum(
                "bnc,bdc->bnd", src, r, precision=jax.lax.Precision.HIGHEST
            )
            + t[:, None, :]
        )
        d1, _, i1, _ = chamfer(moved, tgt, use_pallas)
        matched = jnp.take_along_axis(tgt, i1[..., None], axis=1)  # (B, N, 3)
        w = (d1 < thresh_sq).astype(src.dtype)  # inlier weights
        # Guard all-outlier pairs: fall back to uniform weights.
        any_in = jnp.sum(w, axis=1, keepdims=True) > 0
        w = jnp.where(any_in, w, jnp.ones_like(w))
        r_new, t_new = weighted_kabsch(src, matched, w)
        return r_new, t_new

    r, t = jax.lax.fori_loop(0, max_iters, body, (r0, t0))

    moved = (
        jnp.einsum("bnc,bdc->bnd", src, r, precision=jax.lax.Precision.HIGHEST)
        + t[:, None, :]
    )
    d1, _, _, _ = chamfer(moved, tgt, use_pallas)
    inlier = (d1 < thresh_sq).astype(src.dtype)
    denom = jnp.maximum(inlier.sum(axis=1), 1.0)
    inlier_rmse = jnp.sqrt((d1 * inlier).sum(axis=1) / denom)
    return {"transform": rt_to_transformation(r, t), "inlier_rmse": inlier_rmse}


@functools.partial(
    jax.jit, static_argnames=("max_iters", "n_restarts", "use_pallas")
)
def icp_solve_multistart(
    src: Array,
    tgt: Array,
    key: Array,
    *,
    n_restarts: int = 8,
    threshold: float = 0.1,
    max_iters: int = 50,
    use_pallas: bool | None = None,
):
    """Global-ish ICP: random rotation restarts, best inlier-RMSE wins
    (TPU-native stand-in for the Go-ICP baseline's global search)."""
    bsz = src.shape[0]
    k1, k2 = jax.random.split(key)
    axes = jax.random.normal(k1, (n_restarts, bsz, 3))
    angles = jax.random.uniform(k2, (n_restarts, bsz), maxval=2 * jnp.pi)
    # Restart 0 is the identity.
    angles = angles.at[0].set(0.0)

    def run(axis, angle):
        r0 = rodrigues(angle, axis)
        init = rt_to_transformation(r0, jnp.zeros((bsz, 3), src.dtype))
        out = icp_solve(
            src, tgt,
            threshold=threshold, max_iters=max_iters,
            init_transform=init, use_pallas=use_pallas,
        )
        return out["transform"], out["inlier_rmse"]

    transforms, rmses = jax.lax.map(lambda ab: run(*ab), (axes, angles))
    best = jnp.argmin(rmses, axis=0)  # (B,)
    tf = jnp.take_along_axis(
        transforms, best[None, :, None, None], axis=0
    )[0]
    rm = jnp.take_along_axis(rmses, best[None, :], axis=0)[0]
    return {"transform": tf, "inlier_rmse": rm}


def so3_grid(n_axes: int = 26, angles=(45.0, 90.0, 135.0, 180.0)) -> Array:
    """Deterministic covering of SO(3): the 3x3x3 integer-lattice axes
    (minus origin, the HOUV initialization lattice) x fixed angle rings +
    identity -> (n_axes*len(angles)+1, 3, 3) rotations. Max distance to an
    arbitrary rotation ~<= 30 deg — a branch-and-bound-style systematic
    coverage (the role of Go-ICP's outer SO(3) search,
    test_goicp.py:153-177) with a resolution bound instead of random luck.
    """
    import numpy as np

    axes = np.array(
        [
            (x, y, z)
            for x in (-1, 0, 1)
            for y in (-1, 0, 1)
            for z in (-1, 0, 1)
            if (x, y, z) != (0, 0, 0)
        ],
        np.float32,
    )[:n_axes]
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    rots = [jnp.eye(3, dtype=jnp.float32)]
    for ang in angles:
        a = jnp.asarray(axes)
        r = rodrigues(
            jnp.full((len(axes),), jnp.radians(ang), jnp.float32), a
        )
        rots.extend(list(r))
    return jnp.stack(rots)


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "chunk", "use_pallas", "refine_levels"),
)
def goicp_solve(
    src: Array,
    tgt: Array,
    *,
    threshold: float = 0.1,
    max_iters: int = 40,
    chunk: int = 5,
    use_pallas: bool | None = None,
    refine_levels: int = 2,
):
    """Systematic global ICP (the Go-ICP role): ICP from EVERY rotation of
    the deterministic SO(3) grid, best inlier-RMSE wins, then a coarse-to-
    fine refinement — each level perturbs the per-pair incumbent rotation
    by a halved angular radius over the lattice axes and keeps any
    improvement. This mirrors Go-ICP's hierarchical SO(3) subdivision
    (reference test_goicp.py:153-177); unlike true BnB there is no
    distance-transform lower bound to PRUNE cells, so optimality is
    resolution-bounded (~30°/2^levels) rather than certified — the
    keep-if-better merge still makes every level monotone.

    (B, N, 3) x (B, M, 3) -> dict(transform (B, 4, 4), inlier_rmse (B,)).
    """
    bsz = src.shape[0]
    grid = so3_grid()                                   # (G, 3, 3)
    g = grid.shape[0]
    pad = (-g) % chunk
    grid = jnp.concatenate(
        [grid, jnp.broadcast_to(jnp.eye(3, dtype=grid.dtype),
                                (pad, 3, 3))], 0
    ).reshape(-1, chunk, 3, 3)

    def run_from(init_r):
        """ICP from per-pair rotations init_r (B, 3, 3)."""
        init = rt_to_transformation(
            init_r, jnp.zeros((bsz, 3), src.dtype)
        )
        out = icp_solve(
            src, tgt, threshold=threshold, max_iters=max_iters,
            init_transform=init, use_pallas=use_pallas,
        )
        return out["transform"], out["inlier_rmse"]

    def run_chunk(rots):
        return jax.vmap(
            lambda r0: run_from(jnp.broadcast_to(r0, (bsz, 3, 3)))
        )(rots)

    transforms, rmses = jax.lax.map(run_chunk, grid)
    transforms = transforms.reshape(-1, bsz, 4, 4)
    rmses = rmses.reshape(-1, bsz)
    best = jnp.argmin(rmses, axis=0)
    tf = jnp.take_along_axis(
        transforms, best[None, :, None, None], axis=0
    )[0]
    rm = jnp.take_along_axis(rmses, best[None, :], axis=0)[0]

    # Coarse-to-fine: subdivide around the incumbent at radius 30°/2^level.
    import numpy as np

    axes = np.array(
        [
            (x, y, z)
            for x in (-1, 0, 1)
            for y in (-1, 0, 1)
            for z in (-1, 0, 1)
            if (x, y, z) != (0, 0, 0)
        ],
        np.float32,
    )
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    axes_j = jnp.asarray(axes)                          # (26, 3)

    for level in range(1, refine_levels + 1):
        radius = jnp.radians(30.0 / (2.0 ** level))
        deltas = rodrigues(
            jnp.full((axes_j.shape[0],), radius, jnp.float32), axes_j
        )                                               # (26, 3, 3)
        pad_d = (-deltas.shape[0]) % chunk
        deltas = jnp.concatenate(
            [deltas, jnp.broadcast_to(jnp.eye(3, dtype=deltas.dtype),
                                      (pad_d, 3, 3))], 0
        ).reshape(-1, chunk, 3, 3)
        r_inc = tf[:, :3, :3]                           # (B, 3, 3) incumbent

        def refine_chunk(drots, r_inc=r_inc):
            return jax.vmap(
                lambda d: run_from(jnp.einsum("ij,bjk->bik", d, r_inc))
            )(drots)

        tfs2, rms2 = jax.lax.map(refine_chunk, deltas)
        tfs2 = tfs2.reshape(-1, bsz, 4, 4)
        rms2 = rms2.reshape(-1, bsz)
        b2 = jnp.argmin(rms2, axis=0)
        tf2 = jnp.take_along_axis(tfs2, b2[None, :, None, None], axis=0)[0]
        rm2 = jnp.take_along_axis(rms2, b2[None, :], axis=0)[0]
        better = rm2 < rm                               # keep-if-better
        tf = jnp.where(better[:, None, None], tf2, tf)
        rm = jnp.where(better, rm2, rm)

    return {"transform": tf, "inlier_rmse": rm}
