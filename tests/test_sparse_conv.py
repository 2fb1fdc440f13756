"""Sparse-conv golden tests: gather-GEMM submanifold conv vs dense conv
(mirrors the reference's spconv numpy-comparison harness,
utils/mm3d_pn2/ops/spconv/test_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from houv_tpu.ops.sparse_conv import (
    SparseGrid,
    build_lookup,
    from_point_voxels,
    kernel_offsets,
    masked_max,
    sparse_conv_down,
    subm_conv,
    to_dense,
)


def _random_sparse(rng, b=2, n=40, g=8, c=5):
    grid_ind = rng.integers(0, g, (b, n, 3)).astype(np.int32)
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    return from_point_voxels(jnp.asarray(grid_ind), jnp.asarray(feats), g)


def _dense_subm_reference(sg, weights, kernel_size):
    """Dense conv over the voxelized volume, masked to occupied sites."""
    dense = np.asarray(to_dense(sg))  # (B, G, G, G, C)
    occ = (np.abs(dense).sum(-1) > 0) | False
    # occupancy from mask/coords, not features (features can be zero):
    occ = np.zeros(dense.shape[:4], bool)
    coords = np.asarray(sg.coords)
    mask = np.asarray(sg.mask)
    for b in range(dense.shape[0]):
        for v in range(coords.shape[1]):
            if mask[b, v]:
                x, y, z = coords[b, v]
                occ[b, x, y, z] = True
    offsets = kernel_offsets(kernel_size)
    w = np.asarray(weights)
    g = dense.shape[1]
    out = np.zeros(dense.shape[:4] + (w.shape[-1],), np.float32)
    for i, (dx, dy, dz) in enumerate(offsets):
        for x in range(g):
            for y in range(g):
                for z in range(g):
                    nx, ny, nz = x + dx, y + dy, z + dz
                    if 0 <= nx < g and 0 <= ny < g and 0 <= nz < g:
                        if occ[:, nx, ny, nz].any():
                            for b in range(dense.shape[0]):
                                if occ[b, nx, ny, nz]:
                                    out[b, x, y, z] += dense[b, nx, ny, nz] @ w[i]
    out[~occ] = 0.0  # submanifold: outputs only at active sites
    return out, occ


def test_from_point_voxels_dedupes(rng):
    sg = _random_sparse(rng)
    coords = np.asarray(sg.coords)
    mask = np.asarray(sg.mask)
    for b in range(coords.shape[0]):
        valid = coords[b][mask[b]]
        assert len({tuple(r) for r in valid}) == len(valid)


def test_subm_conv_matches_dense(rng):
    for kernel in [(1, 3, 3), (3, 1, 3), (3, 3, 3), (1, 1, 3)]:
        sg = _random_sparse(rng, b=2, n=30, g=6, c=4)
        k = int(np.prod(kernel))
        w = jnp.asarray(rng.standard_normal((k, 4, 7)).astype(np.float32) * 0.3)
        lk = build_lookup(sg)
        out = subm_conv(sg, lk, w, kernel)
        dense_out, occ = _dense_subm_reference(sg, w, kernel)
        ours_dense = np.asarray(to_dense(out))
        np.testing.assert_allclose(ours_dense, dense_out, rtol=1e-3, atol=1e-4)


def test_sparse_down_halves_grid(rng):
    sg = _random_sparse(rng, b=1, n=30, g=8, c=4)
    w = jnp.asarray(rng.standard_normal((27, 4, 6)).astype(np.float32) * 0.3)
    lk = build_lookup(sg)
    out = sparse_conv_down(sg, lk, w, (2, 2, 2))
    assert out.grid_size == 4
    coords = np.asarray(out.coords)[np.asarray(out.mask)]
    assert (coords >= 0).all() and (coords < 4).all()
    # output sites = unique floor-divided input sites
    in_coarse = {
        tuple(c // 2) for c in np.asarray(sg.coords)[np.asarray(sg.mask)]
    }
    out_sites = {tuple(c) for c in coords}
    assert out_sites == in_coarse


def test_masked_max_ignores_padding(rng):
    sg = _random_sparse(rng, b=2, n=20, g=6, c=3)
    # poison padded rows with large values: masked_max must ignore them
    poisoned = sg.features.at[~sg.mask].set(1e9)
    sg2 = SparseGrid(poisoned, sg.coords, sg.mask, sg.grid_size)
    out = np.asarray(masked_max(sg2))
    assert (out < 1e8).all()


def test_anisotropic_stride(rng):
    sg = _random_sparse(rng, b=1, n=25, g=8, c=4)
    w = jnp.asarray(rng.standard_normal((27, 4, 4)).astype(np.float32) * 0.3)
    out = sparse_conv_down(sg, build_lookup(sg), w, (2, 2, 1))
    assert out.grid_size == 8  # z dim unreduced -> extent stays 8
    coords = np.asarray(out.coords)[np.asarray(out.mask)]
    assert (coords[:, 0] < 4).all() and (coords[:, 1] < 4).all()
    assert (coords[:, 2] < 8).all()
