"""Chamfer kernel tests: Pallas-vs-jnp golden parity, gradients, torch cross-check.

Mirrors the reference's kernel test strategy (utils/metrics/CD/unit_test.py:
CUDA vs pure-python chamfer, distance MSE < 1e-8 and exact index equality).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from houv_tpu.ops.chamfer import chamfer, chamfer_reference, pairwise_sqdist


def _torch_chamfer(a, b):
    """Independent golden model (same as reference chamfer_python.distChamfer)."""
    a = torch.from_numpy(np.asarray(a))
    b = torch.from_numpy(np.asarray(b))
    d = torch.cdist(a, b) ** 2
    d1, i1 = d.min(dim=2)
    d2, i2 = d.min(dim=1)
    return d1.numpy(), d2.numpy(), i1.numpy(), i2.numpy()


@pytest.mark.parametrize("n,m", [(128, 128), (200, 300), (512, 256)])
def test_reference_matches_torch(rng, n, m):
    a = rng.standard_normal((3, n, 3)).astype(np.float32)
    b = rng.standard_normal((3, m, 3)).astype(np.float32)
    d1, d2, i1, i2 = chamfer_reference(jnp.asarray(a), jnp.asarray(b))
    td1, td2, ti1, ti2 = _torch_chamfer(a, b)
    np.testing.assert_allclose(np.asarray(d1), td1, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), td2, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), ti1)
    np.testing.assert_array_equal(np.asarray(i2), ti2)


@pytest.mark.parametrize("n,m", [(256, 256), (300, 200), (2048, 2048)])
def test_pallas_interpret_matches_reference(rng, n, m):
    a = jnp.asarray(rng.standard_normal((2, n, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, m, 3)).astype(np.float32))
    rd1, rd2, ri1, ri2 = chamfer_reference(a, b)
    pd1, pd2, pi1, pi2 = chamfer(
        a, b, use_pallas=True, interpret=True, exact_scores=True
    )
    # Different float formulations; allow noise, and index differences only
    # on near-ties (where both choices give the same distance).
    np.testing.assert_allclose(np.asarray(pd1), np.asarray(rd1), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pd2), np.asarray(rd2), rtol=1e-3, atol=1e-5)
    for pi, ri, pd, rd in ((pi1, ri1, pd1, rd1), (pi2, ri2, pd2, rd2)):
        mismatch = np.asarray(pi) != np.asarray(ri)
        if mismatch.any():
            assert np.abs(np.asarray(pd) - np.asarray(rd))[mismatch].max() < 1e-5


@pytest.mark.parametrize("n,m", [(256, 256)])
def test_pallas_bf16_scores_near_exact(rng, n, m):
    """The default bf16 MXU scoring may flip argmin on near-ties only:
    selected distances must stay within bf16 noise of the true minimum."""
    a = jnp.asarray(rng.standard_normal((2, n, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, m, 3)).astype(np.float32))
    rd1, rd2, _, _ = chamfer_reference(a, b)
    pd1, pd2, _, _ = chamfer(
        a, b, use_pallas=True, interpret=True, exact_scores=False
    )
    assert float(jnp.abs(pd1 - rd1).max()) < 5e-2
    assert float(jnp.mean(jnp.abs(pd1 - rd1))) < 2e-3


def test_fast_truncated_mean_matches_topk(rng):
    from houv_tpu.metrics.cd import _safe_sqrt, _smallest_k, smallest_k_sqrt_mean_fast

    d = jnp.asarray(rng.uniform(0, 2, (16, 2048)).astype(np.float32))
    k = 1024
    exact = _safe_sqrt(_smallest_k(d, k)).mean(axis=-1)
    fast = smallest_k_sqrt_mean_fast(d, k)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-3, atol=1e-4)


def test_gradient_matches_autodiff(rng):
    """Custom VJP must equal autodiff through the dense jnp formulation."""
    a = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 80, 3)).astype(np.float32))

    def loss_custom(a, b):
        d1, d2, _, _ = chamfer(a, b, use_pallas=False)
        return d1.mean() + 0.5 * d2.mean()

    def loss_dense(a, b):
        d = pairwise_sqdist(a, b)
        return jnp.min(d, axis=-1).mean() + 0.5 * jnp.min(d, axis=-2).mean()

    ga_c, gb_c = jax.grad(loss_custom, argnums=(0, 1))(a, b)
    ga_d, gb_d = jax.grad(loss_dense, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga_c), np.asarray(ga_d), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_c), np.asarray(gb_d), rtol=1e-4, atol=1e-6)


def test_rigid_invariance(rng):
    """Property: CD(Ra+t, Rb+t) == CD(a, b)."""
    from houv_tpu.geometry import rodrigues
    from houv_tpu.geometry.rotations import transform_points

    a = jnp.asarray(rng.standard_normal((2, 128, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 128, 3)).astype(np.float32))
    r = rodrigues(jnp.array(0.7), jnp.array([0.3, -1.0, 0.5]))
    t = jnp.array([0.1, -0.2, 0.05])
    d1, d2, _, _ = chamfer_reference(a, b)
    d1r, d2r, _, _ = chamfer_reference(
        transform_points(a, r, t), transform_points(b, r, t)
    )
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1r), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2r), rtol=1e-3, atol=1e-5)


def test_identical_clouds_zero(rng):
    a = jnp.asarray(rng.standard_normal((1, 100, 3)).astype(np.float32))
    d1, d2, i1, i2 = chamfer_reference(a, a)
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.arange(100)[None])


@pytest.mark.parametrize("n,m", [(256, 256), (300, 200), (2048, 2048)])
def test_fused_both_directions_interpret(rng, n, m):
    """The fused dual-direction packed-index kernel returns the same
    argmins as the dense reference (up to genuinely equidistant ties)."""
    from houv_tpu.ops.chamfer import chamfer_indices

    a = jnp.asarray(rng.standard_normal((2, n, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, m, 3)).astype(np.float32))
    i1, i2 = chamfer_indices(a, b, use_pallas=True, interpret=True)
    d1r, d2r, i1r, i2r = chamfer_reference(a, b)
    assert i1.shape == (2, n) and i2.shape == (2, m)
    # compare via distances: packed selection may differ only on ties within
    # the 2^-12 quantization window
    d1 = jnp.sum((a - jnp.take_along_axis(b, i1[..., None], 1)) ** 2, -1)
    d2 = jnp.sum((b - jnp.take_along_axis(a, i2[..., None], 1)) ** 2, -1)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1r),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2r),
                               rtol=5e-4, atol=1e-6)
    # overwhelming index agreement (ties are rare in random data)
    assert (np.asarray(i1) == np.asarray(i1r)).mean() > 0.999
    assert (np.asarray(i2) == np.asarray(i2r)).mean() > 0.999


def test_fused_indices_cpu_fallback(rng):
    from houv_tpu.ops.chamfer import chamfer_indices

    a = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 96, 3)).astype(np.float32))
    i1, i2 = chamfer_indices(a, b, use_pallas=False)
    _, _, i1r, i2r = chamfer_reference(a, b)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i1r))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i2r))


def test_nn_select_coords_match_reference(rng):
    """nn_select_pallas (interpret) emits the same matched coordinates as
    gathering with the dense-reference argmins, with the query cloud
    shared across K restarts (the solver layout)."""
    from houv_tpu.ops.chamfer import chamfer_reference, nn_select_pallas

    bsz, k, n, m = 2, 8, 96, 100
    a = jnp.asarray(rng.standard_normal((bsz, n, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((bsz * k, m, 3)).astype(np.float32))
    c1, c2 = nn_select_pallas(a, b, interpret=True)
    assert c1.shape == (bsz * k, n, 3) and c2.shape == (bsz * k, m, 3)
    a_rep = jnp.repeat(a, k, axis=0)
    _, _, i1r, i2r = chamfer_reference(a_rep, b)
    c1r = jnp.take_along_axis(b, i1r[..., None], axis=1)
    c2r = jnp.take_along_axis(a_rep, i2r[..., None], axis=1)
    # selection quantizes at 2^-12 relative; coords of near-equidistant
    # alternates can differ, so compare the resulting DISTANCES
    d1 = jnp.sum((a_rep - c1) ** 2, -1)
    d1r = jnp.sum((a_rep - c1r) ** 2, -1)
    d2 = jnp.sum((b - c2) ** 2, -1)
    d2r = jnp.sum((b - c2r) ** 2, -1)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1r),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2r),
                               rtol=5e-4, atol=1e-6)
    # and the coords themselves agree wherever the argmin agrees
    c1_exact = np.isclose(np.asarray(c1), np.asarray(c1r),
                          rtol=1e-5, atol=1e-6).all(-1)
    c2_exact = np.isclose(np.asarray(c2), np.asarray(c2r),
                          rtol=1e-5, atol=1e-6).all(-1)
    assert c1_exact.mean() > 0.995 and c2_exact.mean() > 0.995


def test_gathered_pair_dists_select_vs_gather(rng):
    """The select-kernel objective path must reproduce the gather path's
    d1/d2 AND their gradients wrt (R, T) (the solver's only trainables)."""
    import jax

    from houv_tpu.solvers.houv import _gathered_pair_dists

    bsz, k, n, m = 1, 8, 64, 64
    src = jnp.asarray(rng.standard_normal((bsz, n, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((bsz, m, 3)).astype(np.float32))
    # a valid rotation per restart (square-orthonormalized noise)
    q = rng.standard_normal((bsz, k, 3, 3)).astype(np.float32)
    r = np.linalg.qr(q)[0].astype(np.float32)
    r = jnp.asarray(r)
    t = jnp.asarray(0.1 * rng.standard_normal((bsz, k, 3)).astype(np.float32))

    def build(r, t, select):
        src_t = jnp.einsum("bnc,bkdc->bknd", src, r) + t[:, :, None, :]
        d1, d2 = _gathered_pair_dists(
            src, tgt, src_t, r, t, use_pallas=False,
            interpret=bool(select),
        )
        return d1, d2

    d1s, d2s = build(r, t, True)
    d1g, d2g = build(r, t, False)
    np.testing.assert_allclose(np.asarray(d1s), np.asarray(d1g),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d2s), np.asarray(d2g),
                               rtol=1e-4, atol=2e-5)

    def loss(rt, select):
        r, t = rt
        d1, d2 = build(r, t, select)
        return d1.mean() + d2.mean()

    gs = jax.grad(loss)((r, t), True)
    gg = jax.grad(loss)((r, t), False)
    for a_, b_ in zip(jax.tree_util.tree_leaves(gs),
                      jax.tree_util.tree_leaves(gg)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-3, atol=2e-4)


def test_mxu_scores_indices_match(rng):
    """The extended-channel MXU score form selects the same neighbors as
    the exact diff form away from ties (random clouds: ties measure-zero
    at f32-grade score precision)."""
    from houv_tpu.ops.chamfer import chamfer_indices

    a = jnp.asarray(rng.standard_normal((4, 200, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4, 300, 3)).astype(np.float32))
    i1d, i2d = chamfer_indices(a, b, interpret=True)
    i1m, i2m = chamfer_indices(a, b, interpret=True, mxu_scores=True)
    # scores quantize differently; argmin flips only for near-ties, so
    # compare the resulting exact distances
    d1d = jnp.sum((a - jnp.take_along_axis(b, i1d[..., None], 1)) ** 2, -1)
    d1m = jnp.sum((a - jnp.take_along_axis(b, i1m[..., None], 1)) ** 2, -1)
    d2d = jnp.sum((b - jnp.take_along_axis(a, i2d[..., None], 1)) ** 2, -1)
    d2m = jnp.sum((b - jnp.take_along_axis(a, i2m[..., None], 1)) ** 2, -1)
    np.testing.assert_allclose(np.asarray(d1m), np.asarray(d1d),
                               rtol=1e-3, atol=3e-5)
    np.testing.assert_allclose(np.asarray(d2m), np.asarray(d2d),
                               rtol=1e-3, atol=3e-5)
    assert (np.asarray(i1m) == np.asarray(i1d)).mean() > 0.99
    assert (np.asarray(i2m) == np.asarray(i2d)).mean() > 0.99


def test_shared_query_indices_match_broadcast(rng):
    """The shared-query kernel layout (a stored once per K restart rows)
    returns exactly the indices of the broadcast layout."""
    from houv_tpu.ops.chamfer import chamfer_indices

    bsz, k, n, m = 2, 8, 96, 130
    a = jnp.asarray(rng.standard_normal((bsz, n, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((bsz * k, m, 3)).astype(np.float32))
    i1s, i2s = chamfer_indices(a, b, interpret=True)
    a_rep = jnp.repeat(a, k, axis=0)
    i1r, i2r = chamfer_indices(a_rep, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1s), np.asarray(i1r))
    np.testing.assert_array_equal(np.asarray(i2s), np.asarray(i2r))
    # XLA fallback accepts the mismatched batch too
    i1x, i2x = chamfer_indices(a, b, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(i1x), np.asarray(i1r))
    np.testing.assert_array_equal(np.asarray(i2x), np.asarray(i2r))


def test_shared_query_rejects_bad_split(rng):
    from houv_tpu.ops.chamfer import _nn_both_pallas

    a = jnp.zeros((3, 32, 3), jnp.float32)
    b = jnp.zeros((12, 32, 3), jnp.float32)   # k_share=4 not multiple of 8
    import pytest
    with pytest.raises(ValueError):
        _nn_both_pallas(a, b, interpret=True)
