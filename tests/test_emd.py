"""EMD auction tests: vs scipy Hungarian golden, self-verification invariants
(mirroring the reference's test_emd, utils/metrics/EMD/emd_module.py:90-104)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from houv_tpu.metrics import calc_cd, calc_emd
from houv_tpu.ops.emd import emd_auction


def _hungarian_emd(x1, x2):
    """Exact optimal assignment cost (mean squared distance)."""
    costs = []
    for a, b in zip(x1, x2):
        d = np.linalg.norm(a[:, None] - b[None], axis=-1) ** 2
        r, c = linear_sum_assignment(d)
        costs.append(d[r, c].mean())
    return np.array(costs)


def test_auction_close_to_hungarian(rng):
    x1 = rng.uniform(0, 1, (4, 64, 3)).astype(np.float32)
    x2 = rng.uniform(0, 1, (4, 64, 3)).astype(np.float32)
    dist, assignment = emd_auction(jnp.asarray(x1), jnp.asarray(x2), 0.002, 5000)
    exact = _hungarian_emd(x1, x2)
    approx = np.asarray(dist).mean(axis=1)
    # Auction with small eps: within eps*scale of optimal.
    assert (approx <= exact + 0.01).all()
    assert (approx >= exact - 1e-6).all()  # can't beat the optimum


def test_assignment_is_permutation(rng):
    x1 = rng.uniform(0, 1, (2, 128, 3)).astype(np.float32)
    x2 = rng.uniform(0, 1, (2, 128, 3)).astype(np.float32)
    _, assignment = emd_auction(jnp.asarray(x1), jnp.asarray(x2), 0.005, 3000)
    a = np.asarray(assignment)
    for b in range(2):
        assert len(set(a[b].tolist())) == 128  # bijection when converged


def test_dist_self_consistent(rng):
    """Reference invariant: gathering x2 by assignment reproduces dist."""
    x1 = rng.uniform(0, 1, (2, 64, 3)).astype(np.float32)
    x2 = rng.uniform(0, 1, (2, 64, 3)).astype(np.float32)
    dist, assignment = emd_auction(jnp.asarray(x1), jnp.asarray(x2), 0.005, 500)
    a = np.asarray(assignment)
    matched = np.take_along_axis(x2, a[..., None], axis=1)
    d = ((x1 - matched) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dist), d, rtol=1e-4, atol=1e-6)


def test_identical_clouds_zero(rng):
    x = rng.uniform(0, 1, (1, 64, 3)).astype(np.float32)
    out = np.asarray(calc_emd(jnp.asarray(x), jnp.asarray(x), 0.002, 2000))
    np.testing.assert_allclose(out, 0.0, atol=5e-3)


def test_emd_geq_one_sided_cd(rng):
    """Property: EMD (bijective matching) >= one-sided nearest-neighbor CD."""
    x1 = rng.uniform(0, 1, (2, 64, 3)).astype(np.float32)
    x2 = rng.uniform(0, 1, (2, 64, 3)).astype(np.float32)
    emd_v = np.asarray(calc_emd(jnp.asarray(x1), jnp.asarray(x2), 0.002, 3000))
    cd_p, _ = calc_cd(jnp.asarray(x1), jnp.asarray(x2))
    assert (emd_v >= np.asarray(cd_p) - 1e-5).all()


def test_gradient_only_to_x1(rng):
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(0, 1, (1, 32, 3)).astype(np.float32))

    def loss(a, b):
        d, _ = emd_auction(a, b, 0.005, 200)
        return d.mean()

    g1, g2 = jax.grad(loss, argnums=(0, 1))(x1, x2)
    assert np.abs(np.asarray(g1)).sum() > 0
    np.testing.assert_allclose(np.asarray(g2), 0.0)
    # Gradient formula: 2*(x1 - matched)/N
    _, assignment = emd_auction(x1, x2, 0.005, 200)
    matched = jnp.take_along_axis(x2, assignment[..., None], axis=1)
    expected = 2.0 * (x1 - matched) / 32.0
    np.testing.assert_allclose(np.asarray(g1), np.asarray(expected), rtol=1e-4)


def test_pallas_kernel_matches_dense_auction(rng):
    """The single-kernel auction (interpret mode) agrees with the dense
    per-round implementation: near-bijective assignment, close mean cost."""
    import jax.numpy as jnp

    from houv_tpu.ops.emd import emd_auction
    from houv_tpu.ops.emd_kernel import emd_auction_pallas

    x1 = jnp.asarray(rng.uniform(0, 1, (2, 256, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(0, 1, (2, 256, 3)).astype(np.float32))
    d_new, a_new = emd_auction_pallas(x1, x2, 0.005, 80, interpret=True)
    d_old, a_old = emd_auction(x1, x2, 0.005, 80)
    assert abs(float(d_new.mean()) - float(d_old.mean())) \
        / float(d_old.mean()) < 0.15
    for b in range(2):
        assert len(np.unique(np.asarray(a_new[b]))) > 0.93 * 256
    # each selected distance must be the true pair distance
    diff = x1 - jnp.take_along_axis(x2, a_new[..., None], axis=1)
    np.testing.assert_allclose(
        np.asarray((diff ** 2).sum(-1)), np.asarray(d_new), rtol=1e-5,
        atol=1e-6,
    )


def test_pallas_kernel_identity_assignment(rng):
    """Identical clouds: the auction finds the zero-cost perfect matching."""
    import jax.numpy as jnp

    from houv_tpu.ops.emd_kernel import emd_auction_pallas

    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 3)).astype(np.float32))
    perm = rng.permutation(128)
    d, a = emd_auction_pallas(x, x[:, perm], 0.002, 500, interpret=True)
    assert float(d.mean()) < 1e-4


def test_pallas_eps_scaling_matches_fixed_eps(rng):
    """ε-scaling (phases>1) keeps the final-ε quality contract: cost within
    the fixed-ε run's tolerance of the Hungarian optimum, bijective
    assignment, exact per-pair distances."""
    from houv_tpu.ops.emd_kernel import emd_auction_pallas

    x1 = rng.uniform(0, 1, (2, 128, 3)).astype(np.float32)
    x2 = rng.uniform(0, 1, (2, 128, 3)).astype(np.float32)
    j1, j2 = jnp.asarray(x1), jnp.asarray(x2)
    d_s, a_s = emd_auction_pallas(j1, j2, 0.002, 2000, interpret=True,
                                  phases=4, theta=0.1)
    exact = _hungarian_emd(x1, x2)
    approx = np.asarray(d_s).mean(axis=1)
    assert (approx <= exact + 0.01).all()
    assert (approx >= exact - 1e-6).all()
    for b in range(2):
        assert len(np.unique(np.asarray(a_s[b]))) == 128
    diff = j1 - jnp.take_along_axis(j2, a_s[..., None], axis=1)
    np.testing.assert_allclose(
        np.asarray((diff ** 2).sum(-1)), np.asarray(d_s), rtol=1e-5,
        atol=1e-6,
    )


def test_emd_auction_phases_public_api(rng):
    """phases threads through emd_auction + its VJP (gradient to x1 only)."""
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 64, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(0, 1, (1, 64, 3)).astype(np.float32))

    def loss(a, b):
        d, _ = emd_auction(a, b, 0.002, 500, 3, 0.1)
        return d.mean()

    g1, g2 = jax.grad(loss, argnums=(0, 1))(x1, x2)
    assert float(jnp.abs(g1).sum()) > 0
    assert float(jnp.abs(g2).sum()) == 0


def test_pallas_compact_tail_matches_dense(rng):
    """compact_tail rounds preserve the auction contract: assignment is a
    bijection, per-pair distances exact, and total cost within the dense
    fixed-eps run's quality (both are eps-CS certificates at the same
    eps — Bertsekas' asynchronous auction admits any fair bidder
    schedule, which the rebuild loop provides)."""
    from houv_tpu.ops.emd_kernel import emd_auction_pallas

    x1 = rng.uniform(0, 1, (2, 128, 3)).astype(np.float32)
    x2 = rng.uniform(0, 1, (2, 128, 3)).astype(np.float32)
    j1, j2 = jnp.asarray(x1), jnp.asarray(x2)
    d_c, a_c = emd_auction_pallas(j1, j2, 0.002, 4000, interpret=True,
                                  compact_tail=32, tail_rounds=16)
    d_d, a_d = emd_auction_pallas(j1, j2, 0.002, 4000, interpret=True)
    exact = _hungarian_emd(x1, x2)
    approx = np.asarray(d_c).mean(axis=1)
    # eps-CS bound: mean cost within n*eps of optimal (loose: 0.01)
    assert (approx <= exact + 0.01).all()
    assert (approx >= exact - 1e-6).all()
    # same certificate class as the dense run
    assert (approx <= np.asarray(d_d).mean(axis=1) + 0.005).all()
    for b in range(2):
        assert len(np.unique(np.asarray(a_c[b]))) == 128
    diff = j1 - jnp.take_along_axis(j2, a_c[..., None], axis=1)
    np.testing.assert_allclose(
        np.asarray((diff ** 2).sum(-1)), np.asarray(d_c), rtol=1e-5,
        atol=1e-6,
    )


def test_pallas_compact_tail_identity(rng):
    """Identity matching survives the compacted tail (every bidder's best
    item is distinct — the tail only sees stragglers)."""
    from houv_tpu.ops.emd_kernel import emd_auction_pallas

    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 3)).astype(np.float32))
    perm = rng.permutation(128)
    d, a = emd_auction_pallas(x, x[:, perm], 0.002, 2000, interpret=True,
                              compact_tail=32)
    assert float(d.mean()) < 1e-4


def test_emd_eval_auto_compact_gate(rng, monkeypatch):
    """_emd_fwd_impl routes eval-grade iters to the compacted kernel on
    TPU only; the CPU/XLA fallback stays on the dense auction (checked
    indirectly: CPU result is permutation-valid at eval settings)."""
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 96, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(0, 1, (1, 96, 3)).astype(np.float32))
    d, a = emd_auction(x1, x2, 0.002, 3000)
    assert len(np.unique(np.asarray(a[0]))) == 96
