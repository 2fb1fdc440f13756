"""Metric-semantics tests vs a torch golden reimplementation of the reference
(model_utils_completion.py:69-166): calc_cd, calc_cd_percent, loss_view, fscore."""

import jax.numpy as jnp
import numpy as np
import torch

from houv_tpu.metrics import calc_cd, calc_cd_percent, fscore, loss_view


def _torch_cd(a, b):
    d = torch.cdist(a, b) ** 2
    d1, _ = d.min(dim=2)
    d2, _ = d.min(dim=1)
    return d1, d2


def _torch_calc_cd(output, gt):
    d1, d2 = _torch_cd(gt, output)
    cd_p = (d1.sqrt().mean(1) + d2.sqrt().mean(1)) / 2
    cd_t = d1.mean(1) + d2.mean(1)
    return cd_p, cd_t


def _torch_calc_cd_percent(output, gt, percent):
    k = int(output.shape[1] * percent)
    d1, d2 = _torch_cd(gt, output)
    d1, _ = d1.topk(k, dim=1, largest=False)
    d2, _ = d2.topk(k, dim=1, largest=False)
    return d1.sqrt().mean(1), d2.sqrt().mean(1)


def test_calc_cd_matches_reference_semantics(rng):
    out = rng.standard_normal((3, 128, 3)).astype(np.float32)
    gt = rng.standard_normal((3, 160, 3)).astype(np.float32)
    cd_p, cd_t = calc_cd(jnp.asarray(out), jnp.asarray(gt))
    tp, tt = _torch_calc_cd(torch.from_numpy(out), torch.from_numpy(gt))
    np.testing.assert_allclose(np.asarray(cd_p), tp.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cd_t), tt.numpy(), rtol=1e-4, atol=1e-5)


def test_calc_cd_percent_matches(rng):
    out = rng.standard_normal((2, 128, 3)).astype(np.float32)
    gt = rng.standard_normal((2, 128, 3)).astype(np.float32)
    for percent in (0.5, 0.25, 1.0):
        cd_p, cd_t = calc_cd_percent(jnp.asarray(out), jnp.asarray(gt), percent)
        tp, tt = _torch_calc_cd_percent(
            torch.from_numpy(out), torch.from_numpy(gt), percent
        )
        np.testing.assert_allclose(np.asarray(cd_p), tp.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cd_t), tt.numpy(), rtol=1e-4, atol=1e-5)


def test_percent_truncation_robust_to_outliers(rng):
    """The HOUV rationale: truncated CD must ignore non-overlapping points."""
    base = rng.uniform(-1, 1, (1, 100, 3)).astype(np.float32)
    noisy = base.copy()
    noisy[0, :40] += 50.0  # 40% outliers
    # cd_t (second return) is the output-side distance: outliers live there.
    _, full_t = calc_cd_percent(jnp.asarray(noisy), jnp.asarray(base), 1.0)
    _, half_t = calc_cd_percent(jnp.asarray(noisy), jnp.asarray(base), 0.5)
    assert float(half_t[0]) < 1e-3
    assert float(full_t[0]) > 1.0


def test_loss_view_projects_axis(rng):
    src = rng.standard_normal((2, 64, 3)).astype(np.float32)
    tgt = rng.standard_normal((2, 64, 3)).astype(np.float32)
    for dim in range(3):
        a, b = loss_view(jnp.asarray(src), jnp.asarray(tgt), dim=dim)
        mask = np.ones(3, np.float32)
        mask[dim] = 0
        tp, tt = _torch_calc_cd_percent(
            torch.from_numpy(src * mask), torch.from_numpy(tgt * mask), 1.0
        )
        np.testing.assert_allclose(np.asarray(a), tp.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b), tt.numpy(), rtol=1e-4, atol=1e-5)


def test_fscore_reference_semantics(rng):
    d1 = rng.uniform(0, 2e-4, (3, 50)).astype(np.float32)
    d2 = rng.uniform(0, 2e-4, (3, 50)).astype(np.float32)
    f1, p1, p2 = fscore(jnp.asarray(d1), jnp.asarray(d2))
    tp1 = (torch.from_numpy(d1) < 1e-4).float().mean(1)
    tp2 = (torch.from_numpy(d2) < 1e-4).float().mean(1)
    tf = 2 * tp1 * tp2 / (tp1 + tp2)
    tf[torch.isnan(tf)] = 0
    np.testing.assert_allclose(np.asarray(f1), tf.numpy(), rtol=1e-5)
    # all-far case -> f1 = 0, not NaN
    far = np.full((1, 10), 1.0, np.float32)
    f1, _, _ = fscore(jnp.asarray(far), jnp.asarray(far))
    np.testing.assert_array_equal(np.asarray(f1), [0.0])
