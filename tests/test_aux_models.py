"""Tests for the experimental/preprocessing models and ModelNet dataset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from houv_tpu.data import ModelNetDataset
from houv_tpu.models import (
    AlignmentClassifier,
    InstanceEmbedding,
    PCNTransformer,
    TransformerRegressor,
    VoxAsym,
    alignment_bce_loss,
    make_aligned_pairs,
    triplet_loss,
)
from houv_tpu.ops.voxel import voxel_grid_indices


def test_make_aligned_pairs_semantics(rng):
    from houv_tpu.geometry import rotation_error

    gt = np.eye(4, dtype=np.float32)
    t_true, t_false = make_aligned_pairs(rng, gt)
    eye = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    r_err_t = float(
        rotation_error(jnp.asarray(t_true[None, :3, :3].astype(np.float32)),
                       eye)[0]
    )
    r_err_f = float(
        rotation_error(jnp.asarray(t_false[None, :3, :3].astype(np.float32)),
                       eye)[0]
    )
    assert r_err_t <= 5.0 + 1e-3
    assert r_err_f >= 5.0 - 1e-3


@pytest.mark.slow
def test_alignment_classifier_separates(rng):
    """After a few steps the classifier must score aligned pairs above
    misaligned ones."""
    import optax

    src = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 128, 3)).astype(np.float32))
    tgt = src + 0.01  # aligned
    bad = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 128, 3)).astype(np.float32))

    model = AlignmentClassifier(grid_size=16, init_size=8)
    params = model.init(jax.random.PRNGKey(0), src, tgt)

    x_pos, x_neg = tgt, bad
    def loss_fn(p):
        lp = model.apply(p, src, x_pos)
        ln = model.apply(p, src, x_neg)
        logits = jnp.concatenate([lp, ln])
        labels = jnp.concatenate([jnp.ones(4), jnp.zeros(4)])
        return alignment_bce_loss(logits, labels)

    opt = optax.adam(1e-3)
    state = opt.init(params)
    loss0 = float(loss_fn(params))
    for _ in range(10):
        g = jax.grad(loss_fn)(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < loss0
    lp = model.apply(params, src, x_pos)
    ln = model.apply(params, src, x_neg)
    assert float(lp.mean()) > float(ln.mean())


def test_vox_asym_shapes(rng):
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 128, 3)).astype(np.float32))
    coords = voxel_grid_indices(pts, grid_size=16)
    model = VoxAsym(grid_size=16, embedding_dim=16, init_size=8)
    params = model.init(jax.random.PRNGKey(0), pts, coords)
    probs, pos, vox_coords, mask = model.apply(params, pts, coords)
    assert probs.shape == (2, 128, 2)
    assert vox_coords.shape == (2, 128, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1))[np.asarray(mask)],
                               1.0, rtol=1e-5)
    assert pos.shape == (2, 128, 3)


def test_instance_embedding_and_triplet(rng):
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (6, 64, 3)).astype(np.float32))
    model = InstanceEmbedding(embedding_size=16)
    params = model.init(jax.random.PRNGKey(0), x)
    emb, logits = model.apply(params, x)
    assert emb.shape == (6, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1),
                               1.0, rtol=1e-5)
    assert logits.shape == (6, 16)
    loss = triplet_loss(emb[:2], emb[2:4], emb[4:6])
    assert np.isfinite(float(loss))
    # identical anchor/positive, distant negative -> zero loss at margin 0
    z = triplet_loss(emb[:2], emb[:2], -emb[:2], margin=0.0)
    assert float(z) == 0.0


def test_transformer_regressor(rng):
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 128, 3)).astype(np.float32))
    model = TransformerRegressor(num_latent=32, num_out=128, d_model=64,
                                 n_layers=1)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 128, 3)

    pcn_t = PCNTransformer(output_size=128)
    p2 = pcn_t.init(jax.random.PRNGKey(1), x)
    g = pcn_t.apply(p2, x)
    assert g.shape == (2, 128)


def test_modelnet_dataset(rng):
    pts = rng.uniform(-1, 1, (10, 64, 3)).astype(np.float32)
    ds = ModelNetDataset("train", variant="noisy", data={"points": pts},
                         max_angle_deg=30.0)
    batch = ds.get_batch(np.arange(4), rng=rng)
    assert batch["src"].shape == (4, 64, 3)
    r = batch["transform"][:, :3, :3]
    np.testing.assert_allclose(
        r @ np.swapaxes(r, 1, 2),
        np.broadcast_to(np.eye(3, dtype=np.float32), (4, 3, 3)), atol=1e-5
    )
    # noisy variant jitters: tgt != exact transform of src
    moved = np.einsum("bij,bnj->bni", r, batch["src"]) \
        + batch["transform"][:, None, :3, 3]
    assert np.abs(moved - batch["tgt"]).max() > 1e-4