"""Cascade-GAN training harness (LSGAN) for completion models.

Reference: completion/train_utils.py:47-65 ``generator_step`` /
``discriminator_step`` and the cascade branches of completion/train.py:
63-170 (the 'cascade' model file itself is absent from the reference
checkout; the adversarial harness is what this reproduces):

- generator loss  = mean((D(fake) - 1)²) + 200 · completion loss
- discriminator   = 0.5 · (mean(D(fake)²) + mean((D(real) - 1)²))

Any completion model from the registry can be trained adversarially; the
critic is a PointNet over the first 2048 predicted/GT points.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from houv_tpu.models.common import PointMLP, max_pool_points

Array = jax.Array


class PointDiscriminator(nn.Module):
    """PointNet critic: (B, N, 3) -> (B,) real-valued score."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = PointMLP((64, 128, 256), relu_last=True)(x)
        g = max_pool_points(h)
        g = nn.relu(nn.Dense(128)(g))
        return nn.Dense(1)(g)[..., 0]


def lsgan_losses(d_fake: Array, d_real: Array):
    """(generator adversarial loss, discriminator loss), LSGAN form."""
    g_loss = jnp.mean((d_fake - 1.0) ** 2)
    d_loss = 0.5 * (jnp.mean(d_fake**2) + jnp.mean((d_real - 1.0) ** 2))
    return g_loss, d_loss


def make_gan_step(model, disc, g_opt, d_opt, gen_weight: float = 200.0,
                  crop: int = 2048):
    """jitted (params, d_params, g_state, d_state, batch, alpha, rngs) ->
    (new states, metrics). Generator sees a frozen critic and vice versa
    (the reference's set_requires_grad dance becomes two stop-gradient
    closures)."""

    def g_loss_fn(params, d_params, batch, alpha, rngs):
        out = model.apply({"params": params}, batch["partial"], batch["gt"],
                          "train", alpha, rngs=rngs or None)
        fake = out["out2"][:, :crop]
        d_fake = disc.apply({"params": jax.lax.stop_gradient(d_params)}, fake)
        adv, _ = lsgan_losses(d_fake, jnp.zeros_like(d_fake))
        return adv + out["total_loss"] * gen_weight, (out, fake)

    def d_loss_fn(d_params, fake, gt):
        d_fake = disc.apply({"params": d_params},
                            jax.lax.stop_gradient(fake))
        d_real = disc.apply({"params": d_params}, gt[:, :crop])
        _, d_loss = lsgan_losses(d_fake, d_real)
        return d_loss

    def step(params, d_params, g_state, d_state, batch, alpha, rngs):
        (g_total, (out, fake)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(params, d_params, batch, alpha, rngs)
        upd, g_state = g_opt.update(g_grads, g_state, params)
        params = optax.apply_updates(params, upd)

        gt = batch["gt"]
        if gt.shape[0] != fake.shape[0]:  # dual-path models double the batch
            reps = fake.shape[0] // gt.shape[0]
            gt = jnp.concatenate([gt] * reps, axis=0)
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params, fake, gt)
        upd_d, d_state = d_opt.update(d_grads, d_state, d_params)
        d_params = optax.apply_updates(d_params, upd_d)
        return params, d_params, g_state, d_state, {
            "g_loss": g_total,
            "d_loss": d_loss,
            "recon_loss": out["total_loss"],
        }

    return jax.jit(step)
