"""GAN losses (LSGAN + feature matching), reference
``third_party/BigVGAN/models.py:411-442``."""

from __future__ import annotations

import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g):
    """Sum of mean-|diff| over all feature maps, x2 (models.py:411-417)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    """LSGAN D loss: (1-D(y))^2 + D(y_hat)^2 (models.py:420-431)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1.0 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LSGAN G loss: (1-D(y_hat))^2 (models.py:434-442)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
