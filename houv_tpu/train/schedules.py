"""Epoch-level schedules (reference completion/train.py:106-147).

Pure functions of (config, epoch) so the jitted step takes plain scalars.
"""

from __future__ import annotations

from houv_tpu.train.config import Config


def alpha_schedule(cfg: Config, epoch: int) -> float | None:
    """Loss-weight alpha ramp (varying_constant: 0.01 -> 0.1 -> 0.5 -> 1 at
    epochs 5/15/30 by default)."""
    if not cfg.varying_constant:
        return None
    epochs = cfg.varying_constant_epochs or ()
    consts = cfg.varying_constant
    for ind, ep in enumerate(epochs):
        if epoch < ep:
            return consts[ind]
    return consts[len(epochs)]


def lr_schedule(cfg: Config, epoch: int) -> float:
    """Multiplicative interval decay or step decay, clipped at lr_clip."""
    lr = cfg.lr
    if cfg.lr_decay:
        if cfg.lr_decay_interval:
            n = epoch // cfg.lr_decay_interval
            lr = cfg.lr * (cfg.lr_decay_rate**n)
        elif cfg.lr_step_decay_epochs:
            for ep, rate in zip(cfg.lr_step_decay_epochs,
                                cfg.lr_step_decay_rates):
                if epoch >= ep:
                    lr *= rate
        if cfg.lr_clip:
            lr = max(lr, cfg.lr_clip)
    return lr
