"""Checkpointing.

The reference saves only ``net.module.state_dict()`` and never the
optimizer (completion/train_utils.py:32-45; resume restarts optimizer
state). We save the full train state (params, batch_stats, optimizer,
epoch) as flax msgpack, and remain able to load params-only checkpoints.
"""

from __future__ import annotations

import os

import flax.serialization
import jax


def save_checkpoint(path: str, state: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = flax.serialization.to_state_dict(jax.device_get(state))
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(state))


def load_checkpoint(path: str, template: dict | None = None) -> dict:
    with open(path, "rb") as f:
        data = flax.serialization.msgpack_restore(f.read())
    if template is not None:
        data = flax.serialization.from_state_dict(template, data)
    return data
