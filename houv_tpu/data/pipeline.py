"""Batching / sharding utilities.

Replaces torch DataLoader usage (reference registration/test_mult.py:39,
completion/train.py:137) with a simple numpy batch iterator; device
placement happens once per batch via jax.device_put inside the jitted step.
``shard_ranges`` reproduces the reference's 4-way [l, r) dataset sharding
(registration/run_test.sh:6) as a pure function of world size.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def shard_ranges(total: int, n_shards: int) -> list[tuple[int, int]]:
    """Split [0, total) into n_shards near-equal contiguous ranges."""
    base = total // n_shards
    rem = total % n_shards
    out = []
    start = 0
    for i in range(n_shards):
        size = base + (1 if i < rem else 0)
        out.append((start, start + size))
        start += size
    return out


def batch_iterator(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    drop_last: bool = False,
    pad_last: bool = False,
    seed: int | None = None,
    rng: np.random.Generator | None = None,
) -> Iterator[dict]:
    """Yield batch dicts from a dataset exposing __len__ and get_batch.

    pad_last repeats the final indices up to batch_size (keeps jit shapes
    static); the returned dict gains 'valid' with the real count.
    """
    n = len(dataset)
    order = np.arange(n)
    rng = rng or np.random.default_rng(seed)
    if shuffle:
        rng.shuffle(order)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size:
            if drop_last:
                return
            if pad_last:
                pad = np.resize(idx, batch_size)
                batch = dataset.get_batch(pad, rng=rng)
                batch["valid"] = np.asarray(len(idx), np.int32)
                yield batch
                return
        batch = dataset.get_batch(idx, rng=rng)
        batch["valid"] = np.asarray(len(idx), np.int32)
        yield batch
