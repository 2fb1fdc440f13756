"""Submission artifacts: results.h5 + zip.

Replaces the reference's shard/combine/zip choreography
(registration/test.py:27-77 solve -> results.h5 -> zip;
registration/test_mult.py:65-81 .npy shards -> combine; completion/
test.py:49-65). Sharding is handled upstream by the mesh, so this is a
single writer.
"""

from __future__ import annotations

import os
import zipfile

import h5py
import numpy as np


def write_results_h5(path: str, results: np.ndarray, key: str = "results") -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset(key, data=np.asarray(results))
    return path


def write_submission(zip_path: str, results_h5: str) -> str:
    """Zip the results file (reference run_test.sh:25-26)."""
    os.makedirs(os.path.dirname(zip_path) or ".", exist_ok=True)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.write(results_h5, arcname=os.path.basename(results_h5))
    return zip_path


def combine_shards(shard_paths: list[str], out_path: str,
                   key: str = "results") -> str:
    """Merge per-shard .npy results into one h5 (kept for compatibility with
    filesystem-sharded runs; the mesh path never needs it)."""
    arrays = [np.load(p) for p in shard_paths]
    return write_results_h5(out_path, np.concatenate(arrays, axis=0), key)
