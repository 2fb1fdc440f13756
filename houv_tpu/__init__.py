"""houv_tpu — TPU-native framework for the MVP point-cloud benchmark.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
Dizzy-cell/HOUV reference stack (partial-to-partial registration and
point-cloud completion on 2048-point clouds), designed TPU-first:

- ``houv_tpu.ops``       fused distance / sampling / grouping kernels
  (Pallas on TPU, pure-jnp golden path everywhere) replacing the
  reference's CUDA extensions (chamfer3D, EMD auction, mm3d_pn2 ops).
- ``houv_tpu.geometry``  rigid-transform math (Rodrigues, quaternions,
  rotation/translation errors, Kabsch/SVD alignment).
- ``houv_tpu.metrics``   CD/EMD/F-score losses with the exact truncation
  ("percent") and axis-projection ("view") semantics of the reference.
- ``houv_tpu.solvers``   HOUV unconstrained-variable hybrid optimizer,
  batched ICP, all jit/vmap-batched over (pair, restart).
- ``houv_tpu.models``    flax implementations of DCP / DeepGMR / IDAM /
  PCN / ECG / VRCNet / vrcnet_knn.
- ``houv_tpu.parallel``  a single Mesh + shard_map layer replacing
  DataParallel and the shell-level 4-process sweep.
- ``houv_tpu.data``      MVP .h5 loading, on-the-fly pose synthesis,
  synthetic fixtures.
- ``houv_tpu.train``     train/eval harness, meters, checkpointing,
  results.h5 submission writer.
"""

__version__ = "0.1.0"
