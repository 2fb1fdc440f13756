"""Multi-host initialization (DCN).

The reference has no multi-host story (SLURM launches single tasks,
completion/run_train.sh:6-9; its only torch.distributed usage is the
dormant NaiveSyncBatchNorm). Here multi-host is the standard JAX recipe:
``jax.distributed.initialize`` over DCN, then the same Mesh/shard_map code
runs unchanged — collectives ride ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import jax


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Initialize JAX distributed for multi-host meshes. On single-host
    (the common case here) this is a no-op. Env-var driven when args are
    None (JAX_COORDINATOR_ADDRESS etc. / TPU pod auto-detection)."""
    if num_processes in (None, 1) and coordinator_address is None:
        try:
            import os

            if "COORDINATOR_ADDRESS" not in os.environ:
                return  # single host
        except Exception:
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "data"):
    """Mesh over every device in the (possibly multi-host) job."""
    from houv_tpu.parallel.mesh import make_mesh

    return make_mesh(devices=jax.devices(), axis=axis)
