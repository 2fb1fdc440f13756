"""Multi-host (DCN) tests, run for real: two local processes form a JAX
distributed job over TCP, build the global mesh, and run collective +
solver code across it (VERDICT r1 §2.8; extended per VERDICT r2 #9 to a
2-process × 4-device ``sharded_houv_solve`` with result checks)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

from houv_tpu.parallel.distributed import initialize_multihost, global_mesh

pid = int(sys.argv[1])
initialize_multihost(
    coordinator_address="127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

mesh = global_mesh()
assert mesh.devices.size == {n_global}

# global value assembled across hosts, reduced with a jitted global sum
local = jnp.full(({n_local}, 4), float(pid + 1))
arr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
total = jax.jit(
    lambda x: jnp.sum(x), in_shardings=NamedSharding(mesh, P("data")),
    out_shardings=NamedSharding(mesh, P()),
)(arr)
assert float(total) == {n_local} * 4 * 3.0, float(total)
print("MULTIHOST_OK", pid)

# --- the actual sweep: sharded_houv_solve over the 2-host mesh ---------
import numpy as np

from houv_tpu.data import synthesize_registration_pairs
from houv_tpu.parallel import sharded_houv_solve
from houv_tpu.solvers import HOUVConfig

n_global_pairs = {n_global}
data = synthesize_registration_pairs(
    n_global_pairs, n_points=48, max_angle_deg=30.0, seed=31
)
# every host holds the full (small) input; host_local->global keeps the
# per-host slice — the standard multihost data-feeding recipe
lo = pid * {n_local}
src_l = jnp.asarray(data["rotated_src"][lo:lo + {n_local}])
tgt_l = jnp.asarray(data["rotated_tgt"][lo:lo + {n_local}])
src = multihost_utils.host_local_array_to_global_array(src_l, mesh, P("data"))
tgt = multihost_utils.host_local_array_to_global_array(tgt_l, mesh, P("data"))

cfg = HOUVConfig(kernel=4, steps=40, angle_passes=1, use_pallas=False)
out = sharded_houv_solve(src, tgt, jax.random.PRNGKey(0), mesh, cfg)

# result concatenation: gather the global transform on every host and
# check shape + rigid-transform structure
tf = multihost_utils.process_allgather(out["transform"], tiled=True)
assert tf.shape == (n_global_pairs, 4, 4), tf.shape
r = np.asarray(tf[:, :3, :3])
err = np.abs(r @ np.swapaxes(r, 1, 2) - np.eye(3, dtype=np.float32)).max()
assert err < 1e-4, err
rmse = multihost_utils.process_allgather(out["rmse"], tiled=True)
assert rmse.shape == (n_global_pairs,) and np.isfinite(np.asarray(rmse)).all()
print("MULTIHOST_SWEEP_OK", pid)
"""


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_two_process_job(tmp_path, n_local_devices: int, timeout: int = 300):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    port = free_port()
    n_global = 2 * n_local_devices
    script = tmp_path / "worker.py"
    script.write_text(
        _WORKER.replace("{repo!r}", repr(repo))
        .replace("{port}", str(port))
        .replace("{n_global}", str(n_global))
        .replace("{n_local}", str(n_local_devices))
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    return procs, outs


@pytest.mark.slow
def test_two_process_dcn_solve(tmp_path):
    """2 processes × 4 virtual devices: DCN init, cross-host psum, and the
    full sharded HOUV sweep with allgathered results."""
    procs, outs = run_two_process_job(tmp_path, n_local_devices=4)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out
        assert f"MULTIHOST_SWEEP_OK {pid}" in out
