"""Multi-host (DCN) initialization exercised for real (VERDICT r1 §2.8:
the wrapper was never run): two local processes form a 2-process JAX
distributed job over TCP, build the global mesh, and psum across hosts."""

import os
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
assert mesh.devices.size == 2

# global value assembled across hosts, reduced with a jitted global sum
local = jnp.full((1, 4), float(pid + 1))
arr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
total = jax.jit(
    lambda x: jnp.sum(x), in_shardings=NamedSharding(mesh, P("data")),
    out_shardings=NamedSharding(mesh, P()),
)(arr)
assert float(total) == 12.0, float(total)  # 4*1 + 4*2
print("MULTIHOST_OK", pid)
"""


@pytest.mark.slow
def test_two_process_dcn_init(tmp_path):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    port = 12377
    script = tmp_path / "worker.py"
    script.write_text(
        _WORKER.replace("{repo!r}", repr(repo)).replace("{port}", str(port))
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
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
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out
