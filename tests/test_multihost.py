"""Two-process jax.distributed smoke: the SLURM-style multi-host init path
(jepa_tpu.parallel.dist) plus a cross-host psum, on CPU.

This exercises the coordinator rendezvous the reference does with NCCL
(reference: src/utils/distributed.py:18-47) in the jax.distributed form.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path = [p for p in sys.path if ".axon_site" not in p]
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from jepa_tpu.parallel.dist import initialize

world, rank = initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["RANK"]),
)
assert world == 2, world
assert jax.device_count() == 4  # 2 hosts x 2 virtual devices

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
# global array sharded across both processes; sum must see all shards
local = jnp.full((2, 4), float(rank + 1))  # one row per local device
garr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), local)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
# global (4,4): rank0 rows of 1s (sum 8) + rank1 rows of 2s (sum 16) = 24
print(f"RANK{rank} OK world={world} sum={float(total)}", flush=True)
assert float(total) == 24.0, float(total)
"""


@pytest.mark.timeout(180)
def test_two_process_distributed_init(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    port_num = port.getsockname()[1]
    port.close()

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env_base = {
        k: v for k, v in os.environ.items() if ".axon_site" not in v
    }
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env.update(
            COORD=f"localhost:{port_num}",
            RANK=str(rank),
            REPO=os.getcwd(),
            PYTHONPATH="",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-2000:]}"
        assert f"RANK{rank} OK world=2 sum=24.0" in out
