"""Root pytest config: pin the JAX backend to CPU *before* any backend init.

jax gets imported at pytest startup by auto-loaded plugins — before any
conftest runs — so JAX_PLATFORMS set via os.environ is already baked.
Backends initialize lazily though, so jax.config.update still works here.
Pinning to CPU also prevents the axon TPU-tunnel plugin from initializing,
which otherwise stalls the first jax op for minutes whenever torch is
imported in the same process.

XLA_FLAGS must be set before backend init too: 8 virtual CPU devices give
the multi-chip sharding tests a mesh to run on (the JAX idiom replacing the
reference's multi-process local debug mode).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Strip the axon tunnel site dir so nothing else re-discovers it.
sys.path = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p
    for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p
)


def pytest_configure(config):
    # informational only — subprocess communicate() timeouts do the real work
    config.addinivalue_line("markers", "timeout(seconds): soft time budget")
