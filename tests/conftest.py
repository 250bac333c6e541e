"""Test config: force CPU with 8 virtual devices (multi-chip sharding tests).

This is the JAX idiom replacing the reference's local multi-process debug
mode (reference: app/main.py --devices, README.md:331-339): an 8-device host
mesh emulates a pod slice without hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
