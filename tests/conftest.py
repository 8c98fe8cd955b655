"""Test configuration: force CPU backend with 8 virtual devices.

Real-TPU execution is exercised by bench.py and __graft_entry__.py; unit
and parity tests run on the CPU backend so they are hermetic and can
exercise multi-device sharding on an 8-device virtual mesh (the standard
JAX fake-backend trick, cf. SURVEY.md §4d).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
