"""Test configuration: force a CPU backend with 8 virtual devices.

Real-TPU execution is exercised by bench.py and __graft_entry__.py; unit
and parity tests run on the CPU backend so they are hermetic and can
exercise multi-device sharding on an 8-device virtual mesh (the standard
JAX fake-backend trick, cf. SURVEY.md §4d).

The container injects a TPU PJRT plugin via PYTHONPATH sitecustomize
(/root/.axon_site) that overrides the JAX_PLATFORMS env var, so we set
the config directly — backend init is lazy, so doing it here (before
any test touches a device) wins over the plugin's env default.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
