"""Test env: force CPU with 8 virtual devices so numerics tests are
f32-exact and multi-chip sharding tests run anywhere (the standard
TPU-native answer to testing meshes without a pod).

Note: this machine's sitecustomize imports jax at interpreter start and pins
JAX_PLATFORMS to the TPU plugin, so env vars alone are too late here —
``jax.config.update`` is the reliable override. XLA_FLAGS still works
because CPU backend initialization is lazy. TPU execution itself is covered
by bench.py, not the unit suite.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
