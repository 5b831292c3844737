"""Test harness config: run everything on a virtual 8-device CPU mesh.

Mirrors the strategy in SURVEY.md §4: deterministic CPU simulation for unit
and sharding tests; the real TPU chip is only used by bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
