"""Test harness config: run everything on a virtual 8-device CPU mesh.

Mirrors the strategy in SURVEY.md §4: deterministic CPU simulation for unit
and sharding tests; the real TPU chip is only used by bench.py.  The session
presets JAX_PLATFORMS=axon and the plugin wins over the env var, so the
platform is forced through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
