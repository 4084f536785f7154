"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

Mirrors the reference's lack of multi-host hardware (SURVEY.md §4): sharding
tests run against ``--xla_force_host_platform_device_count=8`` so mesh code
paths execute without TPU chips.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Some TPU sandbox bootstraps (sitecustomize) force jax_platforms to the TPU
# plugin with jax.config.update, which silently wins over the env var — and
# TPU default matmul precision would wreck fp32 parity tests. Override back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the parity suite compiles multi-minute CPU
# programs; cache them across runs.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/ttv_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
