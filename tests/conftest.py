"""Test configuration: run on a virtual 8-device CPU mesh.

Sharding paths (pjit/shard_map over a ('data','particle') mesh) are
exercised on fake CPU devices, per SURVEY.md S4 ("Multi-node testing").
Must set flags before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: XLA compiles are seconds-slow on this CPU;
# cache them across pytest runs.
_cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_cache_dir.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
