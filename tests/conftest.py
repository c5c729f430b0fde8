"""Test configuration: run on a virtual 8-device CPU mesh.

Sharding paths (pjit/shard_map over a ('data','particle') mesh) are
exercised on fake CPU devices, per SURVEY.md S4 ("Multi-node testing").

Note: this environment pre-registers a tunneled single-TPU 'axon' backend
via sitecustomize (JAX_PLATFORMS=axon in the ambient env), so the platform
must be forced back to CPU through jax.config, not env vars. XLA_FLAGS is
still honored because the CPU client initializes lazily.
"""

import os
import pathlib

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: OPT-IN via AESMC_CACHE=1. Disabled by
# default since round 3: on this box's rotating VM hosts the XLA:CPU
# AOT serialize/deserialize path segfaulted the full suite four times -
# at cache READ (stale entries from a different-featured host; the
# cpu_aot_loader SIGILL warning), at compile+load, and at cache WRITE
# (serializing a freshly built executable) even with a fresh cache.
# The cache saves ~half the suite wall-clock when it works; a segfault
# costs the whole run.
if os.environ.get("AESMC_CACHE"):
    _cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    _cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.device_count() >= 8, (
    "tests expect 8 virtual CPU devices; got "
    f"{jax.devices()}")
