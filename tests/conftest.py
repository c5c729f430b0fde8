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

# Persistent compilation cache, HOST-KEYED and PER-WORKER (opt out
# with AESMC_NO_CACHE=1). Two crash modes shaped this (round 3):
# 1. Entries are XLA:CPU AOT artifacts tied to the writing host's CPU
#    features; this box's VM host rotates between sittings and loading
#    a stale-host entry can SIGILL/SEGV (the cpu_aot_loader warning) -
#    so the directory is keyed by a hash of /proc/cpuinfo flags +
#    jaxlib version and stale caches are simply never touched.
# 2. jax's cache write is a bare write_bytes (no temp+rename), so
#    CONCURRENT processes sharing a dir can read torn entries - each
#    xdist worker gets its own subdirectory.
# (The compiler-threshold segfault is separate and handled by the
# xdist addopts in pyproject.toml.)
if not os.environ.get("AESMC_NO_CACHE"):
    import hashlib

    try:
        _flags = [line for line in open("/proc/cpuinfo")
                  if line.startswith("flags")][0]
    except (OSError, IndexError):
        _flags = "unknown"
    import jaxlib
    _host = hashlib.sha1(
        (_flags + jaxlib.__version__).encode()).hexdigest()[:12]
    _worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
    _cache_dir = (pathlib.Path(__file__).resolve().parent.parent /
                  ".jax_cache" / f"cpu-{_host}" / _worker)
    _cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.device_count() >= 8, (
    "tests expect 8 virtual CPU devices; got "
    f"{jax.devices()}")
