"""Test harness config: force a virtual 8-device CPU mesh before jax import.

Per the build spec, multi-chip sharding is validated on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`); x64 is enabled so golden
float64 parity comparisons against the numpy reference solver are exact.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon TPU plugin's sitecustomize registers itself at interpreter start
# when PALLAS_AXON_POOL_IPS is set and then overrides JAX_PLATFORMS — tests
# must run on the virtual CPU mesh, so the config override below (which wins
# over both) is load-bearing. Clearing the env var also covers subprocesses.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import platform  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: repeat test runs skip XLA recompiles.
# Keyed by hostname — CPU AOT artifacts embed the build machine's ISA
# features, and reusing a cache written on a different host mixes
# incompatible codegen into the run (XLA warns of SIGILL risk and the
# gather/scatter strategy drift breaks bitwise-reproducibility tests).
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_test_cache_{platform.node()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
