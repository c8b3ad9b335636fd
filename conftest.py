"""Repo-level pytest configuration.

Tests run on the CPU backend with a *virtual 8-device mesh*
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding paths
compile and execute without TPU hardware, and with x64 enabled so reference
(NumPy float64) parity tolerances of <=1e-9 are meaningful.

This must run before JAX initializes a backend, hence the module-level
side effects.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (if present) registers itself via sitecustomize and
# overrides JAX_PLATFORMS; force tests onto CPU regardless.  Set
# PSA_TEST_TPU=1 to run the suite on the attached TPU instead (enables the
# TPU-gated df32/pallas solver tests).
if os.environ.get("PSA_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA:CPU is pathologically slow compiling the
# df32 (two-float) programs (minutes); cache compiled executables across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/psa_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
