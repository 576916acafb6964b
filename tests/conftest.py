"""Test configuration: force CPU with 8 virtual devices.

Tests must be deterministic and runnable anywhere; multi-chip sharding tests
use the 8 virtual CPU devices (the TPU answer to testing distributed code
without a cluster). Real-TPU execution is exercised by bench.py and the
driver's compile checks, not by the unit suite.
"""

import os

# The environment exports JAX_PLATFORMS=axon (the tunneled TPU), and the
# plugin re-registers itself even when overridden — force CPU both in the
# env (for subprocesses) and via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

# Full-fp32 contractions for parity tests (JAX's default matmul/conv
# precision is allowed to be much looser than torch fp32), and a persistent
# compilation cache — XLA:CPU compiles of the conv graphs take tens of
# seconds the first time.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
