"""Test configuration: force an 8-virtual-device CPU platform.

Must run before any jax import — pytest imports conftest first. Multi-chip
sharding tests use the 8 virtual CPU devices; kernels run in XLA:CPU /
Pallas interpret mode. Real-TPU execution is covered by bench.py and the
driver's __graft_entry__ checks.
"""

import os

# HARD set (not setdefault): the image exports JAX_PLATFORMS=axon, and CLI
# entry modules (train.py etc.) call setup_runtime() at import, which reads
# the env var — a setdefault would flip a fresh test process onto the TPU
# tunnel the moment a test imports train.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
# forcing through jax.config is authoritative.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Tests assert CORRECTNESS, not speed: drop the XLA optimization level so
# the fast gate fits its 10-minute budget on a 1-core host (measured: 36%
# less wall time on the heaviest compile-bound tests; the optimized path
# is exercised on real hardware by bench.py and the driver entry checks).
# GFLA_TEST_FULL_OPT=1 restores full optimization.
if os.environ.get("GFLA_TEST_FULL_OPT", "0") != "1":
    jax.config.update("jax_disable_most_optimizations", True)
