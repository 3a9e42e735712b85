"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; benchmarks run on the real chip via bench.py).
The env vars must be set before jax is first imported.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# host paths in the suite: device programs recompile per geometry on the
# CPU backend and would dominate runtime; device/host equivalence is
# asserted by dedicated tests (test_cdef_full, test_omd)
os.environ.setdefault("SVT_TPU_DEVICE", "0")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the axon sitecustomize pins jax_platforms to the TPU backend; tests
# always run on the virtual CPU mesh
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
