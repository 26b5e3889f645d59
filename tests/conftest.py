import os

# Sharding/physics tests run on a virtual 8-device CPU mesh; TPU benchmarking
# happens in bench.py, not in the test suite.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
