import os

# Tests run on a virtual 8-device CPU mesh (sharding validated without real
# chips); TPU benchmarking lives in bench.py, not the test suite.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # physics parity tests compare in f64

# persistent compilation cache: recompiles across test runs are the dominant
# cost for the bigger models
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
