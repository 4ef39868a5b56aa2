import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU hardware.  Must be set before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
# the axon site hook overrides JAX_PLATFORMS; JAX_PLATFORM_NAME wins
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# persistent compile cache: CPU scan pipelines take ~1 min each to compile
import jax  # noqa: E402

# a site hook may have force-registered a TPU backend before this conftest
# ran (env JAX_PLATFORMS is consumed at interpreter start); the config knob
# still wins because backend *initialization* is lazy
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
