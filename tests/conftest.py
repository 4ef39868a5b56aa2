import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU hardware.  Must be set before jax import.
# AC3TPU_TEST_TPU=1 keeps the real TPU backend instead (runs the
# hardware-gated tests, e.g. the Mosaic equivalence gate in
# test_pallas_steady.py, on TPU CI).
_USE_TPU = os.environ.get("AC3TPU_TEST_TPU") == "1"
if not _USE_TPU:
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
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# per-machine cache subdir: XLA:CPU AOT artifacts are not portable across
# CPU feature sets (foreign entries warn about SIGILL in cpu_aot_loader)
from ac3acm_tpu.utils.cache import (ensure_map_headroom,  # noqa: E402
                                    machine_cache_dir, map_count,
                                    raise_stack_limit)

raise_stack_limit()
# XLA:CPU leaks ~3 mmaps per JIT'd fusion for as long as the executable
# lives; the full suite compiles enough to blow through the default
# vm.max_map_count=65530 and segfault mid-compile.  The ceiling is only
# raised when the runner opts in with AC3TPU_RAISE_MAP_COUNT=1 (a global
# kernel tunable should not change as a test side effect); otherwise the
# autouse fixture below sheds executables between modules when close.
ensure_map_headroom()

jax.config.update("jax_compilation_cache_dir",
                  machine_cache_dir(os.path.join(os.path.dirname(__file__),
                                                 "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs",
                  float(os.environ.get("AC3TPU_CACHE_MIN_COMPILE_S", "1.0")))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _shed_executables_when_maps_high():
    """Guard against vm.max_map_count exhaustion (SIGSEGV in XLA compile).

    When the ceiling could not be raised (non-root), drop live executables
    between test modules once the process nears it; recompiles mostly hit
    the persistent cache."""
    yield
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            limit = int(f.read())
    except OSError:
        limit = 65530
    if map_count() > limit - 25000:
        jax.clear_caches()
