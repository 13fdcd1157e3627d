"""Test harness config: run JAX on CPU with 8 virtual devices.

Multi-chip logic is tested hardware-free via virtual CPU devices;
bench.py runs on the real chip.  Note: this container's sitecustomize
imports jax at interpreter start and points JAX_PLATFORMS at a TPU
tunnel ("axon"), so plain env vars are too late here — we must override
through jax.config before any backend is initialized.
"""

import os

# Belt: env vars (effective if jax is somehow not yet imported).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Suspenders: jax.config (effective when jax was already imported by
# sitecustomize, as long as no backend has been initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compile cache (round 5): the suite's dominant cost is
# XLA-CPU compilation of the jitted render programs, re-paid every run
# AND after every inter-module jax.clear_caches (the SIGSEGV mitigation
# below).  The same cache layer bench.py uses on the TPU tunnel turns
# those recompiles into disk hits; a separate default dir keeps CPU test
# programs apart from the chip cache (override: RAYTPU_COMPILE_CACHE).
from raytracer_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.environ.get("RAYTPU_COMPILE_CACHE",
                   os.path.expanduser("~/.cache/raytracer_tpu_jax_cpu"))
)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Bound accumulated XLA-CPU compile state.

    A single pytest process running the whole suite used to SIGSEGV inside
    XLA's backend_compile_and_load around the 70th test (always AFTER the
    8-virtual-device test_parallel programs) — every test passes when run
    in smaller batches, so the crash is an accumulation effect, not a test
    bug.  Two mitigations ship: jitted-program caches are dropped between
    test modules (this fixture), and the suite defaults to 4 xdist worker
    processes (pyproject.toml addopts)."""
    yield
    jax.clear_caches()
    import gc

    gc.collect()
