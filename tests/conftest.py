"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 CPU devices (SURVEY.md section 4). The environment
presets JAX_PLATFORMS=axon (TPU) and the jaxtyping pytest plugin imports
jax before this file runs, so the platform override must go through
jax.config (still effective until the first backend is created), and
XLA_FLAGS must be set before the CPU client initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The forced-device-count CPU client lowers matmuls to bf16-like precision
# (mirroring TPU's default). Tests verify numerics, so pin full precision;
# the framework pins HIGHEST explicitly on its accuracy-critical einsums.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite's wall-clock on the 1-core host
# is dominated by XLA compiles (~180 tests x ~1-20 s each); caching them
# across pytest sessions cuts repeat runs severalfold. Compiled artifacts
# key on the HLO + flags — but NOT on the host's CPU feature set, and a
# serialized CPU executable AOT-compiled on a machine with more SIMD
# features hard-aborts (SIGILL-class) when loaded on a lesser one (the
# cpu_aot_loader "machine type doesn't match" warning is the precursor;
# observed as a Fatal Python error in test_sharding after a host
# migration). Key the cache dir by a fingerprint of the CPU flags so a
# host change starts a fresh cache instead of loading a fatal one.
def _host_fingerprint() -> str:
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as fh:
            src = next(line for line in fh if line.startswith("flags"))
    except (OSError, StopIteration):
        src = platform.machine() + platform.processor()
    return hashlib.sha1(src.encode()).hexdigest()[:10]


_cache_dir = os.path.join(
    os.path.dirname(__file__), f".jax_cache-{_host_fingerprint()}"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh; a backend was initialized "
    f"before conftest could override the platform: {jax.devices()}"
)


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
