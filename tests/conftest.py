"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

The reference has zero automated tests (SURVEY.md §4); this suite is built
from scratch. Multi-chip sharding is tested on emulated CPU devices so it
runs anywhere (the driver separately dry-runs the multi-chip path).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment profile pins JAX_PLATFORMS=axon (TPU tunnel) and the
# plugin wins over the env var — force CPU via config for the test suite.
# Also DROP the axon backend factory: when the tunnel is down its init
# blocks forever at first device access even on CPU-only runs
# (BENCH_NOTES round 3), and this suite never touches the TPU.
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def jpegref(tmp_path_factory):
    """The libjpeg interop harness (tools/jpegref.c), compiled once per
    session; JPEG entropy-layer tests skip when it can't be built."""
    from jpeg_util import build_jpegref

    exe = build_jpegref(tmp_path_factory.mktemp("jpegref"))
    if exe is None:
        pytest.skip("libjpeg harness unavailable (no toolchain/libjpeg)")
    return exe
