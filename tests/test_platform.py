"""utils/platform.py — the CPU-backend guard every tunnel-independent
subprocess relies on (bench sections, scaling bench, canary; conftest and
__graft_entry__ carry the same logic inline for import-order reasons).

The reference has no analog: it assumes one always-present CUDA device
(params_and_main.py:148-152). On this rig the TPU is reached through a
tunnel whose backend factory can block forever when down, so CPU-only
work must verifiably never touch it. These tests run the guard in fresh
subprocesses (the suite's own process already has a backend).
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(code: str, timeout: int = 180) -> subprocess.CompletedProcess:
    # scrub the suite's own device-count flag (conftest pins 8) so each
    # test controls the child's XLA_FLAGS from scratch
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=env)


def test_force_cpu_backend_pins_platform_and_device_count():
    r = _run(
        "import sys; sys.path.insert(0, '.')\n"
        "from unet_tpu.utils.platform import force_cpu_backend\n"
        "force_cpu_backend(device_count=4)\n"
        "import jax\n"
        "devs = jax.devices()\n"
        "assert len(devs) == 4, devs\n"
        "assert all(d.platform == 'cpu' for d in devs), devs\n"
        "print('OK')\n")
    assert r.returncode == 0, r.stderr[-800:]
    assert "OK" in r.stdout


def test_force_cpu_backend_idempotent_and_post_init_safe():
    # second call after JAX initialized must not raise or change devices
    r = _run(
        "import sys; sys.path.insert(0, '.')\n"
        "from unet_tpu.utils.platform import force_cpu_backend\n"
        "force_cpu_backend(device_count=2)\n"
        "import jax\n"
        "n1 = len(jax.devices())\n"
        "force_cpu_backend(device_count=8)  # too late for count: must not break\n"
        "assert len(jax.devices()) == n1 == 2\n"
        "print('OK')\n")
    assert r.returncode == 0, r.stderr[-800:]
    assert "OK" in r.stdout


def test_force_cpu_backend_replaces_existing_device_count_flag():
    # an inherited XLA_FLAGS pin (e.g. a CI ...=1) must not silently
    # override an explicit device_count request: the guard replaces the
    # flag in place — exactly one flag, with the requested value (the
    # scaling bench relies on this to actually get its 8-device mesh)
    r = _run(
        "import os, sys; sys.path.insert(0, '.')\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=3'\n"
        "from unet_tpu.utils.platform import force_cpu_backend\n"
        "force_cpu_backend(device_count=5)\n"
        "assert os.environ['XLA_FLAGS'].count('device_count') == 1, os.environ['XLA_FLAGS']\n"
        "import jax\n"
        "assert len(jax.devices()) == 5, jax.devices()\n"
        "print('OK')\n")
    assert r.returncode == 0, r.stderr[-800:]
    assert "OK" in r.stdout
