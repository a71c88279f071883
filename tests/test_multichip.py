"""Multi-chip sharding validation: runs the graft dryrun on a virtual
8-device CPU mesh in a subprocess (the axon TPU plugin registers at
interpreter start, so the CPU override must be in the child's env)."""

import os
import subprocess
import sys

import pytest


def _cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return env


def test_dryrun_multichip_8():
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=_cpu_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "DRYRUN_OK" in out.stdout, out.stderr[-2000:]


def test_entry_compiles():
    code = (
        "import __graft_entry__ as g; fn, args = g.entry(); out = fn(*args); "
        "assert out[0].shape == (16, 8); print('ENTRY_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=_cpu_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "ENTRY_OK" in out.stdout, out.stderr[-2000:]
