"""Regression tests for the driver entry points (__graft_entry__.py).

The driver invokes ``dryrun_multichip`` in a FRESH process where the
environment pins ``JAX_PLATFORMS=axon`` (remote TPU tunnel) and the
conftest CPU override does not exist. Round 1 recorded a failure
(MULTICHIP_r01.json rc=1) because the entry point picked CPU *devices*
for the mesh but left array construction on the default axon backend.
These tests reproduce the driver environment in a subprocess.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driverEnv():
    """Environment as the driver provides it: no CPU pin, no XLA_FLAGS."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # conftest sets this in-process; driver doesn't
    env.pop("JAX_PLATFORMS", None)
    # The real driver has JAX_PLATFORMS=axon; keep that if the tunnel config
    # exists, otherwise leave unset (plain CPU default) — either way the
    # entry point must pin the platform itself.
    if os.path.exists("/root/.axon_site/sitecustomize.py"):
        env["JAX_PLATFORMS"] = "axon"
    return env


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    """dryrun_multichip must pass in a fresh process WITHOUT the conftest
    platform override (the graded driver artifact)."""
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(4); print('DRYRUN_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_driverEnv(),
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout


def test_dryrun_pins_cpu_before_array_ops():
    """Static guard: the CPU pin must be the first jax action inside
    dryrun_multichip, before any model/array import."""
    src = open(os.path.join(REPO, "__graft_entry__.py")).read()
    body = src.split("def dryrun_multichip", 1)[1]
    pin = body.index('jax.config.update("jax_platforms", "cpu")')
    firstArrayOp = min(i for i in (
        body.find("module.init"), body.find("jnp.zeros"),
        body.find("jax.devices()")) if i >= 0)
    assert pin < firstArrayOp
