"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4 rebuild plan (d))."""
import os

# Force CPU: the surrounding environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel with ~1s/dispatch latency) — tests must run on the local host.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env is set)

# sitecustomize already imported jax and registered the axon TPU plugin, so
# the env var alone is too late — override the resolved platform list too.
jax.config.update("jax_platforms", "cpu")
