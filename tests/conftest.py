"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is tested on
host devices via --xla_force_host_platform_device_count (the driver separately
dry-runs the multi-chip path through __graft_entry__.dryrun_multichip).

Note: this environment pre-imports jax and sets JAX_PLATFORMS at interpreter
startup (sitecustomize), so we must override the config *after* import, not
just the env var.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
