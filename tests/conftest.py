"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU (no TPU needed in CI);
the driver separately dry-runs the multichip path via __graft_entry__.

Note: the axon TPU tunnel plugin in this image ignores the JAX_PLATFORMS
environment variable, so the platform must be forced via jax.config before
any backend initialization.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
