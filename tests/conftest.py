"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU (no TPU needed in CI);
the driver separately dry-runs the multichip path via __graft_entry__.
Environment must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
