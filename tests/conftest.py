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

# persistent XLA compile cache: the suite's dominant cost on small hosts is
# recompiling the same evidence-DP/window-step shapes every run
_cache_dir = os.path.expanduser("~/.cache/lancet2_tpu/xla")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass  # best-effort: unwritable HOME degrades to no cache, not a failure

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
