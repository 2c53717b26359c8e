"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip (pjit/shard_map) code paths are exercised without TPU hardware via
--xla_force_host_platform_device_count, the standard device-simulation route.
Must run before the first `import jax` anywhere in the test session.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# In this environment jax is pre-imported at interpreter startup (TPU tunnel
# integration), so the env var above is read too late for platform selection;
# the backend is still uninitialized here, so a config update works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "models"))

if HAS_REFERENCE and REFERENCE not in sys.path:
    # Appended (not prepended) so the repo's own top-level modules win.
    sys.path.append(REFERENCE)
