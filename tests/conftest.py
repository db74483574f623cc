"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding logic (DP train step, mesh tests) runs anywhere, per
SURVEY.md §4. Must set env vars before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU PJRT plugin in this environment overrides JAX_PLATFORMS; the
# config API is authoritative, so force the CPU backend explicitly (tests
# must not contend for the single tunneled TPU chip).
import jax

jax.config.update("jax_platforms", "cpu")

import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Build the native C++ preprocess library so its parity test never silently
# skips on a clean checkout (the .so is deliberately not committed).
_NATIVE_DIR = os.path.join(REPO_ROOT, "native")
_NATIVE_SO = os.path.join(_NATIVE_DIR, "libposenet_preprocess.so")
if not os.path.exists(_NATIVE_SO):
    import subprocess

    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"warning: native build failed ({e}); "
              "native-preprocess tests will skip", file=sys.stderr)
