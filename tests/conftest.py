"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on ``--xla_force_host_platform_device_count=8`` CPU devices, the
standard JAX pattern for testing ``Mesh``/``shard_map`` code single-host.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Detach from the axon TPU relay: tests are CPU-only and must not claim the
# (single) TPU grant; a wedged/busy relay would otherwise hang every test.
# NOTE: sitecustomize imports jax at interpreter startup (before conftest), so
# env vars alone are too late — force the platform through jax.config too.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the default tier is compile-bound on small
# boxes (18 min at round 4, most of it XLA compiles of unchanged graphs).
# Warm reruns deserialize executables instead (VERDICT round-4 item 1).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bre_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


# ---------------------------------------------------------------------------
# Slow-test gating: the heaviest tests (multi-minute CPU compiles of sharded /
# unrolled-gradient graphs) run only with RUN_SLOW=1; the default suite stays
# in CI-friendly time.  Run the full set at milestones:
#   RUN_SLOW=1 python -m pytest tests/ -q
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

RUN_SLOW = os.environ.get("RUN_SLOW", "") == "1"


def pytest_collection_modifyitems(config, items):
    if RUN_SLOW:
        return
    skip = pytest.mark.skip(reason="slow test; set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
