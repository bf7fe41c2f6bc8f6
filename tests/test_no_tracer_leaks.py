"""Regression guard for the Sobol-table bug class: a module first imported
INSIDE a jit trace must not capture tracers in module-level globals.

(core/sobol.py used to materialize its direction-vector table with a
module-scope jnp.asarray; when integrators imported it lazily inside a
traced function, the global became a DynamicJaxprTracer and poisoned every
later trace with UnexpectedTracerError.)
"""

import os
import subprocess
import sys


CODE = r"""
import os
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
import importlib
import pkgutil

import jax
import jax.numpy as jnp

import bre_tpu

SKIP = ("bre_tpu.cli",)  # argparse entry point, nothing to import under trace

mods = [m.name for m in pkgutil.walk_packages(bre_tpu.__path__, "bre_tpu.")
        if not any(m.name.startswith(s) for s in SKIP)]


@jax.jit
def import_everything(x):
    for name in mods:
        try:
            importlib.import_module(name)
        except ImportError:
            pass  # e.g. compiled .so artifacts picked up by walk_packages
    return x + 1.0


import_everything(jnp.ones((4,)))

# Any module-level jnp constant created during that trace would now be a
# leaked tracer; exercising the known offender classes must not raise
# UnexpectedTracerError in a FRESH trace.
from bre_tpu.core.sobol import sobol_sample
from bre_tpu.core.lowdiscrepancy import radical_inverse

out = jax.jit(lambda a: sobol_sample(a, 0, 0))(jnp.arange(8, dtype=jnp.uint32))
out2 = jax.jit(lambda a: sobol_sample(a, a.astype(jnp.int32) % 4, 0))(
    jnp.arange(8, dtype=jnp.uint32))
float(out.sum() + out2.sum())
print("NO_LEAK_OK")
"""


def test_modules_imported_under_trace_do_not_leak():
    # The subprocess must resolve bre_tpu regardless of pytest's cwd
    # (running from tests/ vs the repo root).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + env.get("PYTHONPATH", "").split(os.pathsep))
    r = subprocess.run(
        [sys.executable, "-c", CODE], capture_output=True, text=True,
        timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "NO_LEAK_OK" in r.stdout
