"""Module-level tracer hygiene: no package module may hold a jax Tracer.

The round-3..5 order-dependent INVALID_ARGUMENT wart ("Execution supplied 9
buffers but compiled program expected 17", tripping when
tests/test_register.py ran before tests/test_pipeline.py in one process) was
caused by module-level jnp scalars (ops/hashgrid._BIG/_FAR): lazy in-function
imports mean a module can be FIRST imported inside a jit trace, where
`jnp.float32(x)` returns a DynamicJaxprTracer that the module global then
holds forever, riding every later trace as a phantom lifted constant.  The
fix keeps such constants numpy.  This test reproduces the trigger (first
import of ops.hashgrid inside a jit trace, in a fresh subprocess) and then
asserts no module in the package holds a Tracer attribute.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, %(repo)r)
import jax
import jax.numpy as jnp

# ops.hashgrid (and anything else register.py lazily imports) must NOT be
# imported yet — the whole point is to first-import it inside the trace.
banned = [m for m in sys.modules
          if "feature_base_pointcloud_registration_tpu" in m]
assert not banned, banned


@jax.jit
def traced(x):
    # first import of the package happens HERE, inside the trace
    from feature_base_pointcloud_registration_tpu.ops.hashgrid import (
        build_grid_sentinel_core, default_grid_spec, grid_origin)
    from feature_base_pointcloud_registration_tpu.ops import (
        correspondence, features, knn, voxel)
    dims = default_grid_spec((4.0, 4.0, 4.0), 2.0)
    origin = grid_origin(jnp.zeros(3), jnp.full(3, 4.0))
    tab = build_grid_sentinel_core(x, jnp.ones(x.shape[0], bool), origin,
                                   2.0, dims=dims, cell_cap=4)
    return tab.sum()


traced(jnp.zeros((32, 3), jnp.float32)).block_until_ready()

import jax.core
bad = []
for name, mod in list(sys.modules.items()):
    if "feature_base_pointcloud_registration_tpu" not in name or mod is None:
        continue
    for attr, val in vars(mod).items():
        if isinstance(val, jax.core.Tracer):
            bad.append(f"{name}.{attr} = {val!r}")
if bad:
    print("LEAKED TRACERS:\n" + "\n".join(bad))
    sys.exit(1)
print("clean")
"""


def test_no_module_level_tracers_after_import_inside_trace():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", _SCRIPT % {"repo": repo}],
                       capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "clean" in r.stdout
