"""Real-TPU parity for the sharded cohort path (VERDICT r3 item 9).

The cohort's production path on a multi-chip pod is
`parallel.mesh.sharded_landmark_fn` over the uint16 wire format; CI
validates it on the virtual 8-device CPU mesh
(test_pipeline/test_sharded_fullres_unet_equals_unsharded), and the
driver dry-runs it, but neither touches the real XLA:TPU data path that
the bitcast-id bug class corrupts (PERF.md "TPU denormal trap").  This
test runs the sharded program on the real chip as a 1-device mesh — the
degenerate pod — and asserts it matches the plain batched program's
metrics on hardware.

Gated on RUN_TPU=1 (one TPU client process at a time on this deployment).
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    os.environ.get("RUN_TPU") != "1",
    reason="real-TPU hardware test: set RUN_TPU=1 (one TPU client at a time)",
)
def test_tpu_sharded_wire_matches_batched():
    code = """
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from shoulder_tpu.io import ingest
from shoulder_tpu.models import forest
from shoulder_tpu.parallel import mesh as pmesh
from shoulder_tpu.pipeline import batch as B
from shoulder_tpu.pipeline import packing

spec = ingest.load_bone("/root/reference/tests/test_bones/humerus_left.stl")
spec2 = ingest.load_bone("/root/reference/tests/test_bones/humerus_right.stl")
rf = forest.load_params()
wire = B.stack_wire([spec, spec2])
mesh = pmesh.bone_mesh(jax.devices()[:1])
wire_dev = pmesh.shard_bones(wire, mesh)
rf_dev = jax.device_put(rf)
_ = float(np.asarray(jax.jit(jnp.sum)(jnp.ones(8))))  # warm D2H
fn = pmesh.sharded_landmark_fn(mesh, wire=True)
lm_sh = packing.fetch(fn(wire_dev, rf_dev))
lm_bt = packing.fetch(B.compute_landmarks_wire(jax.device_put(wire), rf_dev))
for f in ("neckshaft", "retroversion", "radius_curvature"):
    a, b = np.asarray(getattr(lm_sh, f)), np.asarray(getattr(lm_bt, f))
    assert np.allclose(a, b, atol=0.05), (f, a, b)
assert (np.asarray(lm_sh.side_is_left)
        == np.asarray(lm_bt.side_is_left)).all()
print("TPU_SHARDED_OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    assert "TPU_SHARDED_OK" in r.stdout, (r.stdout, r.stderr[-2000:])
