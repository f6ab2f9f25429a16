"""Real-TPU hardware golden test for the full landmark pipeline.

CPU tests cannot catch XLA:TPU-only corruption: the bitcast-id bug
(PERF.md "TPU denormal trap") kept every CPU test — including full-res
goldens — green while the TPU emitted garbage anatomy, because the TPU
float32 data path flushes denormals and canonicalizes NaNs.  This test
runs the full-resolution reference fixture through the default pipeline
on the real chip and asserts the same goldens the CPU suite pins.

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
def test_tpu_pipeline_matches_goldens():
    # the suite pins jax to CPU in-process (conftest); the TPU client must
    # be a fresh process with the default (axon) backend
    code = """
import sys, json; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from shoulder_tpu.io import ingest
from shoulder_tpu.pipeline import batch as B
GOLD = json.load(open("/root/repo/tests/goldens_fixtures.json"))
g = GOLD["humerus_left.stl"]
spec = ingest.load_bone("/root/reference/tests/test_bones/humerus_left.stl")
bones = jax.block_until_ready(jax.device_put(B.stack_bones([spec])))
_ = float(np.asarray(jax.jit(jnp.sum)(bones.z_length)))  # warm D2H
lm = B.landmarks_to_numpy(B.compute_landmarks_batch(bones, chunk=50))
assert bool(lm.side_is_left[0]) == g["side_is_left"]
assert abs(lm.retroversion[0] - g["retroversion"]) < 0.5, lm.retroversion[0]
assert abs(lm.neckshaft[0] - g["neckshaft"]) < 0.5, lm.neckshaft[0]
assert abs(lm.radius_curvature[0] - g["radius_curvature"]) < 0.5
assert abs(lm.bg_theta[0] - g["bg_theta"]) < 0.02
assert not bool(lm.qc_slice_overflow[0])
assert not bool(lm.qc_open_edges[0])
print("TPU_PIPELINE_OK")
"""
    # generous bound: full-res compile over the tunnel is 90-300 s
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1200,
    )
    assert "TPU_PIPELINE_OK" in r.stdout, (r.stdout, r.stderr[-2000:])
