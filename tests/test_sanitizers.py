"""Sanitizer mode: the tiny-config pipeline under jax_debug_nans
(SURVEY.md §5 "race detection / sanitizers").

The device-side analog of running under a sanitizer: jax_debug_nans makes
any NaN produced inside the jitted pipeline raise at the producing op
(de-optimized re-run).  A healthy bone must complete cleanly under it.
(rank_promotion="raise" was considered and rejected: (N,3) + (3,)
point-plus-offset broadcasts are idiomatic throughout the geometry core.)

Invocation: runs in the default suite.  To run the whole suite in this
mode instead, set JAX_DEBUG_NANS=1 in the environment (honored natively
by jax.config).
"""

import os
import tempfile

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_cfg():
    from shoulder_tpu.config import tiny_config

    return tiny_config()


def test_pipeline_clean_under_debug_nans(tiny_cfg):
    import jax

    from shoulder_tpu.io import ingest, stl
    from shoulder_tpu.io.testdata import synthetic_humerus
    from shoulder_tpu.pipeline import batch as B

    rng = np.random.default_rng(7)
    v, f = synthetic_humerus(rng_transform=rng, n_rings=60, n_theta=48)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "bone.stl")
        stl.write_stl(p, v, f)
        spec = ingest.load_bone(p, config=tiny_cfg)

    prev_nans = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        bt = B.stack_bones([spec])
        lm = B.landmarks_to_numpy(
            B.compute_landmarks_batch(bt, cfg=tiny_cfg, chunk=16)
        )
    finally:
        jax.config.update("jax_debug_nans", prev_nans)

    assert np.isfinite(lm.neckshaft).all()
    assert np.isfinite(lm.canal_axis).all()
    assert np.isfinite(lm.radius_curvature).all()
