"""Arthritic-cohort robustness (BASELINE.json config 4 analog).

The reference's stress case is degenerate geometry (validate_arthritic.py):
flattened heads, osteophytes, rough articular surfaces.  The pipeline must
stay finite and the QC diagnostics must respond (higher sphere residual on
aspherical heads) — per-bone failure isolation, SURVEY.md §5.
"""

import os
import tempfile

import numpy as np
import pytest

from shoulder_tpu.config import tiny_config
from shoulder_tpu.io import ingest, stl
from shoulder_tpu.io.testdata import synthetic_humerus
from shoulder_tpu.pipeline import batch as B


@pytest.fixture(scope="module")
def cohort():
    cfg = tiny_config()
    rng = np.random.default_rng(7)
    specs = []
    variants = [
        dict(),  # healthy
        dict(head_flattening=0.2, surface_noise=0.4),
        dict(osteophyte_amp=3.0, surface_noise=0.3),
        dict(head_flattening=0.25, osteophyte_amp=2.0, surface_noise=0.5),
    ]
    with tempfile.TemporaryDirectory() as td:
        for i, kw in enumerate(variants):
            v, f = synthetic_humerus(
                rng_transform=rng, n_rings=60, n_theta=48, **kw
            )
            p = os.path.join(td, f"bone{i}.stl")
            stl.write_stl(p, v, f)
            specs.append(ingest.load_bone(p, config=cfg))
    bt = B.stack_bones(specs)
    lm = B.landmarks_to_numpy(B.compute_landmarks_batch(bt, cfg=cfg, chunk=16))
    return lm


def test_all_bones_finite(cohort):
    lm = cohort
    assert np.isfinite(lm.neckshaft).all()
    assert np.isfinite(lm.retroversion).all()
    assert np.isfinite(lm.radius_curvature).all()
    assert np.isfinite(lm.canal_axis).all()
    assert np.isfinite(lm.te_axis).all()


def test_qc_responds_to_degeneracy(cohort):
    lm = cohort
    healthy_resid = lm.qc_sphere_resid[0]
    worst_resid = lm.qc_sphere_resid[3]
    # the flattened+osteophytic head must fit a sphere worse than healthy
    assert worst_resid > healthy_resid


def test_failure_isolation(cohort):
    # per-bone independence under vmap: the healthy bone's outputs are
    # unaffected by arthritic lane content (computed in the same batch)
    lm = cohort
    assert 60.0 < lm.neckshaft[0] < 180.0
    assert lm.radius_curvature[0] > 5.0


def test_no_slice_overflow(cohort):
    assert not cohort.qc_slice_overflow.any()
