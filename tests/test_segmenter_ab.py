"""Default-vs-sphere segmenter A/B tripwire (VERDICT r4 item 8).

The default ("unet") articular path seeds and supports the robust-sphere
consensus with the CNN mask; its fallback arm is the plain sphere
consensus.  Round 4 shipped a default that lost ~25 deg of healthy
neck-shaft accuracy to its own fallback because the CNN had gone out of
domain — this test is the tripwire that fails loudly if that ever happens
again: on BOTH exact-truth cohorts, the default path must never be worse
than the sphere path by more than a small margin on any clinical metric.

(The reference's CRF-refined CNN plays the same role on top of classical
geometry, reference anatomic_neck.py:62-76.)

Slow (two full-resolution cohort runs per segmenter on CPU): RUN_SLOW=1.
"""

import dataclasses
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1", reason="slow: set RUN_SLOW=1"
)

N_PER_COHORT = 4

# the default may not be worse than its own fallback by more than:
MARGIN = dict(ns=1.5, rv=2.0, rad=0.75)  # deg, deg, mm (on |max| error)


@pytest.fixture(scope="module")
def ab_results():
    from shoulder_tpu.config import DEFAULT_CONFIG
    from shoulder_tpu.io import ingest, stl
    from shoulder_tpu.io.testdata import synthetic_humerus
    from shoulder_tpu.pipeline import batch as B

    rng = np.random.default_rng(77)
    out = {}
    for kind in ("healthy", "arthritic"):
        specs, truth = [], []
        i = 0
        while len(specs) < N_PER_COHORT:
            i += 1
            p = dict(
                length=float(rng.uniform(250, 310)),
                head_radius=float(rng.uniform(20, 27)),
                neck_shaft_deg=float(rng.uniform(125.0, 145.0)),
                retroversion_deg=float(rng.uniform(15.0, 40.0)),
                side="left" if rng.random() < 0.5 else "right",
            )
            deg = dict(
                head_flattening=float(rng.uniform(0.12, 0.3)),
                osteophyte_amp=float(rng.uniform(0.5, 2.5)),
                surface_noise=float(rng.uniform(0.2, 0.6)),
            ) if kind == "arthritic" else {}
            v, f = synthetic_humerus(rng_transform=rng, **p, **deg)
            nbr, wt = stl.edge_face_adjacency(f)
            try:
                spec = ingest.spec_from_arrays(
                    f"ab{i}", v.astype(np.float32), f.astype(np.int32),
                    nbr, wt,
                )
            except ValueError:
                continue
            specs.append(spec)
            truth.append(p)
        bones = B.stack_bones(specs)
        arms = {}
        for seg in ("unet", "sphere"):
            cfg = dataclasses.replace(DEFAULT_CONFIG, segmenter=seg)
            lm = B.landmarks_to_numpy(
                B.compute_landmarks_batch(bones, cfg=cfg, chunk=150)
            )
            arms[seg] = dict(
                ns=np.abs(np.asarray(lm.neckshaft) - np.array(
                    [t["neck_shaft_deg"] for t in truth])),
                rv=np.abs(np.asarray(lm.retroversion) - np.array(
                    [t["retroversion_deg"] for t in truth])),
                rad=np.abs(np.asarray(lm.radius_curvature) - np.array(
                    [t["head_radius"] for t in truth])),
            )
        out[kind] = arms
    return out


@pytest.mark.parametrize("kind", ["healthy", "arthritic"])
@pytest.mark.parametrize("metric", ["ns", "rv", "rad"])
def test_default_never_worse_than_sphere(ab_results, kind, metric):
    unet = ab_results[kind]["unet"][metric]
    sphere = ab_results[kind]["sphere"][metric]
    assert np.isfinite(unet).all(), f"{kind}/{metric}: non-finite default"
    worse = np.max(unet) - np.max(sphere)
    assert worse < MARGIN[metric], (
        f"{kind}: default |max| {metric} err {np.max(unet):.2f} vs sphere "
        f"{np.max(sphere):.2f} — default is worse by {worse:.2f} "
        f"(margin {MARGIN[metric]}); per-bone default {np.round(unet, 2)} "
        f"sphere {np.round(sphere, 2)}"
    )
