"""Voxel-pitch gate for the CT path (VERDICT r4 item 7 follow-through).

Pins test_ct_path's retroversion tolerance to a runnable measurement:
the CT-vs-direct-mesh metric deltas must stay inside the pitch-sweep
envelope committed in tools/eval_ct_pitch_results.json (round-5
measurements: d_rv +1.25 deg @ 1.0 mm, +3.64 @ 1.5 mm; 2.0 mm collapses
because the 3.5 mm groove/recess is sub-voxel and is deliberately NOT
gated).  If rim localization regresses, this fails before the widened
4.5-deg A/B tolerance would.

Slow (two marching-tets meshes + full pipeline on CPU): RUN_SLOW=1.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1", reason="slow: set RUN_SLOW=1"
)

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

# measured + ~40% margin (eval_ct_pitch_results.json round 5)
BOUNDS = {1.0: dict(rv=2.0, ns=1.0, rad=0.75), 1.5: dict(rv=4.5, ns=2.0,
                                                         rad=0.75)}


@pytest.mark.parametrize("pitch", [1.0, 1.5])
def test_pitch_deltas_within_measured_envelope(pitch):
    from eval_ct_pitch import BONE_KW, make_cfg

    from shoulder_tpu.io import ingest, stl
    from shoulder_tpu.io.testdata import synthetic_humerus
    from shoulder_tpu.pipeline import batch as B
    from shoulder_tpu.pipeline import ct

    cfg = make_cfg()
    v, f = synthetic_humerus(n_rings=220, n_theta=192, **BONE_KW)
    nb, wt = stl.edge_face_adjacency(f)
    spec_mesh = ingest.spec_from_arrays("direct", v, f, nb, wt, config=cfg)

    shape = (int(round(320.0 / pitch)), int(round(144.0 / pitch)),
             int(round(144.0 / pitch)))
    vol, origin, spacing = ct.synth_ct_volume(
        shape=shape, spacing=(pitch,) * 3, seed=1, noise_hu=15.0, **BONE_KW
    )
    seg, iso = ct.segment_volume(vol, "threshold", iso_hu=300.0)
    spec_ct = ct.volume_to_spec(seg, origin, spacing, iso, config=cfg,
                                max_tris=400000)

    bt = B.stack_bones([spec_mesh, spec_ct])
    lm = B.landmarks_to_numpy(B.compute_landmarks_batch(bt, cfg=cfg,
                                                        chunk=16))
    b = BOUNDS[pitch]
    d_rv = abs(float(lm.retroversion[1]) - float(lm.retroversion[0]))
    d_ns = abs(float(lm.neckshaft[1]) - float(lm.neckshaft[0]))
    d_rad = abs(float(lm.radius_curvature[1]) -
                float(lm.radius_curvature[0]))
    assert lm.side_is_left[0] == lm.side_is_left[1]
    assert d_rv < b["rv"], f"pitch {pitch}: d_rv {d_rv:.2f}"
    assert d_ns < b["ns"], f"pitch {pitch}: d_ns {d_ns:.2f}"
    assert d_rad < b["rad"], f"pitch {pitch}: d_rad {d_rad:.2f}"
