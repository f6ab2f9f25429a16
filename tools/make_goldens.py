"""Regenerate tests/goldens_fixtures.json from the current pipeline.

Self-goldens: they lock THIS implementation's validated outputs (the
reference itself cannot run in this environment — no trimesh/onnxruntime,
see BASELINE.md), guarded by the anatomical-plausibility and
flip-invariance checks in tests/test_reference_fixtures.py.  Run those
(RUN_SLOW=1) after regenerating; never regenerate to paper over an
unexplained shift.

Usage: python tools/make_goldens.py [--check]
  --check  print the diff vs the committed goldens without writing.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from shoulder_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu(1)

import numpy as np  # noqa: E402

FIXTURES = Path("/root/reference/tests/test_bones")
OUT = Path(__file__).resolve().parents[1] / "tests" / "goldens_fixtures.json"
NAMES = [
    "humerus_left.stl",
    "humerus_left_flipped.stl",
    "humerus_right.stl",
    "humerus_left_trab.stl",
]


def main():
    from shoulder_tpu.io import ingest
    from shoulder_tpu.pipeline import batch as B

    specs = [ingest.load_bone(FIXTURES / n) for n in NAMES]
    lm = B.landmarks_to_numpy(
        B.compute_landmarks_batch(B.stack_bones(specs), chunk=50)
    )
    gold = {}
    for i, n in enumerate(NAMES):
        gold[n] = {
            "side_is_left": bool(lm.side_is_left[i]),
            "retroversion": round(float(lm.retroversion[i]), 3),
            "neckshaft": round(float(lm.neckshaft[i]), 3),
            "radius_curvature": round(float(lm.radius_curvature[i]), 3),
            "neck_z": round(float(lm.neck_z[i]), 3),
            "bg_theta": round(float(lm.bg_theta[i]), 4),
            "canal_axis": np.round(
                np.asarray(lm.canal_axis[i], np.float64), 3
            ).tolist(),
            "te_axis": np.round(
                np.asarray(lm.te_axis[i], np.float64), 3
            ).tolist(),
            "anp_plane_normal": np.round(
                np.asarray(lm.anp_plane_normal[i], np.float64), 4
            ).tolist(),
        }

    if "--check" in sys.argv:
        old = json.loads(OUT.read_text())
        for n in NAMES:
            for k in gold[n]:
                a, b = old[n][k], gold[n][k]
                if not np.allclose(np.asarray(a, object).astype(float),
                                   np.asarray(b, object).astype(float),
                                   atol=1e-6):
                    print(f"{n}/{k}: {a} -> {b}")
        return
    OUT.write_text(json.dumps(gold, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
