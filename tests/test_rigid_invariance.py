"""Rigid-transform invariance fuzz (VERDICT r3 item 6).

The SAME synthetic bone under N different random rigid CT frames must
yield the same clinical metrics, and its landmark points must map back to
the same build-frame locations.  This is the cheapest detector for the
OBB/frame bug class (bitcast-denormal ids, dense-rank polar shift) that
round 3 hit twice — the OBB canonicalization contract of the reference
(/root/reference/src/shoulder/humerus/mesh.py:82-125).

Slow (N_FRAMES full-resolution runs): gated behind RUN_SLOW=1.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1", reason="slow: set RUN_SLOW=1"
)

N_FRAMES = 6


def _rigid(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    t = rng.uniform(-150, 150, size=3)
    return rot, t


@pytest.fixture(scope="module")
def frames():
    from shoulder_tpu.io import ingest, stl
    from shoulder_tpu.io.testdata import synthetic_humerus
    from shoulder_tpu.pipeline import batch as B

    v0, f = synthetic_humerus(
        length=285.0, head_radius=23.5, neck_shaft_deg=133.0,
        retroversion_deg=28.0, side="right",
    )
    rng = np.random.default_rng(42)
    rigs, specs = [], []
    nbr, wt = stl.edge_face_adjacency(f)
    for i in range(N_FRAMES):
        rot, t = _rigid(rng)
        v = v0 @ rot.T + t
        rigs.append((rot, t))
        specs.append(ingest.spec_from_arrays(
            f"frame{i}", v.astype(np.float32), f.astype(np.int32), nbr, wt
        ))
    lm = B.landmarks_to_numpy(
        B.compute_landmarks_batch(B.stack_bones(specs), chunk=150)
    )
    return rigs, lm


def test_metrics_frame_invariant(frames):
    _, lm = frames
    ns = np.asarray(lm.neckshaft)
    rv = np.asarray(lm.retroversion)
    rad = np.asarray(lm.radius_curvature)
    assert np.isfinite(ns).all() and np.isfinite(rv).all()
    assert np.ptp(ns) < 0.5, f"neckshaft across frames: {np.round(ns, 3)}"
    assert np.ptp(rv) < 0.5, f"retroversion across frames: {np.round(rv, 3)}"
    assert np.ptp(rad) < 0.5, f"radius across frames: {np.round(rad, 3)}"
    assert not np.asarray(lm.side_is_left).any(), "side flipped under rigid"


def test_landmarks_map_back(frames):
    rigs, lm = frames
    # plane point + normal back in the build frame must agree across frames
    pts, normals = [], []
    for i, (rot, t) in enumerate(rigs):
        p = (np.asarray(lm.anp_plane_point[i]) - t) @ rot
        n = np.asarray(lm.anp_plane_normal[i]) @ rot
        n = n if n[2] >= 0 else -n
        pts.append(p)
        normals.append(n)
    pts, normals = np.stack(pts), np.stack(normals)
    assert np.ptp(pts, axis=0).max() < 1.0, f"plane points:\n{pts}"
    ref = normals[0]
    for n in normals[1:]:
        ang = np.degrees(np.arccos(np.clip(np.dot(ref, n), -1, 1)))
        assert ang < 0.5, f"plane normal drift {ang:.3f} deg"
