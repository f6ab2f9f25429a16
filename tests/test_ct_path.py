"""CT end-to-end path: volume -> marching tets -> welded mesh -> landmarks."""

import numpy as np
import pytest

from shoulder_tpu.io import stl
from shoulder_tpu.ops import marching_tets


def test_marching_tets_sphere():
    # analytic sphere: surface area and watertightness
    n = 48
    g = np.arange(n) - (n - 1) / 2.0
    z, y, x = np.meshgrid(g, g, g, indexing="ij")
    r = 16.0
    vol = (r - np.sqrt(x**2 + y**2 + z**2)).astype(np.float32)
    soup = marching_tets.marching_tets(vol, 0.0, max_active=300000,
                                       max_tris=400000)
    cnt = int(soup.count)
    assert cnt > 1000
    tris = np.asarray(soup.triangles[:cnt], np.float64)
    verts, faces = stl.weld(tris)
    nb, watertight = stl.edge_face_adjacency(faces)
    assert watertight
    # vertices on the sphere (world coords are index coords here; the
    # volume's center is at index (n-1)/2)
    center = np.full(3, (n - 1) / 2.0)
    rad = np.linalg.norm(verts - center, axis=1)
    assert abs(rad.mean() - r) < 0.1
    assert rad.std() < 0.1
    # total area close to 4 pi r^2
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1).sum()
    assert area == pytest.approx(4 * np.pi * r**2, rel=0.05)
    # outward winding: signed volume positive and close to sphere volume
    w0, w1, w2 = v0 - center, v1 - center, v2 - center
    signed_vol = np.einsum("ij,ij->i", w0, np.cross(w1, w2)).sum() / 6.0
    assert signed_vol == pytest.approx(4 / 3 * np.pi * r**3, rel=0.05)


def test_ct_volume_to_landmarks():
    from shoulder_tpu.config import tiny_config
    from shoulder_tpu.pipeline import ct

    cfg = tiny_config(max_faces=120000, max_verts=70000)
    vol, origin, spacing = ct.synth_ct_volume(
        shape=(110, 72, 72), spacing=(3.0, 2.2, 2.2), seed=1
    )
    seg, iso = ct.segment_volume(vol, "threshold", iso_hu=300.0)
    spec = ct.volume_to_spec(seg, origin, spacing, iso, config=cfg,
                             max_tris=250000)
    assert spec.watertight
    assert spec.extents[2] > 250  # humerus length survives the CT path

    from shoulder_tpu.pipeline import batch as B

    bt = B.stack_bones([spec])
    lm = B.landmarks_to_numpy(B.compute_landmarks_batch(bt, cfg=cfg, chunk=16))
    assert np.isfinite(lm.neckshaft[0])
    assert np.isfinite(lm.radius_curvature[0])
    assert 10.0 < lm.radius_curvature[0] < 40.0
