"""Forest evaluator, rotated-rect ops, ray casting, geometric fits."""

import numpy as np
import pytest

from shoulder_tpu.models import forest
from shoulder_tpu.ops import rays, rect
from shoulder_tpu.utils import fits, geometry


# ---------------------------------------------------------------- forest
def test_forest_matches_recursive_walk():
    p = forest.load_params()
    z = np.load("shoulder_tpu/models/params/rfc_bg3.npz")
    feat, val = z["feature"], z["value"]
    tc, fc, leaf, lw = (
        z["true_child"], z["false_child"], z["is_leaf"], z["leaf_weights"],
    )

    def oracle(x):
        s = 0.0
        for t in range(feat.shape[0]):
            n = 0
            while not leaf[t, n]:
                n = tc[t, n] if x[feat[t, n]] <= val[t, n] else fc[t, n]
            s += lw[t, n, 1]
        return np.array([1.0 - s, s])

    rng = np.random.default_rng(0)
    X = (rng.normal(size=(32, 9)) * 2).astype(np.float32)
    ours = np.asarray(forest.predict_proba(p, X))
    ref = np.stack([oracle(x) for x in X])
    assert np.allclose(ours, ref, atol=1e-6)
    assert np.allclose(ours.sum(1), 1.0, atol=1e-6)


def test_forest_multilevel_descent_bitexact():
    """The packed-subtree descent (levels>1) must be BIT-identical to the
    one-level reference descent: same comparisons, same f32 arithmetic,
    only the gather granularity changes."""
    p = forest.load_params()
    rng = np.random.default_rng(3)
    X = (rng.normal(size=(64, 9)) * 2).astype(np.float32)
    ref = np.asarray(forest.predict_proba(p, X, levels=1))
    for levels in (2, 3, 4):
        out = np.asarray(forest.predict_proba(p, X, levels=levels))
        assert np.array_equal(out, ref), levels


# ------------------------------------------------------------------ rect
def test_min_rotated_rect_rectangle():
    rng = np.random.default_rng(1)
    th = 0.3
    u = np.array([np.cos(th), np.sin(th)])
    v = np.array([-np.sin(th), np.cos(th)])
    # dense points on a 10 x 4 rectangle boundary
    t = np.linspace(0, 1, 200)
    edge1 = (t[:, None] - 0.5) * 10 * u + 2 * v
    edge2 = (t[:, None] - 0.5) * 10 * u - 2 * v
    edge3 = (t[:, None] - 0.5) * 4 * v + 5 * u
    edge4 = (t[:, None] - 0.5) * 4 * v - 5 * u
    pts = np.concatenate([edge1, edge2, edge3, edge4]) + np.array([3.0, -7.0])
    r = rect.min_rotated_rect(pts.astype(np.float32))
    assert float(r.major_extent) == pytest.approx(10.0, abs=1e-3)
    assert float(r.minor_extent) == pytest.approx(4.0, abs=1e-3)
    assert np.allclose(np.asarray(r.center), [3.0, -7.0], atol=1e-3)
    d = np.abs(np.asarray(r.major_dir) @ u)
    assert d == pytest.approx(1.0, abs=1e-5)


def test_end_slab_and_run_centroids():
    # ellipse: the two ends along the major axis get cut off
    t = np.linspace(-np.pi, np.pi, 256, endpoint=False)
    pts = np.stack([8 * np.cos(t), 3 * np.sin(t)], axis=1).astype(np.float32)
    r = rect.min_rotated_rect(pts)
    out, _ = rect.end_slab_mask(pts, r, 0.96)
    assert bool(out.any())
    rid = rect.cyclic_runs(out, 8)
    n_runs = len(set(np.asarray(rid)[np.asarray(rid) >= 0].tolist()))
    assert n_runs == 2
    cents, counts, valid = rect.run_chord_centroids(pts, rid, None, 8)
    cents = np.asarray(cents)[np.asarray(valid)]
    assert cents.shape[0] == 2
    xs = np.sort(cents[:, 0])
    assert xs[0] < -7.0 and xs[1] > 7.0
    assert np.all(np.abs(cents[:, 1]) < 0.5)


# ------------------------------------------------------------------ rays
def test_ray_first_hit_sphere():
    from shoulder_tpu.io.testdata import synthetic_humerus
    from shoulder_tpu.io import stl as stlmod

    # unit-ish icosphere substitute: use the synthetic bone and shoot a ray
    verts, faces = synthetic_humerus()
    origin = np.array([0.0, 0.0, 150.0], np.float32)
    direction = np.array([1.0, 0.0, 0.0], np.float32)
    pt, t, hit = rays.first_hit(
        verts.astype(np.float32), faces.astype(np.int32), origin, direction
    )
    assert bool(hit)
    # exits through the shaft wall: ~shaft_radius away
    assert 8.0 < float(t) < 30.0
    assert abs(float(pt[2]) - 150.0) < 1e-3


# ------------------------------------------------------------------ fits
def test_fit_line_and_plane():
    rng = np.random.default_rng(0)
    d = np.array([0.2, -0.4, 0.89])
    d /= np.linalg.norm(d)
    t = rng.uniform(-50, 50, 200)
    pts = np.array([1.0, 2.0, 3.0]) + t[:, None] * d
    pts += rng.normal(0, 0.01, pts.shape)
    c, dd = fits.fit_line(pts.astype(np.float32))
    assert abs(abs(float(np.dot(np.asarray(dd), d))) - 1) < 1e-4

    n = np.array([0.3, 0.1, 0.95]); n /= np.linalg.norm(n)
    b1 = np.cross(n, [1, 0, 0]); b1 /= np.linalg.norm(b1)
    b2 = np.cross(n, b1)
    uv = rng.uniform(-20, 20, (300, 2))
    pp = np.array([5, -2, 7]) + uv[:, :1] * b1 + uv[:, 1:] * b2
    pp += rng.normal(0, 0.01, pp.shape)
    c2, nn = fits.fit_plane(pp.astype(np.float32))
    assert abs(abs(float(np.dot(np.asarray(nn), n))) - 1) < 1e-4


def test_eigh3_matches_lapack():
    rng = np.random.default_rng(7)
    for _ in range(20):
        a = rng.normal(0, 10, (3, 3))
        a = (a + a.T).astype(np.float32)
        vals, vecs = fits.eigh3(a)
        ref_vals, ref_vecs = np.linalg.eigh(a.astype(np.float64))
        assert np.allclose(np.asarray(vals), ref_vals, atol=1e-3)
        # eigenvector signs are arbitrary: compare |dot| per column
        dots = np.abs(np.sum(np.asarray(vecs) * ref_vecs, axis=0))
        assert np.allclose(dots, 1.0, atol=1e-3)


def test_fit_sphere_and_circle():
    rng = np.random.default_rng(2)
    c = np.array([4.0, -3.0, 10.0])
    r = 23.0
    v = rng.normal(size=(500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = c + r * v
    rr, cc = fits.fit_sphere(pts.astype(np.float32))
    assert float(rr) == pytest.approx(r, abs=1e-2)
    assert np.allclose(np.asarray(cc), c, atol=1e-2)

    t = rng.uniform(0, 2 * np.pi, 100)
    p2 = np.stack([3 + 7 * np.cos(t), -1 + 7 * np.sin(t)], axis=1)
    cx, cy, rad, res = fits.fit_circle(p2.astype(np.float32))
    assert float(rad) == pytest.approx(7.0, abs=1e-3)
    assert float(res) == pytest.approx(0.0, abs=1e-3)


def test_fit_ellipse():
    rng = np.random.default_rng(3)
    t = rng.uniform(0, 2 * np.pi, 400)
    phi = 0.6
    a, b = 9.0, 4.0
    x = a * np.cos(t)
    y = b * np.sin(t)
    R = np.array([[np.cos(phi), -np.sin(phi)], [np.sin(phi), np.cos(phi)]])
    pts = (np.stack([x, y], 1) @ R.T) + np.array([2.0, -5.0])
    pts += rng.normal(0, 0.02, pts.shape)
    center, w, h, ang = fits.fit_ellipse(pts.astype(np.float32))
    assert np.allclose(np.asarray(center), [2.0, -5.0], atol=0.05)
    axes = sorted([abs(float(w)), abs(float(h))])
    assert axes[1] == pytest.approx(9.0, abs=0.1)
    assert axes[0] == pytest.approx(4.0, abs=0.1)


def test_construct_csys_properties():
    rng = np.random.default_rng(4)
    vz = rng.normal(size=(2, 3)) * 10
    vy = rng.normal(size=(2, 3)) * 10
    tf = np.asarray(geometry.construct_csys(vz, vy))
    rot = tf[:3, :3]
    assert np.allclose(rot @ rot.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(rot) == pytest.approx(1.0, abs=1e-5)
    # the z-axis direction maps to +z
    zhat = (vz[0] - vz[1]) / np.linalg.norm(vz[0] - vz[1])
    mapped = rot @ zhat
    assert np.allclose(mapped, [0, 0, 1], atol=1e-5)
    # the midpoint of vec_z maps to the origin
    mid = np.asarray(geometry.transform_pts(vz.mean(0, keepdims=True), tf))
    assert np.allclose(mid, 0, atol=1e-4)


def test_inv_transform_roundtrip():
    rng = np.random.default_rng(5)
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    w, x, y, z = q
    rot = np.array([
        [1 - 2*(y*y+z*z), 2*(x*y-z*w), 2*(x*z+y*w)],
        [2*(x*y+z*w), 1 - 2*(x*x+z*z), 2*(y*z-x*w)],
        [2*(x*z-y*w), 2*(y*z+x*w), 1 - 2*(x*x+y*y)],
    ])
    tf = np.eye(4); tf[:3, :3] = rot; tf[:3, 3] = [3, -8, 2]
    inv = np.asarray(geometry.inv_transform(tf))
    assert np.allclose(inv @ tf, np.eye(4), atol=1e-6)


# ----------------------------------------------------------------- extras
def test_utils_extras(tmp_path):
    from shoulder_tpu.utils import extras

    # iges line export writes a parseable-looking file
    p = tmp_path / "line.igs"
    extras.write_iges_line(np.array([[0, 0, 0], [1, 2, 3]]), p)
    text = p.read_text()
    assert "110," in text and text.rstrip().endswith("T0000001")

    # z-score filter drops the outlier row
    arr = np.array([[0.0, 1.0], [0.1, 1.1], [0.05, 0.9], [5.0, 1.0]])
    kept = extras.z_score_filter(arr, 0, 1.2)
    assert len(kept) == 3 and 5.0 not in kept[:, 0]

    # closest point
    pts = np.array([[0, 0, 0], [1, 1, 1], [3, 3, 3]], float)
    nearest = extras.closest_pt(np.array([0.9, 1.0, 1.1]), pts)
    assert np.allclose(nearest, [1, 1, 1])
    nearest2, rest = extras.closest_pt(
        np.array([0.9, 1.0, 1.1]), pts, return_other_pts=True
    )
    assert len(rest) == 2

    # rotation alignment + angle
    r = extras.rot_matrix_3d([1, 0, 0], [0, 1, 0])
    assert np.allclose(r @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-9)
    assert extras.angle_between([1, 0, 0], [0, 1, 0]) == pytest.approx(90.0)
    assert extras.angle_between([1, 0, 0], [1, 0, 0]) == pytest.approx(0.0)


def test_longest_cyclic_run_matches_rolled_oracle():
    """The gather-free run selection (cummax/cummin run extents) must pick
    the exact run the original rolled run-id/argmax formulation picked,
    including cyclic wrap-around runs and ties."""
    import jax
    import jax.numpy as jnp

    from shoulder_tpu.models import segment

    def oracle(mask):
        out = np.zeros_like(mask)
        for r in range(mask.shape[0]):
            m = mask[r]
            n = len(m)
            first_false = int(np.argmin(m))
            idx = (np.arange(n) + first_false) % n
            rr = m[idx]
            starts = rr & ~np.roll(rr, 1)
            starts[0] = rr[0]
            rid = np.where(rr, np.cumsum(starts) - 1, -1)
            counts = np.zeros(n + 1, np.int32)
            np.add.at(counts, np.where(rid >= 0, rid, n), 1)
            keep = rid == int(np.argmax(counts[:n]))
            row = np.zeros(n, bool)
            row[idx] = keep
            out[r] = row & m
        return out

    rng = np.random.default_rng(0)
    f = jax.jit(segment._longest_cyclic_run_per_row)
    cases = [rng.random((32, w)) < p
             for p in (0.1, 0.4, 0.6, 0.9) for w in (37, 512)]
    cases.append(np.ones((4, 16), bool))
    cases.append(np.zeros((4, 16), bool))
    wrap = rng.random((64, 50)) < 0.5
    wrap[:, 0] = True
    wrap[:, -1] = True
    cases.append(wrap)
    one_false = np.ones((8, 20), bool)
    one_false[np.arange(8), rng.integers(0, 20, 8)] = False
    cases.append(one_false)
    for c in cases:
        got = np.asarray(f(jnp.asarray(c)))
        assert (got == oracle(c)).all()
