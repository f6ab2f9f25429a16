"""Signature-parity audit against a hand-written manifest of the
reference's public API (VERDICT round 1 item 6).

The manifest transcribes every public method/property/attribute a
reference user can reach (with parameter names and defaults) from
src/shoulder/{bone,arthroplasty,plotting}.py and
src/shoulder/humerus/{canal,surgical_neck,bicipital_groove,anatomic_neck,
epicondyle}.py.  If the reference surface and this package drift, this
test names the missing member or changed signature.
"""

import inspect

import numpy as np
import pytest

import shoulder_tpu
from shoulder_tpu import bone as bone_mod


def _check_method(cls, name, params):
    """params: list of (param_name, default) after self."""
    member = inspect.getattr_static(cls, name)
    if isinstance(member, property):
        raise AssertionError(f"{cls.__name__}.{name} is a property, "
                             "expected a method")
    fn = member.__func__ if isinstance(member, (staticmethod, classmethod)) \
        else member
    sig = inspect.signature(fn)
    got = [(p.name, p.default) for p in sig.parameters.values()
           if p.name != "self"]
    assert got == params, (
        f"{cls.__name__}.{name}: signature {got} != reference {params}"
    )


def _check_property(cls, name):
    member = inspect.getattr_static(cls, name)
    assert isinstance(member, property), (
        f"{cls.__name__}.{name} must be a property (reference accesses it "
        "without calling)"
    )


E = inspect.Parameter.empty


# --- landmark views (reference humerus/*.py) ----------------------------
def test_canal_surface():
    # canal.py:19,58,88,126
    _check_method(bone_mod.Canal, "points", [("cutoff_pcts", (0.35, 0.75))])
    _check_method(bone_mod.Canal, "axis", [("cutoff_pcts", (0.35, 0.75))])
    _check_method(bone_mod.Canal, "get_transform", [])
    _check_method(bone_mod.Canal, "transform_landmark", [])


def test_surgical_neck_surface():
    # surgical_neck.py:22 (cached_property), 59, 70
    _check_property(bone_mod.SurgicalNeck, "points")
    _check_method(bone_mod.SurgicalNeck, "cutoff_zs",
                  [("bottom_pct", 0.35), ("top_pct", 0.85)])
    _check_method(bone_mod.SurgicalNeck, "z_percent", [])


def test_deep_groove_surface():
    # bicipital_groove.py:26,244
    _check_method(bone_mod.DeepGroove, "points",
                  [("cutoff_pcts", (0.2, 0.75)), ("deg_window", 7)])
    _check_method(bone_mod.DeepGroove, "axis", [])


def test_anatomic_neck_surface():
    # anatomic_neck.py:31,123,155,174,202
    for name in ["points", "plane", "plane_points", "axis_normal",
                 "axis_central"]:
        _check_method(bone_mod.AnatomicNeck, name, [])


def test_transepicondylar_surface():
    # epicondyle.py:29 (num_slices declared; unused in the reference body)
    _check_method(bone_mod.TransEpicondylar, "axis", [("num_slices", 50)])


# --- bone facades (reference bone.py) ------------------------------------
def test_bone_facade_surface():
    for cls in [shoulder_tpu.ProximalHumerus, shoulder_tpu.Humerus]:
        _check_method(cls, "apply_csys_canal_articular", [])
        _check_method(cls, "apply_csys_obb", [])
        _check_method(cls, "apply_csys_ct", [])
        _check_method(cls, "apply_csys_custom",
                      [("transform", E), ("from_ct", True)])
        _check_method(cls, "apply_translation", [("translation", E)])
        # metric callables (bound bone_props .calc in the reference)
        for m in ["side", "neckshaft", "radius_curvature"]:
            assert callable(inspect.getattr_static(cls, m)), m
    _check_method(shoulder_tpu.Humerus, "apply_csys_canal_transepiconylar",
                  [])
    assert callable(
        inspect.getattr_static(shoulder_tpu.Humerus, "retroversion")
    )
    # proximal variant must NOT expose the full-bone-only surface
    # (reference bone.py:24-105 vs 109-157)
    assert not hasattr(shoulder_tpu.ProximalHumerus, "retroversion")
    assert not hasattr(shoulder_tpu.ProximalHumerus,
                       "apply_csys_canal_transepiconylar")


def test_bone_instance_attributes(tmp_path):
    """Landmark/mesh attributes a reference user reaches on an instance
    (reference bone.py:25-51,109-133).  Construction is cheap (no landmark
    compute) so this audits the real wiring."""
    from shoulder_tpu.config import tiny_config
    from shoulder_tpu.io import stl
    from shoulder_tpu.io.testdata import synthetic_humerus

    rng = np.random.default_rng(0)
    v, f = synthetic_humerus(rng_transform=rng, n_rings=40, n_theta=32)
    p = tmp_path / "b.stl"
    stl.write_stl(p, v, f)
    hum = shoulder_tpu.Humerus(p, config=tiny_config())
    for attr in ["canal", "surgical_neck", "bicipital_groove",
                 "anatomic_neck", "trans_epiconylar", "mesh", "stl_file",
                 "transform"]:
        assert hasattr(hum, attr), attr
    assert np.asarray(hum.transform).shape == (4, 4)

    ph = shoulder_tpu.ProximalHumerus(p, config=tiny_config())
    assert not hasattr(ph, "trans_epiconylar")


# --- slice-set accessors (reference humerus/slice.py) ---------------------
def test_slice_set_surface():
    """The L3 accessor surface (reference slice.py:31-155).  Every member
    takes the fractional cutoff window; `slices` is the per-slice entry
    point (Path2D in the reference, per-slice point arrays here)."""
    from shoulder_tpu.slices import SliceSet

    for name in ["slices", "centroids", "areas1", "zs", "ixy",
                 "ixy_centered", "itr", "itr_centered", "itr_start",
                 "itr_centered_start", "itr_start_even_theta"]:
        _check_method(SliceSet, name, [("cutoff", E)])


def test_slice_set_slices_accessor(tiny_spec):
    """slices() returns one (N, 2) array per slice in the cutoff window,
    consistent with ixy()'s layout."""
    from shoulder_tpu import slices as slices_mod
    from shoulder_tpu.config import tiny_config

    ss = slices_mod.full_slices(tiny_spec, config=tiny_config())
    cut = (0.2, 0.8)
    per_slice = ss.slices(cut)
    ixy = ss.ixy(cut)
    assert len(per_slice) == ixy.shape[0]
    for i, p in enumerate(per_slice):
        assert p.shape == (ixy.shape[2], 2)
        assert np.allclose(p.T, ixy[i])


# --- surgical planning (reference arthroplasty.py) ------------------------
def test_osteotomy_surface():
    cls = shoulder_tpu.HumeralHeadOsteotomy
    for prop in ["plane", "neckshaft_rel", "retroversion_rel"]:
        _check_property(cls, prop)
    _check_method(cls, "points", [])
    _check_method(cls, "resect_mesh", [])
    _check_method(cls, "offset_retroversion", [("deg", E)])
    # published spelling (arthroplasty.py:106)
    _check_method(cls, "offest_neckshaft", [("deg", E)])
    _check_method(cls, "offset_depth", [("mm", E), ("direction", "canal")])
    _check_method(cls, "offset_anterior_posterior", [("mm", E)])
    _check_method(cls, "offset_medial_lateral", [("mm", E)])


# --- plotting / package API ----------------------------------------------
def test_plot_surface():
    sig = inspect.signature(shoulder_tpu.Plot.__init__)
    got = [(p.name, p.default) for p in sig.parameters.values()
           if p.name != "self"]
    assert got == [("obj2plot", E), ("opacity", 0.7)]


def test_package_exports():
    # reference __init__.py:1-5
    for name in ["Humerus", "ProximalHumerus", "Plot",
                 "HumeralHeadOsteotomy"]:
        assert hasattr(shoulder_tpu, name), name
    assert isinstance(shoulder_tpu.__version__, str)
