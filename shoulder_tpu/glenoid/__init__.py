"""Scapula/glenoid support (reserved).

Mirrors the reference's placeholder package (reference
src/shoulder/glenoid/__init__.py, README.md:6): the framework currently
implements the humerus; the glenoid pipeline (scapula ingest, glenoid-face
detection, version/inclination metrics) lands here.  The geometry core
(shoulder_tpu.ops) is bone-agnostic by design: slicing, MRR, fits and ray
casts take any watertight mesh.
"""
