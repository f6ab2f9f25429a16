"""ctypes bindings for the native ingest kernel (csrc/ingest.cpp).

Loads shoulder_tpu/io/_native/libshoulder_ingest.so, auto-building it with
the local C++ toolchain on first use when absent (same command as
tools/build_native.sh); io/stl.py's numpy path is the fallback and the
semantic oracle — both produce bit-identical vertex ordering.
"""

from __future__ import annotations

import ctypes
import shutil
import subprocess
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "_native" / "libshoulder_ingest.so"
_SRC_PATH = Path(__file__).parents[2] / "csrc" / "ingest.cpp"
_lib = None
_build_attempted = False


def available() -> bool:
    return _load() is not None


def _try_build() -> None:
    """One-shot lazy build: the .so is a derived artifact (not in the
    repo); any host with g++ can produce it in ~2 s.  Failure of any kind
    just leaves the numpy fallback active."""
    global _build_attempted
    if _build_attempted or _LIB_PATH.exists():
        return
    _build_attempted = True
    gxx = shutil.which("g++")
    if gxx is None or not _SRC_PATH.exists():
        return
    try:
        _LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
        # -march=native + omp-simd vectorize the OBB min/max-reduction
        # loops (value-exact under reorder); -ffp-contract=off pins every
        # scalar expression to the unvectorized build's rounding (no FMA)
        # so oracle/golden comparisons cannot drift.  If the host rejects
        # -march=native the plain-flag retry below still produces the lib.
        args = [gxx, "-O3", "-march=native", "-fopenmp-simd",
                "-ffp-contract=off", "-shared", "-fPIC", "-std=c++17",
                str(_SRC_PATH), str(_SRC_PATH.parent / "obb.cpp"),
                "-o", str(_LIB_PATH)]
        try:
            subprocess.run(args, check=True, capture_output=True,
                           timeout=120)
        except subprocess.CalledProcessError:
            plain = [a for a in args
                     if a not in ("-march=native", "-fopenmp-simd",
                                  "-ffp-contract=off")]
            subprocess.run(plain, check=True, capture_output=True,
                           timeout=120)
    except Exception:  # toolchain quirk -> numpy fallback
        if _LIB_PATH.exists():
            _LIB_PATH.unlink()


def _load():
    global _lib
    if _lib is None and not _LIB_PATH.exists():
        _try_build()
    if _lib is None and _LIB_PATH.exists():
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.shoulder_ingest_stl.restype = ctypes.c_int
        lib.shoulder_ingest_stl.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    return _lib


def load_indexed(path, max_verts: int = 262144, max_faces: int = 524288):
    """Native STL -> (vertices, faces, neighbors, watertight).

    Raises RuntimeError when the library is unavailable or the mesh exceeds
    the caps; callers fall back to the numpy path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library not built")
    data = Path(path).read_bytes()
    if data[:5].lower() == b"solid":
        import struct

        if len(data) < 84:
            raise RuntimeError("ascii stl: use numpy path")
        (n_tri,) = struct.unpack_from("<I", data, 80)
        if 84 + n_tri * 50 != len(data):
            raise RuntimeError("ascii stl: use numpy path")

    verts = np.empty((max_verts, 3), np.float32)
    faces = np.empty((max_faces, 3), np.int32)
    neighbors = np.empty((max_faces, 3), np.int32)
    counts = np.zeros(3, np.int32)
    rc = lib.shoulder_ingest_stl(
        data, len(data),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_verts,
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        neighbors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_faces,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"native ingest failed with code {rc}")
    nv, nf, wt = int(counts[0]), int(counts[1]), bool(counts[2])
    return (
        verts[:nv].astype(np.float64),
        faces[:nf].astype(np.int64),
        neighbors[:nf].astype(np.int64),
        wt,
    )
