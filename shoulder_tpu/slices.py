"""Slice-set facade: the reference's L3 public accessors.

The reference exposes its slicing engine's per-slice data through accessor
methods with a fractional cutoff window (reference slice.py:31-155:
slices/centroids/areas1/ixy/ixy_centered/itr_centered/itr_start/
itr_centered_start/zs).  This facade reproduces that surface on top of the
batched contour-stack kernel, including the reference's array layout
((S, 2, N): row 0 = x|theta, row 1 = y|r) and its quirks (documented in
PARITY.md: `itr` returns cartesian, `itr_start_even_theta` returns
`itr_start` — preserved verbatim, reference slice.py:100,121-122).
"""

from __future__ import annotations

import numpy as np

from shoulder_tpu.config import DEFAULT_CONFIG, PipelineConfig, SliceSetConfig


def _cutoff_idx(n: int, cutoff) -> tuple:
    """Reference Slices._cutoff (slice.py:157-164)."""
    return int((1 - cutoff[1]) * n), int((1 - cutoff[0]) * n)


class SliceSet:
    """Computed cross-section family of one bone in the OBB frame."""

    def __init__(self, spec, family: SliceSetConfig, z_top: float,
                 z_bottom: float, config: PipelineConfig = DEFAULT_CONFIG):
        self._spec = spec
        self._family = family
        self._z_top = z_top
        self._z_bottom = z_bottom
        self._cfg = config
        self._stack = None
        self._interp_num = family.interp_num

    def _compute(self):
        if self._stack is None:
            import jax.numpy as jnp

            from shoulder_tpu.ops import slicing

            zs = np.linspace(self._z_top, self._z_bottom,
                             self._family.zslice_num).astype(np.float32)
            verts_obb = jnp.asarray(self._spec.vertices) @ jnp.asarray(
                self._spec.obb_transform[:3, :3].T, jnp.float32
            ) + jnp.asarray(self._spec.obb_transform[:3, 3], jnp.float32)
            faces = jnp.asarray(self._spec.faces)
            neighbors = jnp.asarray(self._spec.neighbors)
            sg = None
            if self._spec.face_orig is not None:
                # ingest pre-sorts faces; keep loop starts on original ids
                sg = slicing.sorted_geom(
                    verts_obb, faces, neighbors,
                    face_orig=jnp.asarray(self._spec.face_orig),
                )
            st = slicing.slice_stack(
                verts_obb,
                faces,
                neighbors,
                jnp.asarray(zs),
                self._family.interp_num,
                self._cfg.max_chain,
                50,
                self._family.band,
                sg=sg,
                group=self._family.group,
                slab=self._family.slab,
                compact_k=self._cfg.slice_compact_k,
            )
            self._stack = {
                "contours": np.asarray(st.contours, np.float64),
                "centroids": np.asarray(st.centroids, np.float64),
                "areas": np.asarray(st.areas, np.float64),
                "zs": np.asarray(st.zs, np.float64),
            }
        return self._stack

    def _cut(self, arr, cutoff):
        s, e = _cutoff_idx(arr.shape[0], cutoff)
        return arr[s:e]

    # ------------------------------------------------ reference accessors
    def zs(self, cutoff) -> np.ndarray:
        return self._cut(self._compute()["zs"], cutoff)

    def areas1(self, cutoff) -> np.ndarray:
        """Largest-polygon area per slice (reference slice.py:49-63)."""
        return self._cut(self._compute()["areas"], cutoff)

    def centroids(self, cutoff) -> np.ndarray:
        return self._cut(self._compute()["centroids"], cutoff)

    def ixy(self, cutoff) -> np.ndarray:
        """(S, 2, N) resampled contours (reference slice.py:65-83)."""
        c = self._cut(self._compute()["contours"], cutoff)
        return np.transpose(c, (0, 2, 1))

    def ixy_centered(self, cutoff) -> np.ndarray:
        c = self._cut(self._compute()["contours"], cutoff)
        cen = self._cut(self._compute()["centroids"], cutoff)
        return np.transpose(c - cen[:, None, :], (0, 2, 1))

    def _pol(self, xy_s2n, sort: bool, roll_min: bool) -> np.ndarray:
        theta = np.arctan2(xy_s2n[:, 1], xy_s2n[:, 0])   # (S, N)
        r = np.hypot(xy_s2n[:, 0], xy_s2n[:, 1])
        if sort:
            order = np.argsort(theta, axis=1)
            theta = np.take_along_axis(theta, order, axis=1)
            r = np.take_along_axis(r, order, axis=1)
        elif roll_min:
            # roll each row so its min-theta sample leads: a gather at
            # (argmin + j) % N per row — vectorized over all slices
            n = theta.shape[1]
            k = np.argmin(theta, axis=1)[:, None]
            idx = (k + np.arange(n)[None, :]) % n
            theta = np.take_along_axis(theta, idx, axis=1)
            r = np.take_along_axis(r, idx, axis=1)
        return np.stack([theta, r], axis=1)

    def slices(self, cutoff) -> list:
        """Per-slice cross-section point arrays, one (N, 2) array per slice
        (reference slice.py:31-32 returns trimesh Path2D objects; the
        resampled largest-loop point list is the array-native analog)."""
        c = self._cut(self._compute()["contours"], cutoff)
        return [np.asarray(p) for p in c]

    def itr(self, cutoff) -> np.ndarray:
        """Quirk preserved: the reference's itr() returns CARTESIAN data
        (reference slice.py:99-100)."""
        return self.ixy(cutoff)

    def itr_centered(self, cutoff) -> np.ndarray:
        return self._pol(self.ixy_centered(cutoff), sort=True, roll_min=False)

    def itr_start(self, cutoff) -> np.ndarray:
        return self._pol(self.ixy(cutoff), sort=False, roll_min=True)

    def itr_centered_start(self, cutoff) -> np.ndarray:
        return self._pol(self.ixy_centered(cutoff), sort=False, roll_min=True)

    def itr_start_even_theta(self, cutoff) -> np.ndarray:
        """Quirk preserved: returns itr_start (reference slice.py:113-122)."""
        return self.itr_start(cutoff)


def full_slices(spec, config: PipelineConfig = DEFAULT_CONFIG) -> SliceSet:
    z_min, z_max = spec.z_bounds
    return SliceSet(spec, config.full, config.z_inset * z_max,
                    config.z_inset * z_min, config)


def distal_slices(spec, config: PipelineConfig = DEFAULT_CONFIG) -> SliceSet:
    z_min, _ = spec.z_bounds
    return SliceSet(spec, config.distal, config.z_inset * z_min, 0.0, config)


def proximal_slices(spec, neck_z: float,
                    config: PipelineConfig = DEFAULT_CONFIG) -> SliceSet:
    _, z_max = spec.z_bounds
    return SliceSet(spec, config.proximal, config.z_inset * z_max, neck_z,
                    config)
