"""Minimum rotated rectangle + polygon end-cutting (dense JAX).

Replaces the reference's shapely usage in the transepicondylar detector
(reference epicondyle.py:33-53, utils.py:36-133):
  * minimum_rotated_rectangle / major_axis_dist -> support-point calipers
  * rotate/scale/rotate-back + polygon difference "cut the ends off"
    -> point-in-slab masking along the major axis

The MRR is found with a two-stage dense angle sweep (period pi/2): 512
coarse angles, then 64 fine angles within one coarse step of the best.
Final angular resolution ~5e-5 rad, i.e. sub-micron extent error at bone
scale — far inside the 0.5 mm parity tolerance — with every step a dense
fixed-shape op that vmaps over slices and bones.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_N_DIRS = 512


class RotatedRect(NamedTuple):
    center: jnp.ndarray        # (2,)
    major_dir: jnp.ndarray     # (2,) unit vector along the long axis
    major_extent: jnp.ndarray  # ()
    minor_extent: jnp.ndarray  # ()


def _sweep(pts, mask, angs):
    """Rectangle stats over candidate angles; returns best (angle index
    data): (area, du, dv, pu_mid, pv_mid) arrays over angles."""
    u = jnp.stack([jnp.cos(angs), jnp.sin(angs)], axis=1)   # (D,2)
    v = jnp.stack([-u[:, 1], u[:, 0]], axis=1)
    pu = pts @ u.T                                           # (N,D)
    pv = pts @ v.T
    pu_max = jnp.max(jnp.where(mask[:, None], pu, -jnp.inf), axis=0)
    pu_min = jnp.min(jnp.where(mask[:, None], pu, jnp.inf), axis=0)
    pv_max = jnp.max(jnp.where(mask[:, None], pv, -jnp.inf), axis=0)
    pv_min = jnp.min(jnp.where(mask[:, None], pv, jnp.inf), axis=0)
    du = pu_max - pu_min
    dv = pv_max - pv_min
    return du * dv, du, dv, 0.5 * (pu_max + pu_min), 0.5 * (pv_max + pv_min)


def min_rotated_rect(pts, mask=None) -> RotatedRect:
    """Minimum-area rotated rectangle of a 2D point set (masked)."""
    pts = jnp.asarray(pts)
    if mask is None:
        mask = jnp.ones(pts.shape[0], dtype=bool)

    half_pi = jnp.pi / 2.0
    coarse = jnp.linspace(0.0, half_pi, _N_DIRS, endpoint=False)
    area_c, *_ = _sweep(pts, mask, coarse)
    k = jnp.argmin(area_c)
    step = half_pi / _N_DIRS

    fine = coarse[k] + jnp.linspace(-step, step, 64)
    area_f, du, dv, pum, pvm = _sweep(pts, mask, fine)
    j = jnp.argmin(area_f)

    ang = fine[j]
    uk = jnp.stack([jnp.cos(ang), jnp.sin(ang)])
    vk = jnp.stack([-uk[1], uk[0]])
    duk, dvk = du[j], dv[j]
    center = pum[j] * uk + pvm[j] * vk
    major_is_u = duk >= dvk
    major_dir = jnp.where(major_is_u, uk, vk)
    major_extent = jnp.where(major_is_u, duk, dvk)
    minor_extent = jnp.where(major_is_u, dvk, duk)
    return RotatedRect(center, major_dir, major_extent, minor_extent)


def end_slab_mask(pts, rect: RotatedRect, yscale: float, mask=None):
    """Points beyond the slightly-shrunk rectangle ends along the major axis.

    Implements the reference's rotate/scale(yfact=0.999)/difference sequence
    (epicondyle.py:49-53) as a slab test: |major coord - center| exceeds
    yscale * major_extent / 2.
    """
    pts = jnp.asarray(pts)
    if mask is None:
        mask = jnp.ones(pts.shape[0], dtype=bool)
    y = (pts - rect.center) @ rect.major_dir
    out = jnp.abs(y) > yscale * rect.major_extent / 2.0
    return out & mask, y


def cyclic_runs(mask, max_runs: int):
    """Label contiguous cyclic runs of True in a boolean ring.

    Returns (run_id (N,) int32 in [0, max_runs), -1 where False).  Runs are
    found by rolling the ring so a False element (if any) sits at index 0.
    """
    mask = jnp.asarray(mask)
    n = mask.shape[0]
    # roll so index 0 is False (if the ring is not all-True)
    first_false = jnp.argmin(mask)  # 0 if all True
    idx = (jnp.arange(n) + first_false) % n
    m = mask[idx]
    starts = m & ~jnp.roll(m, 1)
    starts = starts.at[0].set(m[0])
    rid = jnp.cumsum(starts) - 1
    rid = jnp.where(m, jnp.minimum(rid, max_runs - 1), -1)
    # scatter back to original positions
    out = jnp.zeros(n, dtype=jnp.int32).at[idx].set(rid.astype(jnp.int32))
    return out


def run_chord_centroids(pts, run_id, ys, max_runs: int):
    """Area centroid of each cut-off end cap.

    Each cap is the polygon bounded by a contiguous contour arc plus the
    straight chord closing it (the rectangle's shrunk end edge cuts the
    polygon with a single line, so arc + chord is exact).  Uses the shoelace
    centroid over the arc segments plus the chord segment.

    Returns (centroids (max_runs,2), counts (max_runs,), valid (max_runs,)).
    """
    pts = jnp.asarray(pts)
    n = pts.shape[0]
    nxt = jnp.roll(jnp.arange(n), -1)
    run_ok = run_id >= 0
    # a segment belongs to a cap when both endpoints are in the same run
    seg_same = run_ok & (run_id == run_id[nxt])
    rid = jnp.where(seg_same, run_id, max_runs)  # dropped slot

    p0 = pts
    p1 = pts[nxt]
    cr = p0[:, 0] * p1[:, 1] - p1[:, 0] * p0[:, 1]
    z = jnp.zeros(max_runs + 1)
    a2 = z.at[rid].add(jnp.where(seg_same, cr, 0.0))
    cx = z.at[rid].add(jnp.where(seg_same, (p0[:, 0] + p1[:, 0]) * cr, 0.0))
    cy = z.at[rid].add(jnp.where(seg_same, (p0[:, 1] + p1[:, 1]) * cr, 0.0))

    # chord: from the arc's last point back to its first
    rid_pts = jnp.where(run_ok, run_id, max_runs)
    is_first = run_ok & (run_id != jnp.roll(run_id, 1))
    is_last = run_ok & (run_id != run_id[nxt])
    firsts = jnp.zeros((max_runs + 1, 2)).at[
        jnp.where(is_first, rid_pts, max_runs)
    ].add(jnp.where(is_first[:, None], pts, 0.0))
    lasts = jnp.zeros((max_runs + 1, 2)).at[
        jnp.where(is_last, rid_pts, max_runs)
    ].add(jnp.where(is_last[:, None], pts, 0.0))
    q0, q1 = lasts, firsts
    crc = q0[:, 0] * q1[:, 1] - q1[:, 0] * q0[:, 1]
    a2 = a2 + crc
    cx = cx + (q0[:, 0] + q1[:, 0]) * crc
    cy = cy + (q0[:, 1] + q1[:, 1]) * crc

    counts = jnp.zeros(max_runs + 1, dtype=jnp.int32).at[rid_pts].add(
        jnp.where(run_ok, 1, 0)
    )
    area = 0.5 * a2
    denom = jnp.where(jnp.abs(area) > 1e-9, 6.0 * area, 1.0)
    cent = jnp.stack([cx, cy], axis=1) / denom[:, None]
    # degenerate caps (tiny area): fall back to the mean of arc points
    mean_pts = jnp.zeros((max_runs + 1, 2)).at[rid_pts].add(
        jnp.where(run_ok[:, None], pts, 0.0)
    ) / jnp.maximum(counts, 1)[:, None]
    use_mean = (jnp.abs(area) <= 1e-9)[:, None]
    cent = jnp.where(use_mean, mean_pts, cent)
    valid = counts[:max_runs] > 0
    return cent[:max_runs], counts[:max_runs], valid
