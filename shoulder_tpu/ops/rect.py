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
    """Representative point of each cut-off end cap: the mean of its arc
    points.

    The caps produced by end_slab_mask are hair-thin slivers — depth
    (1 - yscale)/2 * major_extent, ~0.03 mm at the reference's
    yscale=0.999 on a 65 mm distal slice — so the exact sliver-polygon
    centroid (what shapely's difference + .centroid gives the reference,
    epicondyle.py:56-81) and the arc-point mean agree to the sliver
    depth, far inside the 0.5 mm parity tolerance.

    An exact shoelace "arc + chord" centroid was tried and removed: a
    sliver's true area is comparable to the f32 cancellation noise of the
    cross products at bone-scale coordinates, so the centroid divides
    noise by noise — observed as ~2 mm batch-size-dependent wander of the
    transepicondylar endpoints on the reference fixtures.

    `ys` is unused (kept for call-site compatibility).

    Returns (centroids (max_runs,2), counts (max_runs,), valid (max_runs,)).
    """
    pts = jnp.asarray(pts)
    run_ok = run_id >= 0
    rid_pts = jnp.where(run_ok, run_id, max_runs)  # dropped slot
    counts = jnp.zeros(max_runs + 1, dtype=jnp.int32).at[rid_pts].add(
        jnp.where(run_ok, 1, 0)
    )
    sums = jnp.zeros((max_runs + 1, 2)).at[rid_pts].add(
        jnp.where(run_ok[:, None], pts, 0.0)
    )
    cent = sums / jnp.maximum(counts, 1)[:, None]
    valid = counts[:max_runs] > 0
    return cent[:max_runs], counts[:max_runs], valid
