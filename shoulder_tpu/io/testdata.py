"""Procedural synthetic humerus meshes.

Generates watertight, humerus-like generalized cylinders so the full
pipeline (and CI) runs without any external STL fixtures.  The shape models
the anatomy the landmark detectors key on: a long shaft, an offset spherical
head tilted by (inclination, retroversion), a bicipital groove notch, and
flared epicondyles distally.
"""

from __future__ import annotations

import numpy as np


def _smoothstep(x, lo, hi):
    t = np.clip((x - lo) / (hi - lo), 0.0, 1.0)
    return t * t * (3 - 2 * t)


def synthetic_humerus(
    length: float = 300.0,
    shaft_radius: float = 11.0,
    head_radius: float = 24.0,
    neck_shaft_deg: float = 135.0,
    retroversion_deg: float = 25.0,
    groove_theta_deg: float = 80.0,
    groove_depth: float = 2.5,
    groove_width_deg: float = 14.0,
    epicondyle_half_width: float = 30.0,
    metaphysis_scale: float = 0.72,   # tuberosity flare as head_radius frac
    n_rings: int = 160,
    n_theta: int = 128,
    side: str = "left",
    rng_transform: np.random.Generator | None = None,
    proximal_only: bool = False,
    # arthritic deformations (BASELINE config 4 stress case)
    head_flattening: float = 0.0,     # 0..~0.3: flattens the articular dome
    osteophyte_amp: float = 0.0,      # mm: marginal osteophyte ridge height
    surface_noise: float = 0.0,       # mm: rough cartilage loss
    return_head_label: bool = False,
):
    """Returns (vertices (V,3), faces (F,3)) of a watertight synthetic bone.

    Canonical build frame: z in [0, length], head at high z.  If
    `rng_transform` is given, a random rigid transform is applied to mimic an
    arbitrary CT frame.

    With `return_head_label`, also returns a per-vertex bool marking
    vertices whose radius was set by the articular head branch — exact
    generative supervision for the articular-surface segmenter (labels
    survive the arthritic deformations: a flattened dome is still
    articular, which is precisely where a fit-residual label would lie).
    """
    z0 = 0.55 * length if proximal_only else 0.0
    zs = np.linspace(z0, length, n_rings)
    thetas = np.linspace(-np.pi, np.pi, n_theta, endpoint=False)
    tt, zz = np.meshgrid(thetas, zs)

    # head center: inclined + retroverted offset from the canal axis
    incl = np.deg2rad(180.0 - neck_shaft_deg)
    retro = np.deg2rad(retroversion_deg)
    sign = 1.0 if side == "left" else -1.0
    head_c = np.array(
        [
            head_radius * 0.55 * np.sin(incl) * np.cos(sign * (np.pi / 2 + retro)),
            head_radius * 0.55 * np.sin(incl) * np.sin(sign * (np.pi / 2 + retro)),
            length - head_radius * 0.80,
        ]
    )

    # radius field r(z, theta)
    r = np.full_like(tt, shaft_radius)

    # distal flare (epicondyles): ellipse in x
    flare = 1.0 - _smoothstep(zz, 0.02 * length, 0.18 * length)
    ex = shaft_radius + (epicondyle_half_width - shaft_radius) * flare
    ey = shaft_radius * (1.0 + 0.3 * flare)
    r_dist = (ex * ey) / np.sqrt(
        (ey * np.cos(tt)) ** 2 + (ex * np.sin(tt)) ** 2
    )
    r = np.maximum(r, r_dist)

    # metaphysis: smooth flare from the shaft toward the tuberosity region
    # below the head.  Without it the slice-area curve jumps straight from
    # shaft to dome and the surgical-neck changepoint lands inside the head
    # (~0.89L instead of the anatomical ~0.75-0.80L), which makes the
    # proximal polar window dome-only — unlike any real humerus.
    if metaphysis_scale > 0:
        meta_frac = _smoothstep(zz, 0.60 * length, 0.74 * length) * (
            1.0 - _smoothstep(zz, 0.86 * length, 0.95 * length)
        )
        r_meta = shaft_radius + (
            metaphysis_scale * head_radius - shaft_radius
        ) * meta_frac
        r = np.maximum(r, r_meta)

    # proximal head: per (z, theta) ray from the canal axis, the surface of a
    # sphere |p - head_c| = head_radius seen from the axis point (0,0,z)
    dz = zz - head_c[2]
    under = head_radius**2 - dz**2
    ux, uy = np.cos(tt), np.sin(tt)
    b = ux * head_c[0] + uy * head_c[1]  # projection of center on ray
    c = head_c[0] ** 2 + head_c[1] ** 2 - under
    disc = b**2 - c
    hit = disc > 0
    # keep misses finite (0) so the blend multiply never forms -inf * 0
    r_head = np.where(hit, b + np.sqrt(np.maximum(disc, 0.0)), 0.0)
    blend = _smoothstep(zz, 0.70 * length, 0.78 * length)
    head_wins = hit & (r_head * blend > r)
    r = np.where(head_wins, r_head * blend, r)
    r = np.maximum(r, shaft_radius * (1.0 - 0.35 * _smoothstep(zz, 0.9 * length, length)))

    # arthritic deformations
    if head_flattening > 0:
        # flatten the superior articular dome toward a plane
        head_zone = _smoothstep(zz, 0.78 * length, 0.9 * length)
        flat_dir = np.cos(tt - np.deg2rad(groove_theta_deg + 150.0))
        r = r - head_flattening * r * head_zone * np.clip(flat_dir, 0, 1) ** 2
    if osteophyte_amp > 0:
        # marginal osteophyte ridge near the anatomic neck
        ridge = np.exp(-0.5 * ((zz - 0.76 * length) / (0.02 * length)) ** 2)
        r = r + osteophyte_amp * ridge * (0.6 + 0.4 * np.cos(3 * tt))
    if surface_noise > 0:
        rng_n = np.random.default_rng(12345)
        bumps = rng_n.normal(0, surface_noise, tt.shape)
        # keep it smooth-ish: average neighbors along theta
        bumps = (bumps + np.roll(bumps, 1, 1) + np.roll(bumps, -1, 1)) / 3.0
        r = r + bumps * _smoothstep(zz, 0.7 * length, 0.8 * length)

    # bicipital groove: radial notch on the proximal third
    gth = np.deg2rad(groove_theta_deg) * sign
    dth = np.arctan2(np.sin(tt - gth), np.cos(tt - gth))
    gw = np.deg2rad(groove_width_deg)
    gmask = _smoothstep(zz, 0.68 * length, 0.74 * length) * (
        1.0 - _smoothstep(zz, 0.93 * length, 0.97 * length)
    )
    notch = groove_depth * np.exp(-0.5 * (dth / (gw / 2.35)) ** 2) * gmask
    r = r - notch

    # ring vertices
    vx = r * np.cos(tt)
    vy = r * np.sin(tt)
    verts = np.stack([vx, vy, zz], axis=-1).reshape(-1, 3)

    # caps
    bot_c = len(verts)
    top_c = len(verts) + 1
    verts = np.vstack(
        [verts, [[0.0, 0.0, z0 - 2.0]], [[0.0, 0.0, length + 2.0]]]
    )

    faces = []
    for i in range(n_rings - 1):
        for j in range(n_theta):
            a = i * n_theta + j
            b_ = i * n_theta + (j + 1) % n_theta
            c_ = (i + 1) * n_theta + j
            d = (i + 1) * n_theta + (j + 1) % n_theta
            faces.append([a, b_, c_])
            faces.append([b_, d, c_])
    for j in range(n_theta):
        faces.append([bot_c, (j + 1) % n_theta, j])
        base = (n_rings - 1) * n_theta
        faces.append([top_c, base + j, base + (j + 1) % n_theta])
    faces = np.asarray(faces, dtype=np.int64)

    if rng_transform is not None:
        q = rng_transform.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        rot = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        t = rng_transform.uniform(-100, 100, size=3)
        verts = verts @ rot.T + t

    if return_head_label:
        label = np.concatenate(
            [head_wins.reshape(-1), [False, False]]  # the two cap apexes
        )
        return verts, faces, label
    return verts, faces
