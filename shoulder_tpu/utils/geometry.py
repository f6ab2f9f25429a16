"""Rigid-transform and coordinate-system math (JAX).

Functionally mirrors the semantics of the reference utils
(reference src/shoulder/utils.py:172-339) but is written as pure jnp ops so
every function jits, vmaps and differentiates.  All functions accept either
numpy or jax arrays and return jax arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def transform_pts(pts, transform):
    """Apply a 4x4 homogeneous transform to (N,3) points.

    Semantics of reference utils.transform_pts (utils.py:172-188).
    """
    pts = jnp.asarray(pts)
    transform = jnp.asarray(transform)
    return pts @ transform[:3, :3].T + transform[:3, 3]


def transform_vecs(vecs, transform):
    """Rotate (N,3) direction vectors by the rotation part of a transform."""
    vecs = jnp.asarray(vecs)
    return vecs @ jnp.asarray(transform)[:3, :3].T


def inv_transform(transform):
    """Invert a rigid 4x4 transform as R^-1 @ T^-1.

    Semantics of reference utils.inv_transform (utils.py:227-256).  Note the
    reference decomposes into rotation/translation and inverts each with a
    general matrix inverse; for rigid transforms that equals the closed form
    [R^T, -R^T t].
    """
    transform = jnp.asarray(transform)
    rot_inv = jnp.linalg.inv(transform[:3, :3])
    t = transform[:3, 3]
    top = jnp.concatenate([rot_inv, (-rot_inv @ t)[:, None]], axis=1)
    return jnp.concatenate(
        [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)], axis=0
    )


def translate_transform(translation):
    """4x4 transform from a 3-vector translation (reference utils.py:259-264)."""
    translation = jnp.asarray(translation).reshape(3)
    eye = jnp.eye(4, dtype=translation.dtype)
    return eye.at[:3, 3].set(translation)


def unit_vector(p1, p2):
    """Unit vector p1 - p2 (reference utils.py:267-271)."""
    vec = jnp.asarray(p1) - jnp.asarray(p2)
    return vec / jnp.linalg.norm(vec)


def construct_csys(vec_z, vec_y):
    """Build the CT->csys transform from two 2x3 point-pair axes.

    Exact semantics of reference utils.construct_csys (utils.py:289-318):
    z from vec_z endpoints, a provisional x from vec_y endpoints,
    y = x × z, then re-orthogonalized x = y × z, reflection fixed by negating
    x when det == -1, and the assembled csys->CT frame inverted to CT->csys.
    """
    vec_z = jnp.asarray(vec_z)
    vec_y = jnp.asarray(vec_y)
    pos = jnp.mean(vec_z, axis=0)
    z_hat = unit_vector(vec_z[0], vec_z[1])
    x_hat = unit_vector(vec_y[0], vec_y[1])

    y_hat = jnp.cross(x_hat, z_hat)
    y_hat = y_hat / jnp.linalg.norm(y_hat)

    # the second axis is generally not exactly orthogonal; re-orthogonalize
    x_hat = jnp.cross(y_hat, z_hat)
    x_hat = x_hat / jnp.linalg.norm(x_hat)

    transform = jnp.concatenate(
        [jnp.stack([x_hat, y_hat, z_hat, pos], axis=1),
         jnp.array([[0.0, 0.0, 0.0, 1.0]])],
        axis=0,
    )
    # undo reflections by flipping the dependent axis
    det = jnp.linalg.det(transform)
    flip = jnp.where(jnp.round(det) == -1.0, -1.0, 1.0)
    transform = transform.at[:, 0].multiply(flip)
    return inv_transform(transform)


def unitxyz_to_spherical(xyz):
    """[r, theta_deg, phi_deg] of a vector (reference utils.py:321-330).

    theta is the azimuth in the xy plane (retroversion), phi the polar angle
    from +z (neck-shaft).
    """
    xyz = jnp.asarray(xyz)
    r = jnp.sqrt(jnp.sum(xyz**2))
    theta = jnp.arctan2(xyz[1], xyz[0])
    phi = jnp.arccos(xyz[2] / r)
    return jnp.array([r, jnp.rad2deg(theta), jnp.rad2deg(phi)])


def spherical_to_unitxyz(sphr):
    """Inverse of unitxyz_to_spherical (reference utils.py:333-339)."""
    sphr = jnp.asarray(sphr)
    theta = jnp.deg2rad(sphr[1])
    phi = jnp.deg2rad(sphr[2])
    return jnp.array(
        [
            sphr[0] * jnp.sin(phi) * jnp.cos(theta),
            sphr[0] * jnp.sin(phi) * jnp.sin(theta),
            sphr[0] * jnp.cos(phi),
        ]
    )


def plane_transform(origin, normal):
    """4x4 transform carrying points on the plane (origin, normal) to z=0.

    Equivalent of trimesh.geometry.plane_transform as used by the reference
    anatomic-neck ellipse recentering (anatomic_neck.py:139).
    """
    origin = jnp.asarray(origin, dtype=jnp.float64 if jnp.asarray(origin).dtype == jnp.float64 else jnp.float32)
    normal = jnp.asarray(normal)
    normal = normal / jnp.linalg.norm(normal)
    # build an orthonormal basis with `normal` as z: pick the unit axis least
    # aligned with the normal as a helper
    helper = jnp.eye(3)[jnp.argmin(jnp.abs(normal))]
    x = jnp.cross(helper, normal)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(normal, x)
    rot = jnp.stack([x, y, normal], axis=0)  # world -> plane rotation
    t = -rot @ origin
    top = jnp.concatenate([rot, t[:, None]], axis=1)
    return jnp.concatenate(
        [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)], axis=0
    )


def transform_plane(point, normal, transform):
    """Transform a plane given as (point, normal) by a rigid 4x4 transform.

    Semantics of reference utils.transform_plane (utils.py:191-206).
    Returns (point, normal).
    """
    transform = jnp.asarray(transform)
    point = transform_pts(jnp.asarray(point).reshape(1, 3), transform)[0]
    normal = transform[:3, :3] @ jnp.asarray(normal).reshape(3)
    return point, normal
