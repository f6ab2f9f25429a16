"""Articular-surface segmentation over the 512x512 polar-radius image.

The reference segments the humeral-head articular surface with an ONNX
UNet-CRF over a polar radius image (reference anatomic_neck.py:62-85).  The
UNet weights are absent from the reference snapshot (SURVEY.md §2.2), so
this module provides:

  * `sphere_segment` — a classical, TPU-friendly robust-sphere segmenter:
    the humeral head is near-spherical (the same assumption behind the
    reference's radius-of-curvature metric, bone_props.py:118-148), so the
    articular surface is the set of surface points within a tolerance of a
    robustly-fit sphere.  Iteratively-reweighted algebraic sphere fits ->
    pure jnp.linalg, vmappable.
  * the Flax UNet lives in shoulder_tpu.models.unet and can be swapped in
    via PipelineConfig once trained (shoulder_tpu/models/unet.py).

Both produce a float mask (rows, cols) in {0,1} with the reference's
mask>0 convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _longest_cyclic_run_per_row(mask):
    """Keep only the longest contiguous cyclic run of True in each row.

    Gather-free formulation (the one-gather-one-scatter-per-row original
    cost ~78 ms per call at batch 8 on v5e — 2x of it dominated the whole
    articular stage): each position's run is described by the nearest
    False on either side, both computed with directional cumulative
    extrema — pure elementwise math plus log-depth scans on the lane
    axis.  The winning run maximizes (length, -cyclic start order), the
    same run the rolled run-id/argmax formulation selected: ties break
    toward the run encountered first when scanning from the first False
    (cyclically), and a wrapped run starts at its tail segment's start.
    """
    n = mask.shape[-1]
    m = mask
    i = jnp.arange(n)
    neg = jnp.where(~m, i, -1)
    prev_false = jax.lax.cummax(neg, axis=m.ndim - 1)           # -1 if none
    pos = jnp.where(~m, i, n)
    next_false = jax.lax.cummin(pos, axis=m.ndim - 1,
                                reverse=True)                    # n if none
    runlen = next_false - prev_false - 1                         # valid at m
    # cyclic wrap: when both ends are True, the first and last linear runs
    # are one run (head length + tail length); its start is the tail's
    first_false = jnp.min(pos, axis=-1, keepdims=True)           # n if all T
    last_false = jnp.max(neg, axis=-1, keepdims=True)            # -1 if none
    has_false = first_false < n
    wrap = has_false & m[..., :1] & m[..., -1:]
    head_len = first_false
    tail_len = n - 1 - last_false
    wrap_len = head_len + tail_len
    in_head = m & (i < first_false)
    in_tail = m & (i > last_false)
    in_wrap = wrap & (in_head | in_tail)
    runlen = jnp.where(in_wrap, wrap_len, runlen)
    start = jnp.where(in_wrap, last_false + 1, prev_false + 1)
    # cyclic order of the run start, counted from the first False: the
    # rolled formulation enumerates runs in this order and argmax takes
    # the first max, so ties prefer the smallest cyclic start
    start_cyc = jnp.where(has_false, (start - first_false) % n, 0)
    key = jnp.where(m, runlen * (n + 1) + (n - start_cyc), -1)
    best = jnp.max(key, axis=-1, keepdims=True)
    return m & (key == best) & (best >= 0)


def sphere_segment(
    points,
    iters: int = 12,
    tol_mm: float = 2.0,
    init_top_rows: float = 0.3,
    init_mask=None,
    support_mask=None,
    support_tol_factor: float = 3.0,
    support_min_disagree: float = 0.05,
):
    """Segment the articular surface by robust sphere consensus.

    Args:
      points: (R, C, 3) surface points in the OBB frame; row 0 is the most
        proximal slice (top of the head).
      iters: IRLS iterations.
      tol_mm: inlier tolerance in mm.
      init_top_rows: initial inlier band as a fraction of rows from the top
        (the top of the head is articular by construction).
      init_mask: optional (R, C) {0,1} initial inlier set overriding the
        top-rows heuristic.  The UNet segmenter path passes its predicted
        mask here: the CNN provides the unary proposal and this consensus
        pass is the geometric-consistency refinement (the analog of the
        reference's CRF stage, anatomic_neck.py:62 "unetcrf").
      support_mask: optional (R, C) {0,1} CNN evidence that participates in
        the FINAL mask, not just the seed: points the CNN marks articular
        stay in the mask up to ``support_tol_factor * tol_mm`` from the
        consensus sphere.  This un-tethers the articular boundary from the
        strict sphere-inlier family — flattened or eroded domes (real
        arthritic anatomy, the case the reference's arthritic-tuned CNN
        handled, anatomic_neck.py:61-76) deviate several mm from the best
        sphere, and without support they would be clipped out.  The bound
        keeps CNN false positives from leaking down the shaft (those sit
        far outside any head-sized sphere).
      support_tol_factor: residual bound multiplier for supported points.
      support_min_disagree: the support term engages only when the CNN
        PERSISTENTLY disagrees with the strict consensus — i.e. the
        fraction of CNN-articular pixels outside the strict inlier set
        exceeds this threshold.  On healthy heads the CNN and the sphere
        agree to ~1%, so the gate stays off and the output is
        bit-identical to the plain consensus (golden stability); a
        flattened dome produces a large coherent disagreement sector and
        turns the support on.

    Returns (mask (R, C) float {0,1}, radius, center, mean_resid).
    mean_resid is measured over the final mask — widened masks on deformed
    heads legitimately raise it, which is the QC signal's purpose.
    """
    r, c = points.shape[0], points.shape[1]
    pts = points.reshape(-1, 3)
    if init_mask is None:
        row_of = jnp.repeat(jnp.arange(r), c)
        w = (row_of < int(init_top_rows * r)).astype(pts.dtype)
    else:
        w = init_mask.reshape(-1).astype(pts.dtype)
        # a near-empty proposal can't seed a fit; fall back to the heuristic
        row_of = jnp.repeat(jnp.arange(r), c)
        w_heur = (row_of < int(init_top_rows * r)).astype(pts.dtype)
        w = jnp.where(jnp.sum(w) < 32, w_heur, w)

    def fit(w):
        # mean-center for f32 conditioning (see fits.fit_sphere)
        mean = jnp.sum(pts * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1)
        q = pts - mean
        a = jnp.concatenate(
            [2.0 * q, jnp.ones((q.shape[0], 1), q.dtype)], axis=1
        )
        f = jnp.sum(q**2, axis=1)
        aw = a * w[:, None]
        # normal equations (4x4) are far cheaper than lstsq on 262k rows
        ata = aw.T @ a
        atf = aw.T @ f
        sol = jnp.linalg.solve(ata + 1e-6 * jnp.eye(4), atf)
        center = sol[:3] + mean
        radius = jnp.sqrt(jnp.maximum(sol[3] + jnp.sum(sol[:3] ** 2), 1e-9))
        return radius, center

    def body(w, _):
        radius, center = fit(w)
        resid = jnp.abs(jnp.linalg.norm(pts - center, axis=1) - radius)
        w_new = (resid < tol_mm).astype(pts.dtype)
        # never collapse to an empty consensus
        w_new = jnp.where(jnp.sum(w_new) < 32, w, w_new)
        return w_new, None

    w, _ = jax.lax.scan(body, w, None, length=iters)
    radius, center = fit(w)
    resid = jnp.abs(jnp.linalg.norm(pts - center, axis=1) - radius)
    inlier = resid < tol_mm
    if support_mask is not None:
        sup = support_mask.reshape(-1) > 0.5
        disagree = jnp.sum(sup & ~inlier) / jnp.maximum(jnp.sum(sup), 1)
        engage = disagree > support_min_disagree
        inlier = inlier | (
            engage & sup & (resid < support_tol_factor * tol_mm)
        )
    raw = inlier.reshape(r, c)
    mask = _longest_cyclic_run_per_row(raw)
    mean_resid = jnp.sum(jnp.where(mask.reshape(-1), resid, 0.0)) / jnp.maximum(
        jnp.sum(mask), 1
    )
    return mask.astype(points.dtype), radius, center, mean_resid
