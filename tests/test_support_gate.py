"""Unit tests for the CNN-support plausibility gate in sphere_segment.

Locks the three engagement regimes measured in round 5
(models/segment.sphere_segment, tools/debug_support_gate.py):

  * plausible   — bounded disagreement + dome recall: support widens the
                  mask by CNN pixels within the residual bound;
  * locked out  — wholesale disagreement on a healthy consensus (the
                  round-4 out-of-domain-CNN regression): output equals
                  the plain consensus;
  * rescue      — collapsed strict consensus: support engages despite
                  high disagreement.  NOT testable on a minimal grid:
                  the robust consensus simply re-fits any smooth toy
                  deformation instead of collapsing (measured: strict
                  stays 0.58-0.78 under sector or axisymmetric erosion).
                  The regime is exercised end-to-end by the RUN_SLOW
                  arthritic accuracy gate (tests/test_accuracy_gate.py;
                  5/8 cohort bones measured in rescue,
                  tools/debug_support_gate.py round 5).

Runs on synthetic point grids (fast, default suite).
"""

import numpy as np
import pytest


def _cap_points(r0=25.0, rows=32, cols=64, flatten_depth=0.0,
                flatten_from=0.7, rim_at=1.1, shaft_drop=12.0, seed=0,
                flatten_all_theta=False):
    """(rows, cols, 3) points: spherical cap, optional flattened sector
    (one flank, or every theta column with flatten_all_theta — the
    axisymmetric erosion that collapses the first-departure cut in every
    column at once), then a shaft region far inside the sphere below the
    rim."""
    rng = np.random.default_rng(seed)
    th = np.linspace(-np.pi, np.pi, cols, endpoint=False)
    phi = np.linspace(0.05, 1.4, rows)
    pts = np.zeros((rows, cols, 3), np.float32)
    for i, p in enumerate(phi):
        for j, t in enumerate(th):
            rr = r0
            in_sector = flatten_all_theta or np.cos(t) > 0.3
            if p > flatten_from and in_sector and flatten_depth:
                rr = r0 - flatten_depth
            if p > rim_at:
                rr = r0 - shaft_drop
            pts[i, j] = [rr * np.sin(p) * np.cos(t),
                         rr * np.sin(p) * np.sin(t),
                         r0 * np.cos(p)]
    pts += rng.normal(0, 0.02, pts.shape).astype(np.float32)
    return pts, phi


def _mask_where(phi, cols, pred):
    m = np.zeros((len(phi), cols), np.float32)
    for i, p in enumerate(phi):
        m[i, :] = 1.0 if pred(p) else 0.0
    return m


def test_plausible_support_widens_to_flattened_flank():
    from shoulder_tpu.models import segment

    pts, phi = _cap_points(flatten_depth=5.0)
    cnn = _mask_where(phi, 64, lambda p: p <= 1.1)  # exact cap incl. flank
    m0, r0_, _, _ = segment.sphere_segment(pts)
    m1, _, _, _ = segment.sphere_segment(pts, init_mask=cnn,
                                         support_mask=cnn)
    m0, m1 = np.asarray(m0), np.asarray(m1)
    assert 24.0 < float(r0_) < 26.0
    # support recovered flank pixels the strict consensus clipped
    assert m1.sum() > m0.sum()
    # ...but no shaft leakage: nothing below the rim row
    rim_row = int(np.searchsorted(phi, 1.1))
    assert m1[rim_row + 1:].sum() == 0


def test_garbage_overreaching_cnn_is_locked_out():
    from shoulder_tpu.models import segment

    pts, phi = _cap_points()  # healthy: no flattening
    # out-of-domain CNN: claims the cap AND a big shaft band (the
    # round-4 failure shape: recall ~1, disagree >> max_disagree)
    cnn = _mask_where(phi, 64, lambda p: p <= 1.35)
    m0, _, _, _ = segment.sphere_segment(pts)
    m1, _, _, _ = segment.sphere_segment(pts, init_mask=cnn,
                                         support_mask=cnn)
    # degrades gracefully: bit-identical to the plain consensus
    assert np.array_equal(np.asarray(m0), np.asarray(m1))


def test_consensus_refits_rather_than_collapses_on_smooth_erosion():
    from shoulder_tpu.models import segment

    # documents WHY the rescue regime needs the full generator to test:
    # a smooth axisymmetric erosion does not collapse the robust
    # consensus — it re-fits (smaller compromise sphere, mask intact).
    # A regression that makes THIS collapse would surface here.
    pts, phi = _cap_points(flatten_depth=5.0, flatten_from=0.2,
                           flatten_all_theta=True)
    m0, _, _, _ = segment.sphere_segment(pts)
    assert float(np.asarray(m0).mean()) > 0.12  # above rescue threshold
