"""Signal ops vs scipy ground truth (scipy is the host oracle)."""

import numpy as np
import pytest
import scipy.signal

from shoulder_tpu.ops import signal as sig


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("window", [10, 3])
def test_savgol_matches_scipy(seed, window):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.normal(size=512)).astype(np.float32)
    ours = np.asarray(sig.savgol_filter(x, window, 1))
    ref = scipy.signal.savgol_filter(x.astype(np.float64), window, 1)
    assert np.allclose(ours, ref, atol=1e-3)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("method", ["dense", "rq"])
def test_find_peaks_matches_scipy(seed, method):
    rng = np.random.default_rng(seed)
    # smoothed noise, the same character as the groove radius signals
    x = scipy.signal.savgol_filter(rng.normal(size=512), 15, 2).astype(
        np.float32
    )
    ref_idx, ref_prop = scipy.signal.find_peaks(
        x.astype(np.float64), height=-10, prominence=0.05, width=0.1
    )
    ours = sig.find_peaks(x, height=-10.0, prominence=0.05, width=0.1,
                          max_peaks=128, method=method)
    ok = np.asarray(ours["valid"])
    idx = np.sort(np.asarray(ours["idx"])[ok])
    assert idx.tolist() == ref_idx.tolist()

    # per-peak properties (match by index)
    order = np.argsort(np.asarray(ours["idx"])[ok])
    prom = np.asarray(ours["prominences"])[ok][order]
    widths = np.asarray(ours["widths"])[ok][order]
    wh = np.asarray(ours["width_heights"])[ok][order]
    assert np.allclose(prom, ref_prop["prominences"], atol=1e-4)
    assert np.allclose(widths, ref_prop["widths"], atol=1e-3)
    assert np.allclose(wh, ref_prop["width_heights"], atol=1e-4)


@pytest.mark.parametrize("method", ["dense", "rq"])
def test_find_peaks_unsmoothed_noise_matches_scipy(method):
    """Raw (unsmoothed) noise maximizes the local-maxima count (~n/3),
    stressing the dense core's candidate compaction: its slot cap must be
    exact, not a truncation, for the two cores to stay identical
    (ADVICE r2: a 128-slot cap silently dropped maxima 129+)."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=512).astype(np.float32)
    ref_idx, ref_prop = scipy.signal.find_peaks(
        x.astype(np.float64), height=-10, prominence=0.05, width=0.0
    )
    assert len(ref_idx) > 128  # the regression's precondition
    ours = sig.find_peaks(x, height=-10.0, prominence=0.05, width=0.0,
                          max_peaks=512, method=method)
    ok = np.asarray(ours["valid"])
    idx = np.sort(np.asarray(ours["idx"])[ok])
    assert idx.tolist() == ref_idx.tolist()
    order = np.argsort(np.asarray(ours["idx"])[ok])
    prom = np.asarray(ours["prominences"])[ok][order]
    assert np.allclose(prom, ref_prop["prominences"], atol=1e-4)


def test_find_peaks_cand_cap_overflow_flagged():
    """A below-exact cand_cap must never truncate SILENTLY: the overflow
    flag fires exactly when the input has more local maxima than slots,
    and a roomy cap reproduces the exact result with overflow False
    (the pipeline's groove stage runs cand_cap=64 vs a measured max of
    10 maxima per anatomic slice and QC-flags any overflow)."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=512).astype(np.float32)  # ~n/3 maxima
    exact = sig.find_peaks(x, height=-10.0, prominence=0.05, width=0.0,
                           max_peaks=512, method="dense")
    assert not bool(exact["overflow"])
    capped = sig.find_peaks(x, height=-10.0, prominence=0.05, width=0.0,
                            max_peaks=512, method="dense", cand_cap=64)
    assert bool(capped["overflow"])

    # smooth signal, few maxima (a 9-lobe profile like an anatomic
    # contour's radius curve): capped == exact, no overflow
    t = np.linspace(0, 2 * np.pi, 512)
    y = (np.sin(9 * t) + 0.3 * np.cos(2 * t)).astype(np.float32)
    a = sig.find_peaks(y, height=-10.0, prominence=0.05, width=0.0,
                       method="dense")
    b = sig.find_peaks(y, height=-10.0, prominence=0.05, width=0.0,
                       method="dense", cand_cap=64)
    assert not bool(b["overflow"])
    for k in ("idx", "prominences", "widths", "valid"):
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_find_peaks_respects_filters():
    x = np.zeros(64, np.float32)
    x[10] = 1.0   # prominence 1
    x[30] = 0.2   # prominence 0.2 -> filtered
    out = sig.find_peaks(x, height=-10.0, prominence=0.6, width=0.1)
    assert int(out["n_peaks"]) == 1
    assert int(out["idx"][0]) == 10


def test_kde_linear_argmax():
    rng = np.random.default_rng(3)
    samples = np.concatenate(
        [rng.normal(1.2, 0.1, 40), rng.normal(-2.0, 0.4, 10)]
    ).astype(np.float32)
    grid = np.linspace(-np.pi, np.pi, 1024).astype(np.float32)
    best, dens = sig.kde_linear_argmax(
        samples, np.ones_like(samples), grid
    )
    # numpy oracle of the same (unnormalized) linear-kernel density
    d = np.maximum(0, 1 - np.abs(grid[:, None] - samples[None, :])).sum(1)
    assert float(best) == pytest.approx(grid[np.argmax(d)])
    assert abs(float(best) - 1.2) < 0.2


def test_rbf_changepoint_step_signal():
    rng = np.random.default_rng(0)
    x = np.concatenate(
        [rng.normal(0, 0.05, 40), rng.normal(3.0, 0.05, 18)]
    ).astype(np.float32)
    t = int(sig.rbf_changepoint_1bkp(x))
    assert t == 40


def test_rbf_changepoint_padded_equals_unpadded():
    rng = np.random.default_rng(1)
    x = np.concatenate(
        [np.linspace(10, 9, 30), np.linspace(9, 2, 28)]
    ).astype(np.float32) + rng.normal(0, 0.02, 58).astype(np.float32)
    t0 = int(sig.rbf_changepoint_1bkp(x))
    xp = np.concatenate([x, np.zeros(70, np.float32)])
    mask = np.arange(128) < 58
    t1 = int(sig.rbf_changepoint_1bkp(xp, valid=mask))
    assert t0 == t1
    assert 20 <= t0 <= 40


def test_interp_ascending_matches_jnp_interp():
    """interp_ascending must reproduce jnp.interp exactly on linspace
    queries over sorted knots — including duplicate knots, out-of-range
    queries on both sides, and a degenerate constant query grid.

    Both sides run under jit: jnp.interp itself is jitted, and XLA's
    FMA fusion of `a + (b/c)*d` differs 1 ulp between eager and compiled
    execution — the pipeline always runs compiled, so compiled parity is
    the contract."""
    import jax
    import jax.numpy as jnp

    from shoulder_tpu.ops import signal as sig

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(4, 600))
        xp = np.sort(rng.normal(size=n)).astype(np.float32)
        if trial % 3 == 0:  # inject duplicate knots
            k = int(rng.integers(1, n - 1))
            xp[k] = xp[k - 1]
            xp = np.sort(xp)
        fp = rng.normal(size=n).astype(np.float32)
        lo = xp[0] - 0.3 * rng.random()
        hi = xp[-1] + 0.3 * rng.random()
        m = int(rng.integers(4, 700))
        x = jnp.linspace(np.float32(lo), np.float32(hi), m)
        want = np.asarray(jax.jit(jnp.interp)(x, jnp.asarray(xp), fp))
        got = np.asarray(
            jax.jit(sig.interp_ascending)(x, jnp.asarray(xp), fp)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")

    # degenerate: constant query grid + constant knots (empty contour rows)
    xp = np.full(16, 1.25, np.float32)
    fp = np.arange(16, dtype=np.float32)
    x = jnp.linspace(1.25, 1.25, 8)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(sig.interp_ascending)(x, jnp.asarray(xp), fp)),
        np.asarray(jax.jit(jnp.interp)(x, jnp.asarray(xp), fp)),
    )


def test_fill_from_scatter_matches_gather_formulation():
    """fill_from_scatter == rows[max{k : dest[k] <= j}] (init row where no
    such k) on fuzzed non-decreasing dest — tie groups, entries dropped
    past m, and an unwritten prefix (dest[0] > 0)."""
    import jax
    import jax.numpy as jnp

    from shoulder_tpu.ops import signal as sig

    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(1, 40))
        m = int(rng.integers(1, 60))
        # non-decreasing destinations with ties, sometimes starting past 0
        # and sometimes overflowing past m
        dest = np.sort(rng.integers(0, m + 10, size=n)).astype(np.int32)
        rows = rng.normal(size=(n, 3)).astype(np.float32)
        init = rng.normal(size=3).astype(np.float32)

        got = np.asarray(
            jax.jit(sig.fill_from_scatter, static_argnums=2)(
                jnp.asarray(dest), jnp.asarray(rows), m, jnp.asarray(init)
            )
        )
        want = np.empty((m, 3), np.float32)
        for j in range(m):
            ks = np.nonzero(dest <= j)[0]
            want[j] = rows[ks.max()] if ks.size else init
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_fill_from_scatter_dense_matches_gather_on_any_dest():
    """The dense (masked max-reduce) rank must equal the gather
    (scatter-max + cummax) rank for ARBITRARY dest — including locally
    NON-monotone dest.  Regression for the count-based dense rank that
    assumed dest non-decreasing: interp_ascending's bucket vector dips on
    non-convex contours (theta in walk order is locally non-monotone),
    and the count/max divergence there shifted the anatomic-neck polar
    image enough to move retroversion ~1.4 deg on the CT A/B bone."""
    import jax
    import jax.numpy as jnp

    from shoulder_tpu.ops import signal as sig

    rng = np.random.default_rng(23)
    for trial in range(20):
        n = int(rng.integers(1, 50))
        m = int(rng.integers(1, 60))
        # unsorted destinations: dips, ties, overflow past m
        dest = rng.integers(0, m + 10, size=n).astype(np.int32)
        rows = rng.normal(size=(n, 3)).astype(np.float32)
        init = rng.normal(size=3).astype(np.float32)
        args = (jnp.asarray(dest), jnp.asarray(rows), m, jnp.asarray(init))
        got = np.asarray(
            jax.jit(
                sig.fill_from_scatter,
                static_argnums=2,
                static_argnames=("dense",),
            )(*args, dense=True)
        )
        want = np.asarray(
            jax.jit(sig.fill_from_scatter, static_argnums=2)(*args)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")
