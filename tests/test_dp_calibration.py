"""Calibration regression tests.

Oracle values come from the reference's own committed benchmark CSVs
(FIXTURES.md §4 / BASELINE.md): at paper_t100 (eps=6, delta=1e-9,
eps_k=eps_h=3, delta_k=2delta/3, delta_h=delta/3, C=32, T=100, L_m=1,
alpha=0.5, ZCDP_LINEAR): sigma_key=27.8508, sigma_hist=177.1696,
threshold_quantile=6.8506, tau(last leaf)=358.349; at paper_t1000:
sigma_key=33.2881, sigma_hist=211.7581, tau(last)=510.173.
"""

import math

import pytest

from confidential_storm_spark.dp import (
    CompositionMode,
    calibrate,
    cdp_rho,
    compute_beta,
    threshold_quantile,
)
from confidential_storm_spark.dp.calibration import cdp_delta

EPSILON, DELTA = 6.0, 1e-9
EPS_K = EPS_H = EPSILON / 2
DELTA_K = DELTA * 2 / 3
DELTA_H = DELTA / 3
C, L_M, ALPHA = 32, 1.0, 0.5


def _calibrate(t):
    # LEGACY mode: the committed T100/T1000 benchmark CSVs were produced
    # by the tight-rho re-derivation (see CompositionMode docstring)
    return calibrate(
        CompositionMode.ZCDP_LINEAR_LEGACY, EPS_K, DELTA_K, EPS_H, DELTA_H, C, t, L_M, ALPHA
    )


def _tau_at_last_step(cal, t):
    """Worst-case tau diagnostic as the reference benchmark logs it
    (UtilityBenchmarkTest.java:476-477): H max-kappa Honaker node
    variances, H = ceil(log2 T)."""
    kappa = math.ceil(math.log2(t))
    node_var = cal.sigma_key**2 / (2.0 * (1.0 - 2.0**-kappa))
    return math.sqrt(kappa * node_var) * cal.threshold_quantile


def test_paper_t100_regression():
    cal = _calibrate(100)
    assert cal.sigma_key == pytest.approx(27.8508, rel=1e-3)
    assert cal.sigma_hist == pytest.approx(177.1696, rel=1e-3)
    assert cal.threshold_quantile == pytest.approx(6.8506, rel=1e-3)
    assert _tau_at_last_step(cal, 100) == pytest.approx(358.349, rel=1e-3)


def test_paper_t1000_regression():
    cal = _calibrate(1000)
    assert cal.sigma_key == pytest.approx(33.2881, rel=1e-3)
    assert cal.sigma_hist == pytest.approx(211.7581, rel=1e-3)
    assert _tau_at_last_step(cal, 1000) == pytest.approx(510.173, rel=1e-3)


def test_cdp_roundtrip():
    # cdp_rho is the inverse of cdp_delta at the target delta
    for eps, delta in [(1.0, 1e-6), (3.0, 1e-9), (6.0, 1e-9), (0.5, 1e-5)]:
        rho = cdp_rho(eps, delta)
        assert cdp_delta(rho, eps) <= delta * (1 + 1e-6)
        # slightly larger rho must violate the bound (tightness)
        assert cdp_delta(rho * 1.01, eps) > delta


def test_composition_mode_ordering():
    """ZCDP gives the least noise (the reference's own
    composition-comparison benchmark: sigma 30.79 < 170.98 < 215.58 —
    note the sweep CSV's 30.79 IS the sound linear split, confirming
    ZCDP_LINEAR now matches the reference's current DPUtil)."""
    sigmas = {}
    for mode in CompositionMode:
        cal = calibrate(mode, EPS_K, DELTA_K, EPS_H, DELTA_H, C, 100, L_M, ALPHA)
        sigmas[mode] = cal.sigma_key
    assert sigmas[CompositionMode.ZCDP_LINEAR] < sigmas[CompositionMode.OPTIMAL_KOV]
    assert sigmas[CompositionMode.OPTIMAL_KOV] < sigmas[CompositionMode.DWORK_ANALYTICAL]
    # magnitudes from the committed CSVs (composition sweep for
    # ZCDP/KOV/DWORK, new T100 CSV for the legacy re-derivation)
    assert sigmas[CompositionMode.ZCDP_LINEAR] == pytest.approx(30.79, rel=0.01)
    assert sigmas[CompositionMode.ZCDP_LINEAR_LEGACY] == pytest.approx(27.85, rel=0.01)
    assert sigmas[CompositionMode.OPTIMAL_KOV] == pytest.approx(170.98, rel=0.10)
    assert sigmas[CompositionMode.DWORK_ANALYTICAL] == pytest.approx(215.58, rel=0.10)


def test_zcdp_linear_is_budget_sound():
    """The sound mode's per-round rho composes to EXACTLY the total
    budget (rho_round * C == cdp_rho(eps_k, delta_k)); the legacy mode
    overruns it — which is why it is quarantined behind an explicit
    opt-in."""
    rho_total = cdp_rho(EPS_K, DELTA_K)
    sound = calibrate(
        CompositionMode.ZCDP_LINEAR, EPS_K, DELTA_K, EPS_H, DELTA_H, C, 100, L_M, ALPHA
    )
    legacy = calibrate(
        CompositionMode.ZCDP_LINEAR_LEGACY, EPS_K, DELTA_K, EPS_H, DELTA_H, C, 100, L_M, ALPHA
    )
    assert sound.rho_key * C == pytest.approx(rho_total, rel=1e-12)
    assert legacy.rho_key * C > rho_total * 1.05  # the documented overrun


def test_beta_and_quantile_sanity():
    beta = compute_beta(0.5, 1e-11, 0.5)
    assert 0 < beta < 1e-11
    q = threshold_quantile(beta)
    assert 6 < q < 8  # deep tail quantile
    assert threshold_quantile(0.5) == pytest.approx(0.0, abs=1e-12)
