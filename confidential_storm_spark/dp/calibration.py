"""DP noise calibration (DP-SQLP Section 4.4).

Python port of the reference's pure calibration functions
(``confidentialstorm/enclave/src/main/java/ch/usi/inf/confidentialstorm/enclave/util/DPUtil.java``):

- ``cdp_rho`` / ``cdp_delta``: tight (eps, delta)-DP <-> rho-zCDP
  conversion (Bun & Steinke 2016), same binary-search scheme as the
  public IBM ``cdp2adp.py`` the reference itself cites (DPUtil.java:72-147).
- ``key_selection_per_round_budget``: Dwork advanced composition with a
  1024-step delta' grid search (DPUtil.java:173-295).
- ``key_selection_per_round_budget_optimal``: Kairouz-Oh-Viswanath
  optimal k-fold composition (DPUtil.java:332-451).
- ``calculate_sigma``: sigma = L * sqrt(ceil(log2 T) / (2 rho))
  (Theorem C.1; DPUtil.java:484-488).
- ``compute_beta`` / ``gaussian_share_delta`` / ``threshold_quantile``:
  per-round delta pre-allocation between the Gaussian noise share and
  the threshold failure share (DPUtil.java:518-575).
- ``calibrate``: the full pipeline producing (sigma_key, sigma_hist,
  threshold quantile) for a :class:`~..dp.mechanism.StreamingDPMechanism`
  (DPUtil.java:662-702).

Everything is stdlib + math only (``statistics.NormalDist`` supplies
the standard-normal quantile; no scipy dependency).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from enum import Enum
from statistics import NormalDist

__all__ = [
    "CompositionMode",
    "PerRoundBudget",
    "KeySelectionRoundBudget",
    "DpCalibration",
    "cdp_delta",
    "cdp_rho",
    "key_selection_per_round_budget",
    "key_selection_per_round_budget_optimal",
    "key_selection_round_budget",
    "calculate_sigma",
    "l1_sensitivity",
    "compute_beta",
    "gaussian_share_delta",
    "threshold_quantile",
    "calibrate",
]

_SEARCH_STEPS = 1024
_STD_NORMAL = NormalDist()


class CompositionMode(Enum):
    """C-fold composition theorem used to derive the per-round
    key-selection budget (ref CompositionMode.java:29-36)."""

    DWORK_ANALYTICAL = "dwork_analytical"
    OPTIMAL_KOV = "optimal_kov"
    ZCDP_LINEAR = "zcdp_linear"
    # The tight (eps_round, (1-alpha) delta_round) -> rho re-derivation
    # that produced the reference's COMMITTED benchmark CSVs.  It yields
    # a strictly larger per-round rho than the linear split, so C rounds
    # compose to MORE than the advertised total zCDP budget (~10% less
    # noise than sound for the T=100 config).  Kept only for baseline
    # parity; do not use for production releases.
    ZCDP_LINEAR_LEGACY = "zcdp_linear_legacy"


@dataclass(frozen=True)
class PerRoundBudget:
    epsilon: float
    delta: float


@dataclass(frozen=True)
class KeySelectionRoundBudget:
    epsilon: float
    delta: float
    rho: float


@dataclass(frozen=True)
class DpCalibration:
    epsilon_key_round: float
    delta_key_round: float
    rho_key: float
    sigma_key: float
    rho_hist: float
    sigma_hist: float
    beta: float
    threshold_quantile: float


def cdp_delta(rho: float, eps: float) -> float:
    """Smallest delta such that rho-zCDP implies (eps, delta)-DP.

    Optimizes the Renyi order alpha by bisecting the derivative of
    ``log delta(alpha)`` (Bun-Steinke tight conversion)."""
    if rho < 0 or eps < 0:
        raise ValueError("rho and eps must be non-negative")
    if rho == 0:
        return 0.0
    amin, amax = 1.01, (eps + 1) / (2 * rho) + 2
    for _ in range(1000):
        alpha = (amin + amax) / 2
        deriv = (2 * alpha - 1) * rho - eps + math.log1p(-1.0 / alpha)
        if deriv < 0:
            amin = alpha
        else:
            amax = alpha
    alpha = (amin + amax) / 2
    delta = math.exp((alpha - 1) * (alpha * rho - eps) + alpha * math.log1p(-1.0 / alpha)) / (
        alpha - 1.0
    )
    return min(delta, 1.0)


def cdp_rho(eps: float, delta: float) -> float:
    """Largest rho such that rho-zCDP implies (eps, delta)-DP
    (tight conversion; maximizing rho minimizes the noise scale)."""
    if eps < 0 or delta <= 0:
        raise ValueError("eps must be non-negative and delta positive")
    if delta >= 1:
        return 0.0
    rho_min, rho_max = 0.0, eps + 1
    for _ in range(1000):
        rho = (rho_min + rho_max) / 2
        if cdp_delta(rho, eps) <= delta:
            rho_min = rho
        else:
            rho_max = rho
    return rho_min


def _rho_from_dp_upper_bound(eps: float, delta: float) -> float:
    """Closed-form rho from the standard zCDP->DP conversion:
    rho = (sqrt(eps + ln(1/delta)) - sqrt(ln(1/delta)))^2."""
    if eps <= 0 or delta <= 0 or delta >= 1:
        return 0.0
    log_inv = math.log(1.0 / delta)
    return (math.sqrt(eps + log_inv) - math.sqrt(log_inv)) ** 2


def _advanced_composition_eps(eps_round: float, k: int, delta_prime: float) -> float:
    """Dwork advanced-composition total epsilon of k rounds."""
    return (
        math.sqrt(2.0 * k * math.log(1.0 / delta_prime)) * eps_round
        + k * eps_round * math.expm1(eps_round)
    )


def _solve_round_eps(total: float, k: int, delta_prime: float, bound_fn) -> float:
    """Largest per-round epsilon whose composed cost stays <= total."""
    lower, upper = 0.0, total
    if bound_fn(upper, k, delta_prime) <= total:
        return upper
    for _ in range(200):
        mid = (lower + upper) / 2
        if bound_fn(mid, k, delta_prime) <= total:
            lower = mid
        else:
            upper = mid
    return lower


def key_selection_per_round_budget(
    epsilon_total: float, delta_total: float, c: int
) -> PerRoundBudget:
    """Per-round key-selection budget via Dwork advanced composition,
    grid-searching delta' in (0, delta_total) and keeping the candidate
    with the largest implied rho (smallest sigma_k)."""
    if epsilon_total < 0 or delta_total <= 0:
        raise ValueError("epsilon_total must be >= 0 and delta_total > 0")
    if c <= 0:
        raise ValueError("rounds must be positive")
    if c == 1:
        return PerRoundBudget(epsilon_total, delta_total)
    if epsilon_total == 0.0:
        return PerRoundBudget(0.0, delta_total / c)

    best = PerRoundBudget(0.0, delta_total / c)
    best_score = -1.0
    for i in range(1, _SEARCH_STEPS):
        delta_prime = delta_total * i / _SEARCH_STEPS
        delta_round = (delta_total - delta_prime) / c
        if delta_round <= 0:
            continue
        eps_round = _solve_round_eps(epsilon_total, c, delta_prime, _advanced_composition_eps)
        score = _rho_from_dp_upper_bound(eps_round, delta_round)
        if score > best_score:
            best_score = score
            best = PerRoundBudget(eps_round, delta_round)
    return best


def _kov_composition_eps(eps_round: float, k: int, d_prime: float) -> float:
    """Kairouz-Oh-Viswanath homogeneous k-fold bound: minimum of plain
    sequential composition and the two tighter KOV expressions."""
    if eps_round <= 0.0:
        return 0.0
    exp_eps = math.exp(eps_round)
    leading = (exp_eps - 1.0) * eps_round * k / (exp_eps + 1.0)
    k_eps_sq = k * eps_round * eps_round
    bound_a = k * eps_round
    bound_b = leading + eps_round * math.sqrt(
        2.0 * k * math.log(math.e + math.sqrt(k_eps_sq) / d_prime)
    )
    bound_c = leading + eps_round * math.sqrt(2.0 * k * math.log(1.0 / d_prime))
    return min(bound_a, bound_b, bound_c)


def key_selection_per_round_budget_optimal(
    epsilon_total: float, delta_total: float, c: int
) -> PerRoundBudget:
    """Per-round budget via KOV optimal k-fold composition
    (delta_g = 1 - (1-delta)^k (1-delta'), inverted with log1p/expm1)."""
    if epsilon_total < 0 or delta_total <= 0:
        raise ValueError("epsilon_total must be >= 0 and delta_total > 0")
    if c <= 0:
        raise ValueError("rounds must be positive")
    if c == 1:
        return PerRoundBudget(epsilon_total, delta_total)
    if epsilon_total == 0.0:
        return PerRoundBudget(0.0, delta_total / c)

    best = PerRoundBudget(0.0, delta_total / c)
    best_score = -1.0
    for i in range(1, _SEARCH_STEPS):
        d_prime = delta_total * i / _SEARCH_STEPS
        if d_prime <= 0.0 or d_prime >= 1.0:
            continue
        log_ratio = math.log1p(-delta_total) - math.log1p(-d_prime)
        delta_round = -math.expm1(log_ratio / c)
        if not math.isfinite(delta_round) or delta_round <= 0.0:
            continue
        eps_round = _solve_round_eps(epsilon_total, c, d_prime, _kov_composition_eps)
        if eps_round <= 0.0:
            continue
        score = _rho_from_dp_upper_bound(eps_round, delta_round)
        if score > best_score:
            best_score = score
            best = PerRoundBudget(eps_round, delta_round)
    return best


def calculate_sigma(rho: float, t: float, sensitivity: float) -> float:
    """Gaussian sigma for a binary aggregation tree under rho-zCDP
    (Theorem C.1): sigma = L * sqrt(ceil(log2 T) / (2 rho))."""
    log2_t = math.ceil(math.log(t) / math.log(2))
    return math.sqrt((log2_t * sensitivity * sensitivity) / (2 * rho))


def l1_sensitivity(max_contributions_per_user: int, per_record_clamp: float) -> float:
    """User-level L1 sensitivity C * L_m."""
    return max_contributions_per_user * per_record_clamp


def compute_beta(eps_round: float, delta_round: float, alpha: float) -> float:
    """Accuracy parameter of Algorithm 1:
    beta = alpha * delta_round / (e^eps_round + 1)."""
    if eps_round < 0 or delta_round <= 0:
        raise ValueError("eps_round must be >= 0 and delta_round > 0")
    if not 0 < alpha < 1:
        raise ValueError("alpha must lie in (0, 1)")
    return (alpha * delta_round) / (math.exp(eps_round) + 1.0)


def gaussian_share_delta(delta_round: float, alpha: float) -> float:
    """Gaussian-noise share (1 - alpha) * delta_round of the per-round
    delta budget under the pre-allocation split."""
    if delta_round <= 0:
        raise ValueError("delta_round must be positive")
    if not 0 < alpha < 1:
        raise ValueError("alpha must lie in (0, 1)")
    return (1.0 - alpha) * delta_round


def threshold_quantile(beta: float) -> float:
    """Standard-normal quantile Phi^-1(1 - beta) scaling the
    time-dependent key-selection threshold tau = sqrt(lambda^2) * quantile."""
    if not 0.0 < beta < 1.0:
        raise ValueError(f"beta must lie in (0, 1); got {beta}")
    return _STD_NORMAL.inv_cdf(1.0 - beta)


def key_selection_round_budget(
    composition: CompositionMode,
    epsilon_k: float,
    delta_k: float,
    c: int,
    alpha: float,
) -> KeySelectionRoundBudget:
    """Per-round key-selection budget + the rho used for sigma_k, per
    composition mode (ref DPUtil.keySelectionRoundBudget:606-634)."""
    if composition is CompositionMode.DWORK_ANALYTICAL:
        b = key_selection_per_round_budget(epsilon_k, delta_k, c)
        rho = cdp_rho(b.epsilon, gaussian_share_delta(b.delta, alpha))
        return KeySelectionRoundBudget(b.epsilon, b.delta, rho)
    if composition is CompositionMode.OPTIMAL_KOV:
        b = key_selection_per_round_budget_optimal(epsilon_k, delta_k, c)
        rho = cdp_rho(b.epsilon, gaussian_share_delta(b.delta, alpha))
        return KeySelectionRoundBudget(b.epsilon, b.delta, rho)
    if composition in (CompositionMode.ZCDP_LINEAR, CompositionMode.ZCDP_LINEAR_LEGACY):
        rho_total = cdp_rho(epsilon_k, delta_k)
        rho_round = rho_total / c
        delta_round = delta_k / c
        # zCDP Prop 1.3: rho-zCDP => (rho + 2 sqrt(rho ln(1/delta)), delta)-DP
        eps_round = rho_round + 2.0 * math.sqrt(rho_round * math.log(1.0 / delta_round))
        if composition is CompositionMode.ZCDP_LINEAR:
            # Sound linear split (matches the reference's CURRENT
            # DPUtil.keySelectionRoundBudget): the calibration rho is
            # rho_total / C, so C rounds compose to exactly rho_total
            # and the advertised (eps_k, delta_k) guarantee holds.
            return KeySelectionRoundBudget(eps_round, delta_round, rho_round)
        # LEGACY: re-derive rho from (eps_round, gaussian-share delta)
        # via the tight conversion — strictly larger rho (less noise)
        # than the linear split, i.e. a ~10% budget overrun when
        # composed C times.  This is what produced the reference's
        # committed baselines (benchmark_T100 CSV: eps_round=0.60635,
        # sigma_key=27.8508 = sigma from cdp_rho(eps_round,
        # (1-alpha) * delta_round)); kept strictly for CSV parity.
        rho = cdp_rho(eps_round, gaussian_share_delta(delta_round, alpha))
        return KeySelectionRoundBudget(eps_round, delta_round, rho)
    raise ValueError(f"unknown composition mode: {composition}")


def calibrate(
    composition: CompositionMode,
    epsilon_k: float,
    delta_k: float,
    epsilon_h: float,
    delta_h: float,
    c: int,
    t: int,
    per_record_clamp: float,
    threshold_failure_fraction: float,
) -> DpCalibration:
    """Full DP-SQLP Section 4.4 calibration: per-round key-selection
    budget -> sigma_key (sensitivity 1), beta -> threshold quantile,
    and sigma_hist against (eps_h, delta_h) with sensitivity C * L_m."""
    alpha = threshold_failure_fraction
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"threshold_failure_fraction must lie in (0, 1); got {alpha}")
    if c <= 0:
        raise ValueError(f"max user contributions (C) must be positive; got {c}")
    if t <= 0:
        raise ValueError(f"max time steps (T) must be positive; got {t}")

    key_round = key_selection_round_budget(composition, epsilon_k, delta_k, c, alpha)
    sigma_key = calculate_sigma(key_round.rho, t, 1.0)
    beta = compute_beta(key_round.epsilon, key_round.delta, alpha)
    quantile = threshold_quantile(beta)
    rho_hist = cdp_rho(epsilon_h, delta_h)
    sigma_hist = calculate_sigma(rho_hist, t, l1_sensitivity(c, per_record_clamp))
    return DpCalibration(
        epsilon_key_round=key_round.epsilon,
        delta_key_round=key_round.delta,
        rho_key=key_round.rho,
        sigma_key=sigma_key,
        rho_hist=rho_hist,
        sigma_hist=sigma_hist,
        beta=beta,
        threshold_quantile=quantile,
    )
