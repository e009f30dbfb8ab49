"""Curve-scenario risk on the rates stack: full swaption-book
revaluation under level/slope/curvature zero-curve shocks, gated
against the f64 Jamshidian closed form, swap parity, and the parallel
DV01."""

import numpy as np
import pytest

from mc_tpu import SimParams
from mc_tpu.models.hullwhite import DEMO_CURVE, DEMO_HW
from mc_tpu.models.swaption import SwaptionSpec
from mc_tpu.risk import CurveScenarioSet, hw_swaption_curve_pnl, var_es

SC = CurveScenarioSet.factor(128, DEMO_CURVE.times, seed=5)
SPECS = [SwaptionSpec(k_rate=0.04), SwaptionSpec(k_rate=0.04, payer=False),
         SwaptionSpec(k_rate=0.05)]
W = np.array([1.0, -1.0, 0.5])


def test_mc_matches_jamshidian_revaluation():
    """All M+1 curves reprice per spec in ONE batched call off a
    shared draw set, so the MC scenario P&L tracks the f64
    curve-consistent Jamshidian revaluation to ~0.1% of the worst move
    (measured 0.06% at 2^16 paths) and VaR/ES carry over."""
    ro = hw_swaption_curve_pnl(SPECS, DEMO_HW, DEMO_CURVE,
                               scenarios=SC, weights=W, method="oracle")
    rm = hw_swaption_curve_pnl(SPECS, DEMO_HW, DEMO_CURVE,
                               SimParams(n_paths=1 << 16, n_steps=1),
                               scenarios=SC, weights=W, method="mc")
    scale = np.abs(ro.pnl).max()
    assert np.abs(rm.pnl - ro.pnl).max() < 2.5e-3 * scale
    assert rm.base_value == pytest.approx(ro.base_value, rel=8e-3)
    for alpha in (0.9, 0.99):
        assert rm.var(alpha) == pytest.approx(ro.var(alpha), rel=2e-2)
        assert rm.es(alpha) == pytest.approx(ro.es(alpha), rel=2e-2)
        assert ro.es(alpha) >= ro.var(alpha) - 1e-12
    c = ro.component_es(0.95)
    assert c.sum() == pytest.approx(ro.es(0.95), abs=1e-12)


def test_payer_receiver_parity_pnl_is_swap_pnl():
    """Long payer / short receiver (same strike) is the forward swap:
    its oracle-revalued scenario P&L equals the swap-value P&L read
    directly off the shifted discount curves (Jamshidian parity is
    exact, so this gate is f64-tight)."""
    spec = SwaptionSpec(k_rate=0.045)
    pair = [spec, SwaptionSpec(k_rate=0.045, payer=False)]
    r = hw_swaption_curve_pnl(pair, DEMO_HW, DEMO_CURVE, scenarios=SC,
                              weights=np.array([1.0, -1.0]),
                              method="oracle")

    def swap_value(cv):
        dates = [spec.expiry + i * spec.tenor
                 for i in range(spec.n_payments + 1)]
        ann = sum(cv.df(t) for t in dates[1:])
        return (cv.df(dates[0]) - cv.df(dates[-1])
                - spec.k_rate * spec.tenor * ann)

    from mc_tpu.models.hullwhite import DiscountCurve
    base = swap_value(DEMO_CURVE)
    expect = np.array([
        swap_value(DiscountCurve(DEMO_CURVE.times,
                                 DEMO_CURVE.zeros + SC.zero_abs[i]))
        - base for i in range(len(SC))])
    np.testing.assert_allclose(r.pnl, expect, rtol=1e-9, atol=1e-11)


def test_parallel_scenario_matches_dv01():
    """A single +1bp parallel scenario reproduces the desk's parallel
    curve_dv01 (one-sided vs central differences differ only at
    curvature order)."""
    from mc_tpu.models.hullwhite import hw_swaption_greeks
    spec = SwaptionSpec(k_rate=0.04)
    one = CurveScenarioSet(np.full((1, len(DEMO_CURVE.times)), 1e-4))
    sim = SimParams(n_paths=1 << 16, n_steps=1)
    r = hw_swaption_curve_pnl(spec, DEMO_HW, DEMO_CURVE, sim,
                              scenarios=one, method="mc")
    g = hw_swaption_greeks(spec, DEMO_HW, DEMO_CURVE, sim,
                           which=("curve_dv01",))
    assert float(r.pnl[0]) == pytest.approx(float(g["curve_dv01"]),
                                            rel=2e-2)


def test_factor_scenarios_reproducible_and_validated():
    a = CurveScenarioSet.factor(512, DEMO_CURVE.times, seed=3)
    b = CurveScenarioSet.factor(512, DEMO_CURVE.times, seed=3)
    np.testing.assert_array_equal(a.zero_abs, b.zero_abs)
    assert a.zero_abs.shape == (512, 6)
    with pytest.raises(ValueError, match="knots"):
        hw_swaption_curve_pnl(SPECS[0], scenarios=CurveScenarioSet(
            np.zeros((4, 3))), method="oracle")
    with pytest.raises(ValueError, match="weights"):
        hw_swaption_curve_pnl(SPECS, scenarios=SC,
                              weights=np.ones(2), method="oracle")
    with pytest.raises(ValueError, match="mc|oracle"):
        hw_swaption_curve_pnl(SPECS[0], scenarios=SC, method="fd")
    with pytest.raises(ValueError, match="n >= 1"):
        CurveScenarioSet.factor(0, DEMO_CURVE.times)


def test_g2_curve_pnl_matches_oracle_and_hw_limit():
    """The two-factor twin: MC curve-scenario P&L tracks the f64
    conditional-Jamshidian revaluation, and in the eta -> 0 limit the
    G2 P&L collapses to the Hull-White P&L on the same scenarios."""
    from mc_tpu.models.g2pp import DEMO_G2, G2Dynamics
    from mc_tpu.models.hullwhite import HullWhiteDynamics
    from mc_tpu.risk import g2_swaption_curve_pnl
    spec = SwaptionSpec(k_rate=0.04)
    sc = CurveScenarioSet(SC.zero_abs[:48])
    sim = SimParams(n_paths=1 << 15, n_steps=1)
    ro = g2_swaption_curve_pnl(spec, DEMO_G2, DEMO_CURVE,
                               scenarios=sc, method="oracle")
    rm = g2_swaption_curve_pnl(spec, DEMO_G2, DEMO_CURVE, sim,
                               scenarios=sc, method="mc")
    scale = np.abs(ro.pnl).max()
    assert np.abs(rm.pnl - ro.pnl).max() < 5e-3 * scale
    assert rm.es(0.95) == pytest.approx(ro.es(0.95), rel=3e-2)
    # eta -> 0: one-factor degenerate limit (oracle mode, f64)
    g2d = G2Dynamics(a=0.3, sigma=0.015, b_mr=0.05, eta=1e-9, rho=0.0)
    hwd = HullWhiteDynamics(a=0.3, sigma_r=0.015)
    g = g2_swaption_curve_pnl(spec, g2d, DEMO_CURVE, scenarios=sc,
                              method="oracle")
    h = hw_swaption_curve_pnl(spec, hwd, DEMO_CURVE, scenarios=sc,
                              method="oracle")
    np.testing.assert_allclose(g.pnl, h.pnl, rtol=2e-4,
                               atol=1e-8 * scale)
