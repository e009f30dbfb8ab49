"""Scenario risk engine: exact linear/parity gates on the float64
oracle revaluation, CRN MC-vs-oracle agreement, coherence of the
empirical ES, Taylor-approximation convergence, and the paths-sharded
revaluation surface."""

import jax
import numpy as np
import pytest

from mc_tpu import OptionParams, SimParams
from mc_tpu.risk import (ScenarioSet, book_scenario_pnl, delta_gamma_pnl,
                         var_es)

SC = ScenarioSet.gbm(256, horizon_days=10, spot_vol=0.2,
                     vol_of_vol=0.5, rate_vol=0.01, seed=7)
BOOK = OptionParams(k=np.array([90.0, 100.0, 110.0]),
                    sigma=np.array([0.2, 0.2, 0.25]))
W = np.array([1.0, -2.0, 1.0])


def test_linear_book_pnl_and_var_are_exact():
    """A near-zero-strike call is (spot - k*e^{-rT}): under spot-only
    scenarios its oracle-revalued P&L is w*S0*x EXACTLY, so VaR/ES
    reduce to quantile arithmetic on the scenario returns."""
    sc = ScenarioSet.spot_only(SC.spot_rel)
    opt = OptionParams(k=1e-6)
    r = book_scenario_pnl(opt, payoff="vanilla_call", scenarios=sc,
                          weights=np.array([2.0]), method="oracle")
    expect = 2.0 * 100.0 * sc.spot_rel
    np.testing.assert_allclose(r.pnl, expect, rtol=1e-9, atol=1e-9)
    v, e = var_es(r.pnl, 0.95)
    loss = -expect
    assert v == pytest.approx(float(np.quantile(loss, 0.95)), abs=1e-12)
    assert e == pytest.approx(float(loss[loss >= v].mean()), abs=1e-12)


def test_put_call_parity_pnl_is_spot_pnl():
    """Long call / short put (same strikes) is a forward: under
    spot-only shocks the oracle P&L difference is exactly the spot
    P&L, strike and discount terms cancelling by parity."""
    sc = ScenarioSet.spot_only(SC.spot_rel)
    c = book_scenario_pnl(BOOK, payoff="vanilla_call", scenarios=sc,
                          weights=W, method="oracle")
    p = book_scenario_pnl(BOOK, payoff="vanilla_put", scenarios=sc,
                          weights=W, method="oracle")
    expect = W.sum() * 100.0 * sc.spot_rel
    np.testing.assert_allclose(c.pnl - p.pnl, expect,
                               rtol=1e-9, atol=1e-9)


def test_mc_revaluation_matches_oracle_under_crn():
    """Full-MC revaluation shares one threefry draw set across the
    whole (M+1)*B surface, so the MC-vs-exact pricing error cancels
    between base and bumped rows: scenario P&L agrees with the f64
    closed-form revaluation to ~1% of the worst-case move (measured
    0.6% at 2^16 paths) — far tighter than each price's own stderr."""
    ro = book_scenario_pnl(BOOK, payoff="vanilla_call", scenarios=SC,
                           weights=W, method="oracle")
    rm = book_scenario_pnl(BOOK, SimParams(n_paths=1 << 16, n_steps=1),
                           "vanilla_call", scenarios=SC, weights=W,
                           method="mc")
    scale = np.abs(ro.pnl).max()
    assert np.abs(rm.pnl - ro.pnl).max() < 1.5e-2 * scale
    assert rm.base_value == pytest.approx(ro.base_value, rel=5e-3)
    assert rm.values.shape == (len(SC), 3)
    # VaR/ES carried over within the same tolerance
    assert rm.var(0.99) == pytest.approx(ro.var(0.99), rel=2e-2)
    assert rm.es(0.99) == pytest.approx(ro.es(0.99), rel=2e-2)


def test_es_dominates_var_and_is_subadditive():
    """Coherence of the empirical tail measure: ES >= VaR always, and
    ES of a merged book is subadditive (same scenario set)."""
    a = book_scenario_pnl(BOOK, payoff="vanilla_call", scenarios=SC,
                          weights=W, method="oracle")
    bk = OptionParams(k=np.array([95.0, 105.0]),
                      sigma=np.array([0.3, 0.15]))
    wb = np.array([-1.0, 3.0])
    b = book_scenario_pnl(bk, payoff="vanilla_put", scenarios=SC,
                          weights=wb, method="oracle")
    for alpha in (0.9, 0.95, 0.99):
        assert a.es(alpha) >= a.var(alpha) - 1e-12
        assert b.es(alpha) >= b.var(alpha) - 1e-12
        merged = a.pnl + b.pnl
        _, es_m = var_es(merged, alpha)
        assert es_m <= a.es(alpha) + b.es(alpha) + 1e-12


def test_delta_gamma_converges_to_full_revaluation():
    """The Taylor P&L converges to full revaluation as the shocks
    shrink (relative error falls ~linearly with the shock scale)."""
    errs = []
    for f in (1.0, 0.1, 0.01):
        sc = ScenarioSet(SC.spot_rel * f, SC.vol_abs * f,
                         SC.rate_abs * f)
        full = book_scenario_pnl(BOOK, payoff="vanilla_call",
                                 scenarios=sc, weights=W,
                                 method="oracle")
        dg = delta_gamma_pnl(BOOK, "vanilla_call", scenarios=sc,
                             weights=W)
        errs.append(np.abs(dg - full.pnl).max()
                    / np.abs(full.pnl).max())
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 2e-2
    # puts through the same machinery (small shocks, same gate)
    scp = ScenarioSet(SC.spot_rel * 0.01, SC.vol_abs * 0.01,
                      SC.rate_abs * 0.01)
    dgp = delta_gamma_pnl(BOOK, "vanilla_put", scenarios=scp, weights=W)
    fullp = book_scenario_pnl(BOOK, payoff="vanilla_put", scenarios=scp,
                              weights=W, method="oracle")
    assert (np.abs(dgp - fullp.pnl).max()
            < 2e-2 * np.abs(fullp.pnl).max())


def test_sharded_revaluation_matches_single_chip():
    """mesh= shards the path axis under global-id keyed streams: the
    8-device scenario P&L matches the single-chip program to reduce-
    order rounding (the price_portfolio_sharded convention)."""
    from mc_tpu.parallel import make_mesh
    sc = ScenarioSet(SC.spot_rel[:16], SC.vol_abs[:16],
                     SC.rate_abs[:16])
    sim = SimParams(n_paths=4096, n_steps=1)
    solo = book_scenario_pnl(BOOK, sim, "vanilla_call", scenarios=sc,
                             weights=W, method="mc")
    mesh = book_scenario_pnl(BOOK, sim, "vanilla_call", scenarios=sc,
                             weights=W, method="mc",
                             mesh=make_mesh(jax.devices()))
    np.testing.assert_allclose(mesh.values, solo.values, rtol=2e-6)


def test_gbm_scenarios_reproducible_and_sane():
    """Counter-based generation: same seed -> identical set; the
    lognormal returns are near-martingale at 10 days."""
    a = ScenarioSet.gbm(4096, seed=3)
    b = ScenarioSet.gbm(4096, seed=3)
    np.testing.assert_array_equal(a.spot_rel, b.spot_rel)
    c = ScenarioSet.gbm(4096, seed=4)
    assert not np.array_equal(a.spot_rel, c.spot_rel)
    assert abs(a.spot_rel.mean()) < 3.0 * 0.2 * np.sqrt(10 / 252) / 64
    sd = a.spot_rel.std()
    assert sd == pytest.approx(0.2 * np.sqrt(10 / 252), rel=0.1)


def test_validation_errors():
    with pytest.raises(ValueError, match="non-positive"):
        ScenarioSet.spot_only([-1.5, 0.0])
    with pytest.raises(ValueError, match="alpha"):
        var_es(np.zeros(4), alpha=1.0)
    with pytest.raises(ValueError, match="weights"):
        book_scenario_pnl(BOOK, payoff="vanilla_call", scenarios=SC,
                          weights=np.ones(2), method="oracle")
    with pytest.raises(ValueError, match="oracle"):
        book_scenario_pnl(BOOK, payoff="bullet_call", scenarios=SC,
                          method="oracle")
    with pytest.raises(ValueError, match="mc|oracle"):
        book_scenario_pnl(BOOK, payoff="vanilla_call", scenarios=SC,
                          method="fd")
    with pytest.raises(ValueError, match="n >= 1"):
        ScenarioSet.gbm(0)
    with pytest.raises(ValueError, match="vanilla"):
        delta_gamma_pnl(BOOK, "bullet_call", scenarios=SC)


def test_component_es_allocates_exactly():
    """Euler ES allocation: per-position contributions over the book's
    tail sum to the book ES EXACTLY, and a perfect hedge pair carries
    exactly opposite components."""
    r = book_scenario_pnl(BOOK, payoff="vanilla_call", scenarios=SC,
                          weights=W, method="oracle")
    for alpha in (0.9, 0.95, 0.99):
        c = r.component_es(alpha)
        assert c.shape == (3,)
        assert c.sum() == pytest.approx(r.es(alpha), abs=1e-12)
    pair = OptionParams(k=np.array([100.0, 100.0]))
    h = book_scenario_pnl(pair, payoff="vanilla_call", scenarios=SC,
                          weights=np.array([1.0, -1.0]),
                          method="oracle")
    ch = h.component_es(0.95)
    assert ch[0] == pytest.approx(-ch[1], abs=1e-12)
    assert h.es(0.95) == pytest.approx(0.0, abs=1e-12)


def test_heston_scenario_pnl_matches_cf_and_gbm_limit():
    """Smile-model revaluation: (a) MC scenario P&L (one batched call,
    shared draws) tracks the f64 characteristic-function revaluation
    at realistic shocks — measured 0.8% of the worst move at 2^15
    paths, vol_of_vol 0.25; (b) the xi -> 0, v0 = theta = sigma^2
    limit reproduces the Black-Scholes revaluation (vol shocks map to
    the same sigma + dv); (c) ES >= VaR and components allocate."""
    from mc_tpu.models.heston import HestonDynamics
    from mc_tpu.risk import heston_scenario_pnl
    sc = ScenarioSet.gbm(64, vol_of_vol=0.25, rate_vol=0.01, seed=7)
    sim = SimParams(n_paths=1 << 15, n_steps=32)
    ro = heston_scenario_pnl(BOOK, None, sim, scenarios=sc, weights=W,
                             method="oracle")
    rm = heston_scenario_pnl(BOOK, None, sim, scenarios=sc, weights=W,
                             method="mc")
    scale = np.abs(ro.pnl).max()
    assert np.abs(rm.pnl - ro.pnl).max() < 2e-2 * scale
    for alpha in (0.9, 0.95):
        assert rm.var(alpha) == pytest.approx(ro.var(alpha), rel=6e-2)
        assert rm.es(alpha) == pytest.approx(ro.es(alpha), rel=8e-2)
        assert ro.es(alpha) >= ro.var(alpha) - 1e-12
    c = rm.component_es(0.95)
    assert c.sum() == pytest.approx(rm.es(0.95), abs=1e-9)
    # GBM limit: constant variance == exact-in-law log-Euler == BS.
    # The flat-vol book: v0 = theta = sigma^2 prices EVERY contract at
    # vol 0.2, so the BS twin must carry the same uniform sigma.
    flat = OptionParams(k=np.array([90.0, 100.0, 110.0]))
    gd = HestonDynamics(v0=0.04, kappa=2.0, theta=0.04, xi=1e-7,
                        rho=0.0)
    hm = heston_scenario_pnl(flat, gd, sim, scenarios=sc, weights=W,
                             method="mc")
    bs = book_scenario_pnl(flat, payoff="vanilla_call", scenarios=sc,
                           weights=W, method="oracle")
    assert (np.abs(hm.pnl - bs.pnl).max()
            < 1.5e-2 * np.abs(bs.pnl).max())
    with pytest.raises(ValueError, match="oracle"):
        heston_scenario_pnl(BOOK, scenarios=sc, payoff="asian_call",
                            method="oracle")
