"""Curve-fitted Hull-White: exact cross-oracle identities, curve
repricing, and the swaption-strip exposure gate."""

import math

import numpy as np
import pytest

from mc_tpu import SimParams, oracle
from mc_tpu.models.hullwhite import (DEMO_CURVE, DEMO_HW, DiscountCurve,
                                     HullWhiteDynamics, hw_swap_exposure,
                                     price_hw_swaption)
from mc_tpu.models.swaption import SwaptionSpec

SPEC = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=10, k_rate=0.04)


def _ref(spec, payer=True):
    return oracle.hw_swaption(DEMO_HW.a, DEMO_HW.sigma_r, DEMO_CURVE.df,
                              spec.expiry, spec.tenor, spec.n_payments,
                              spec.k_rate, payer=payer)


def test_oracle_equals_vasicek_on_the_vasicek_curve():
    """Hull-White fitted to the curve a Vasicek model GENERATES is that
    Vasicek model — the Jamshidian prices must agree to machine
    precision (the sharpest possible oracle cross-check)."""
    a, b, sig, r0 = 0.3, 0.05, 0.015, 0.05
    df = lambda t: oracle.vasicek_zcb(r0, a, b, sig, t) if t > 0 else 1.0
    for (t0, tau, n, k) in ((1.0, 0.5, 10, 0.05), (2.0, 0.25, 8, 0.06)):
        hw = oracle.hw_swaption(a, sig, df, t0, tau, n, k)
        va = oracle.vasicek_swaption(r0, a, b, sig, t0, tau, n, k)
        assert hw == pytest.approx(va, rel=1e-12)
        hw_r = oracle.hw_swaption(a, sig, df, t0, tau, n, k, payer=False)
        va_r = oracle.vasicek_swaption(r0, a, b, sig, t0, tau, n, k,
                                       payer=False)
        assert hw_r == pytest.approx(va_r, rel=1e-12)


def test_mc_matches_jamshidian_on_the_sloped_curve():
    r = price_hw_swaption(SPEC, DEMO_HW, DEMO_CURVE,
                          SimParams(n_paths=1 << 19, n_steps=1))
    z = (float(r.price) - _ref(SPEC)) / float(r.stderr)
    assert abs(z) < 4.0, (float(r.price), _ref(SPEC), z)


def test_receiver_matches_oracle():
    spec = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=10,
                        k_rate=0.04, payer=False)
    r = price_hw_swaption(spec, DEMO_HW, DEMO_CURVE,
                          SimParams(n_paths=1 << 19, n_steps=1))
    z = (float(r.price) - _ref(spec, payer=False)) / float(r.stderr)
    assert abs(z) < 4.0


def test_sigma_zero_is_the_curve_intrinsic():
    """sigma -> 0: rates are the curve's forwards, so the swaption is
    the discounted forward-swap intrinsic read STRAIGHT off the input
    discounts — an exact deterministic identity."""
    dyn0 = HullWhiteDynamics(a=0.3, sigma_r=1e-7)
    r = price_hw_swaption(SPEC, dyn0, DEMO_CURVE,
                          SimParams(n_paths=4096, n_steps=1))
    dfs = [DEMO_CURVE.df(1.0 + 0.5 * j) for j in range(11)]
    det = max(dfs[0] - dfs[10] - 0.04 * 0.5 * sum(dfs[1:11]), 0.0)
    assert float(r.price) == pytest.approx(det, abs=2e-6)


def test_model_reprices_the_input_curve():
    """The theta(t) fit's defining property: E[pathwise discount-to-0]
    equals P(0, t_i) at EVERY coupon date (the c(t) = Var[int x]/2
    correction makes this exact in expectation; gated at 4 se)."""
    import jax.numpy as jnp

    from mc_tpu import rng
    from mc_tpu.models.hullwhite import _hw_tables
    from mc_tpu.models.swaption import _simulate_rate_grid
    p0, c, _, _ = _hw_tables(SPEC, DEMO_HW, DEMO_CURVE)
    key = jnp.asarray(rng.derive_key(1234, 0, 0x4877), jnp.uint32)
    n = 1 << 17
    _, yg = _simulate_rate_grid(SPEC, jnp.float32(DEMO_HW.a),
                                jnp.float32(0.0),
                                jnp.float32(DEMO_HW.sigma_r),
                                jnp.float32(0.0), n, 10, key)
    for i in (0, 4, 9):
        d = np.asarray(jnp.exp(-yg[i] - jnp.float32(c[i])),
                       np.float64) * p0[i]
        se = d.std() / math.sqrt(n)
        assert abs(d.mean() - p0[i]) < 4.0 * se + 1e-6, (i, d.mean(),
                                                         p0[i])


def test_exposure_profile_is_the_hw_swaption_strip():
    """EE at date i = the curve-consistent Jamshidian swaption expiring
    at t_i on the REMAINING n_payments - i payments — every point of
    the profile has a closed form."""
    e = hw_swap_exposure(SPEC, DEMO_HW, DEMO_CURVE,
                         SimParams(n_paths=1 << 17, n_steps=1))
    ee, _ = e.exposure_profile()
    for i in (0, 3, 6):
        t_i = SPEC.expiry + i * SPEC.tenor
        ref = oracle.hw_swaption(DEMO_HW.a, DEMO_HW.sigma_r,
                                 DEMO_CURVE.df, t_i, SPEC.tenor,
                                 SPEC.n_payments - i, SPEC.k_rate)
        assert float(ee[i]) == pytest.approx(ref, abs=4e-4), (i, ref)


def test_exposure_xva_metrics_compose():
    e = hw_swap_exposure(SPEC, DEMO_HW, DEMO_CURVE,
                         SimParams(n_paths=1 << 14, n_steps=1))
    flat = float(e.cva(0.02))
    assert flat > 0.0
    assert float(e.cva_wwr(0.02, 2.0)) > flat  # rates up = ITM = WWR
    assert float(e.collateralized(0.005, mpor_steps=1).cva(0.02)) < flat


def test_curve_validation_and_interp():
    assert DEMO_CURVE.df(0.0) == 1.0
    # knots reproduced exactly
    for t, z in zip(DEMO_CURVE.times, DEMO_CURVE.zeros):
        assert DEMO_CURVE.df(t) == pytest.approx(math.exp(-z * t),
                                                 rel=1e-12)
    # flat extrapolation keeps forwards at the last zero rate
    d20 = DiscountCurve.flat(0.05).df(20.0)
    assert d20 == pytest.approx(math.exp(-0.05 * 20.0), rel=1e-12)
    with pytest.raises(ValueError, match="ascending"):
        DiscountCurve([1.0, 1.0], [0.02, 0.02])
    with pytest.raises(ValueError, match="> 0"):
        DiscountCurve([0.0, 1.0], [0.02, 0.02])


def test_calibrate_hullwhite_round_trip():
    """(a, sigma_r) recovered to machine precision from a 10-quote
    term structure of swaption prices generated by known dynamics
    (the expiry term structure identifies the a/sigma split)."""
    from mc_tpu.calibrate import calibrate_hullwhite
    quotes = []
    for (t0, tau, n) in ((0.5, 0.5, 6), (1.0, 0.5, 10), (2.0, 0.5, 8),
                         (3.0, 0.25, 12), (5.0, 0.5, 6)):
        for k in (0.035, 0.045):
            px = oracle.hw_swaption(0.3, 0.015, DEMO_CURVE.df, t0, tau,
                                    n, k)
            quotes.append((t0, tau, n, k, px))
    fit = calibrate_hullwhite(DEMO_CURVE, quotes, init=(0.05, 0.004))
    assert fit.a == pytest.approx(0.3, rel=1e-6)
    assert fit.sigma_r == pytest.approx(0.015, rel=1e-6)
    assert fit.rmse < 1e-10
    with pytest.raises(ValueError, match="quote"):
        calibrate_hullwhite(DEMO_CURVE, [])


def test_one_payment_bermudan_is_european_bitwise():
    from mc_tpu.models.hullwhite import price_bermudan_hw_swaption
    spec = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=1,
                        k_rate=0.04)
    sim = SimParams(n_paths=1 << 15, n_steps=1)
    eur = price_hw_swaption(spec, DEMO_HW, DEMO_CURVE, sim)
    ber = price_bermudan_hw_swaption(spec, DEMO_HW, DEMO_CURVE, sim)
    assert float(ber.price) == float(eur.price)


def test_bermudan_dominates_european_on_the_curve():
    from mc_tpu.models.hullwhite import price_bermudan_hw_swaption
    sim = SimParams(n_paths=1 << 16, n_steps=1)
    ber = price_bermudan_hw_swaption(SPEC, DEMO_HW, DEMO_CURVE, sim)
    assert float(ber.price) >= _ref(SPEC) - 3.0 * float(ber.stderr)


def test_bermudan_deterministic_limit_on_the_curve():
    """sigma -> 0: the Bermudan is the max over exercise dates of the
    curve's discounted forward-swap intrinsics — pure curve arithmetic,
    exact."""
    from mc_tpu.models.hullwhite import price_bermudan_hw_swaption
    dyn0 = HullWhiteDynamics(a=0.3, sigma_r=1e-7)
    ber = price_bermudan_hw_swaption(SPEC, dyn0, DEMO_CURVE,
                                     SimParams(n_paths=4096, n_steps=1))
    best = 0.0
    for i in range(SPEC.n_payments):
        t_i = SPEC.expiry + i * SPEC.tenor
        n_rem = SPEC.n_payments - i
        dfs = [DEMO_CURVE.df(t_i + SPEC.tenor * j)
               for j in range(n_rem + 1)]
        intr = max(dfs[0] - dfs[-1]
                   - SPEC.k_rate * SPEC.tenor * sum(dfs[1:]), 0.0)
        best = max(best, intr)
    assert float(ber.price) == pytest.approx(best, abs=3e-6)


def test_qmc_hw_swaption_oracle_and_variance_reduction():
    """2-dim Sobol on the exact (x, int x) draw: matches the
    curve-consistent Jamshidian within its (tiny) stderr and beats
    plain MC's stderr by >20x at the SAME total budget."""
    from mc_tpu.models.hullwhite import price_hw_swaption_qmc
    q = price_hw_swaption_qmc(SPEC, DEMO_HW, DEMO_CURVE,
                              SimParams(n_paths=1 << 14, n_steps=1))
    ref = _ref(SPEC)
    assert abs(float(q.price) - ref) <= 5.0 * float(q.stderr) + 1e-6
    m = price_hw_swaption(SPEC, DEMO_HW, DEMO_CURVE,
                          SimParams(n_paths=(1 << 14) * 16, n_steps=1))
    assert float(q.stderr) < float(m.stderr) / 20.0
    with pytest.raises(ValueError, match="n_shifts"):
        price_hw_swaption_qmc(n_shifts=1)


def test_bermudan_bounds_bracket_on_the_curve():
    """AB bracket of the curve Bermudan: lower BITWISE == the LSMC
    pricer (shared stream + fit), upper above it with a small gap, and
    the 1-payment case collapses bitwise to the European."""
    from mc_tpu.models.hullwhite import (bermudan_hw_swaption_bounds,
                                         price_bermudan_hw_swaption)
    sim = SimParams(n_paths=1 << 13, n_steps=1)
    lo, up = bermudan_hw_swaption_bounds(SPEC, DEMO_HW, DEMO_CURVE, sim,
                                         n_branch=16)
    ber = price_bermudan_hw_swaption(SPEC, DEMO_HW, DEMO_CURVE, sim)
    assert float(lo.price) == float(ber.price)
    assert float(up.price) >= float(lo.price)
    assert float(up.price) - float(lo.price) < 0.10 * float(lo.price)
    assert float(up.price) + 3 * float(up.stderr) >= _ref(SPEC)
    spec1 = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=1,
                         k_rate=0.04)
    l1, u1 = bermudan_hw_swaption_bounds(spec1, DEMO_HW, DEMO_CURVE,
                                         sim, n_branch=2)
    eur = price_hw_swaption(spec1, DEMO_HW, DEMO_CURVE, sim)
    assert float(l1.price) == float(eur.price)
    assert float(u1.price) == float(eur.price)


def test_bermudan_exposure_telescopes_on_the_curve():
    """Exercise absorbs: EE nonincreasing, anchored at the Bermudan
    (policy) price on the curve; XVA metrics compose."""
    from mc_tpu.models.hullwhite import (bermudan_hw_swaption_exposure,
                                         price_bermudan_hw_swaption)
    e = bermudan_hw_swaption_exposure(
        SPEC, DEMO_HW, DEMO_CURVE,
        SimParams(n_paths=4096, n_steps=1, n_paths_inner=16))
    ee, _ = e.exposure_profile()
    ee = np.asarray(ee)
    assert np.all(np.diff(ee) <= 1e-5), ee
    ber = price_bermudan_hw_swaption(SPEC, DEMO_HW, DEMO_CURVE,
                                     SimParams(n_paths=1 << 16,
                                               n_steps=1))
    assert abs(float(ee[0]) - float(ber.price)) \
        <= 0.02 * float(ber.price)
    assert float(e.cva(0.02)) > 0.0


def test_dynamics_validation():
    with pytest.raises(ValueError, match="mean reversion"):
        price_hw_swaption(SPEC, HullWhiteDynamics(a=0.0), DEMO_CURVE,
                          SimParams(n_paths=128, n_steps=1))
    with pytest.raises(ValueError, match="sigma_r"):
        price_hw_swaption(SPEC, HullWhiteDynamics(sigma_r=-0.1),
                          DEMO_CURVE, SimParams(n_paths=128, n_steps=1))


def test_multicurve_oracle_and_mc():
    """Multi-curve (OIS-discounted) swaptions: the direct-quadrature
    oracle reproduces Jamshidian at zero basis (proj == disc), a +25bp
    projection spread raises the payer, and the MC matches the oracle
    under the spread."""
    proj = DiscountCurve(DEMO_CURVE.times,
                         np.asarray(DEMO_CURVE.zeros) + 0.0025)
    jam = _ref(SPEC)
    quad0 = oracle.hw_swaption_multicurve(
        DEMO_HW.a, DEMO_HW.sigma_r, DEMO_CURVE.df, DEMO_CURVE.df,
        SPEC.expiry, SPEC.tenor, SPEC.n_payments, SPEC.k_rate)
    assert quad0 == pytest.approx(jam, rel=1e-6)
    ref = oracle.hw_swaption_multicurve(
        DEMO_HW.a, DEMO_HW.sigma_r, DEMO_CURVE.df, proj.df,
        SPEC.expiry, SPEC.tenor, SPEC.n_payments, SPEC.k_rate)
    assert ref > jam  # bigger forwards = richer payer
    r = price_hw_swaption(SPEC, DEMO_HW, DEMO_CURVE,
                          SimParams(n_paths=1 << 19, n_steps=1),
                          projection_curve=proj)
    z = (float(r.price) - ref) / float(r.stderr)
    assert abs(z) < 4.0, (float(r.price), ref, z)
    # MC at zero basis agrees with the single-curve pricer pathwise
    # (same draws, algebraically identical weights) to fp tolerance
    r0 = price_hw_swaption(SPEC, DEMO_HW, DEMO_CURVE,
                           SimParams(n_paths=1 << 15, n_steps=1),
                           projection_curve=DEMO_CURVE)
    r1 = price_hw_swaption(SPEC, DEMO_HW, DEMO_CURVE,
                           SimParams(n_paths=1 << 15, n_steps=1))
    assert float(r0.price) == pytest.approx(float(r1.price), rel=2e-5)


def test_multicurve_exposure_strip():
    """EE under the basis spread == the multi-curve oracle strip (the
    per-date identity survives the dual-curve algebra)."""
    proj = DiscountCurve(DEMO_CURVE.times,
                         np.asarray(DEMO_CURVE.zeros) + 0.0025)
    e = hw_swap_exposure(SPEC, DEMO_HW, DEMO_CURVE,
                         SimParams(n_paths=1 << 17, n_steps=1),
                         projection_curve=proj)
    ee, _ = e.exposure_profile()
    for i in (0, 3, 6):
        t_i = SPEC.expiry + i * SPEC.tenor
        ref = oracle.hw_swaption_multicurve(
            DEMO_HW.a, DEMO_HW.sigma_r, DEMO_CURVE.df, proj.df, t_i,
            SPEC.tenor, SPEC.n_payments - i, SPEC.k_rate)
        assert float(ee[i]) == pytest.approx(ref, abs=5e-4), (i, ref)


def test_hw_swap_cva_greeks_match_strip_fd():
    """CRN-FD CVA sensitivities on the curve: gated against central
    differences of the closed-form HW swaption-strip CVA (the mixin's
    PD weights replicated; curve_dv01 is per +1bp parallel shift)."""
    from mc_tpu.models.hullwhite import hw_swap_cva_greeks
    LAM = 0.02
    sim = SimParams(n_paths=1 << 16, n_steps=1)
    g = hw_swap_cva_greeks(SPEC, DEMO_HW, DEMO_CURVE, sim,
                           hazard_rate=LAM,
                           which=("curve_dv01", "vega_r"))

    def strip_cva(curve_bump=0.0, sig=DEMO_HW.sigma_r):
        cv = (DEMO_CURVE if curve_bump == 0.0 else
              DiscountCurve(DEMO_CURVE.times,
                            np.asarray(DEMO_CURVE.zeros) + curve_bump))
        n = SPEC.n_payments
        # TRUE coupon observation dates expiry + i*tenor (the exposure
        # matrix's obs_dates), NOT the uniform grid j*T/n — the round-4
        # fix for the default-leg date misallocation (ADVICE r03).
        t = SPEC.expiry + np.arange(n) * SPEC.tenor
        tp = np.concatenate([[0.0], t[:-1]])
        dpd = np.exp(-LAM * tp) - np.exp(-LAM * t)
        ee = [oracle.hw_swaption(DEMO_HW.a, sig, cv.df,
                                 SPEC.expiry + i * SPEC.tenor,
                                 SPEC.tenor, n - i, SPEC.k_rate)
              for i in range(n)]
        return 0.6 * sum(e * d for e, d in zip(ee, dpd))

    h = 1e-4
    fd_dv01 = (strip_cva(h) - strip_cva(-h)) / (2 * h) * 1e-4
    fd_vega = (strip_cva(sig=DEMO_HW.sigma_r + h)
               - strip_cva(sig=DEMO_HW.sigma_r - h)) / (2 * h)
    assert float(g["curve_dv01"]) == pytest.approx(fd_dv01, rel=2e-2)
    assert float(g["vega_r"]) == pytest.approx(fd_vega, rel=2e-2)
    assert float(g["vega_r"]) > 0.0
    with pytest.raises(ValueError, match="unknown greeks"):
        hw_swap_cva_greeks(hazard_rate=LAM, which=("charm",))


def test_sharded_hw_swaption_mesh_invariance():
    """Global-id streams + psum'd normal equations: a 1-device mesh
    simulates the identical path set (the mean differs from the
    single-chip program only by XLA reduction order, <= 3e-7 rel); the
    8-device mesh agrees to summation-order noise."""
    import jax

    from mc_tpu.models.hullwhite import (price_bermudan_hw_swaption,
                                         price_hw_swaption_sharded)
    from mc_tpu.parallel import make_mesh
    sim = SimParams(n_paths=1 << 15, n_steps=1)
    for style, solo_fn in (("european", price_hw_swaption),
                           ("bermudan", price_bermudan_hw_swaption)):
        solo = solo_fn(SPEC, DEMO_HW, DEMO_CURVE, sim)
        m1 = price_hw_swaption_sharded(SPEC, DEMO_HW, DEMO_CURVE, sim,
                                       style=style,
                                       mesh=make_mesh(jax.devices()[:1]))
        m8 = price_hw_swaption_sharded(SPEC, DEMO_HW, DEMO_CURVE, sim,
                                       style=style, mesh=make_mesh())
        assert abs(float(m1.price) - float(solo.price)) \
            <= 3e-7 * max(float(solo.price), 1e-9), style
        assert abs(float(m8.price) - float(solo.price)) \
            <= 1e-4 * max(float(solo.price), 1e-9), style


def test_swap_netting_set_on_the_curve():
    """The netted value matrix is BITWISE the weighted sum of the
    standalone exposures (one shared rate grid, affine MtMs), yet the
    netted EE is strictly below the sum of standalone EEs when the
    swaps offset — the portfolio effect netting exists to capture."""
    from mc_tpu.models.hullwhite import hw_swap_book_exposure
    sim = SimParams(n_paths=1 << 14, n_steps=1)
    pay = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=10,
                       k_rate=0.04)
    rec = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=6,
                       k_rate=0.045, payer=False)
    book = hw_swap_book_exposure([pay, rec], DEMO_HW, DEMO_CURVE, sim,
                                 weights=[1.0, 2.0])
    a = hw_swap_exposure(pay, DEMO_HW, DEMO_CURVE, sim)
    b = hw_swap_exposure(rec, DEMO_HW, DEMO_CURVE, sim)
    va = np.asarray(a.values)
    vb = np.zeros_like(np.asarray(book.values))
    vb[:, :6] = np.asarray(b.values)
    assert np.array_equal(np.asarray(book.values),
                          np.float32(va + 2.0 * np.float32(vb)))
    ee_net = np.asarray(book.exposure_profile()[0])
    ee_sum = (np.asarray(a.exposure_profile()[0])
              + 2.0 * np.concatenate([
                  np.asarray(b.exposure_profile()[0]), np.zeros(4)]))
    assert np.all(ee_net <= ee_sum + 1e-7)
    assert ee_net[0] < ee_sum[0]  # opposite sides genuinely offset
    assert float(book.cva(0.02)) > 0.0
    with pytest.raises(ValueError, match="share expiry"):
        hw_swap_book_exposure([pay, SwaptionSpec(expiry=2.0)])
    with pytest.raises(ValueError, match="weights"):
        hw_swap_book_exposure([pay], weights=[1.0, 2.0])


def test_equity_hybrid_on_the_curve():
    """GBM + curve-fitted stochastic rates: the MC matches the
    Merton-73-on-the-curve oracle; the oracle equals bsv_call EXACTLY
    on a Vasicek-generated curve (the integrated variance never sees
    the rate drift); sigma_r -> 0 collapses to Black-76 on the curve
    forward; CRN put-call parity holds within MC noise."""
    from mc_tpu.models.hullwhite import price_hw_equity
    from mc_tpu import OptionParams
    opt = OptionParams()
    r = price_hw_equity(opt, DEMO_HW, DEMO_CURVE,
                        SimParams(n_paths=1 << 19, n_steps=1),
                        rho=-0.3)
    ref = oracle.hw_equity_call(100, 100, 1.0, 0.2, DEMO_HW.a,
                                DEMO_HW.sigma_r, -0.3, DEMO_CURVE.df)
    z = (float(r.price) - ref) / float(r.stderr)
    assert abs(z) < 4.0, (float(r.price), ref, z)
    # exact cross-oracle on the Vasicek curve
    df_v = (lambda t: oracle.vasicek_zcb(0.05, 0.3, 0.05, 0.015, t)
            if t > 0 else 1.0)
    hv = oracle.hw_equity_call(100, 100, 1.0, 0.2, 0.3, 0.015, -0.3,
                               df_v)
    bv = oracle.bsv_call(100, 100, 1.0, 0.05, 0.2, 0.3, 0.05, 0.015,
                         -0.3)
    assert hv == pytest.approx(float(bv), rel=1e-9)
    # sigma_r -> 0: Black on the curve forward
    r0 = oracle.hw_equity_call(100, 100, 1.0, 0.2, 0.3, 1e-9, 0.0,
                               DEMO_CURVE.df)
    p0t = DEMO_CURVE.df(1.0)
    sig = 0.2
    d1 = (math.log(100.0 / (100.0 * p0t)) + 0.5 * sig * sig) / sig
    blk = 100.0 * oracle_cnd(d1) - 100.0 * p0t * oracle_cnd(d1 - sig)
    assert r0 == pytest.approx(blk, rel=1e-9)
    # CRN parity
    sim = SimParams(n_paths=1 << 16, n_steps=1)
    c = price_hw_equity(opt, DEMO_HW, DEMO_CURVE, sim, "call", rho=-0.3)
    p = price_hw_equity(opt, DEMO_HW, DEMO_CURVE, sim, "put", rho=-0.3)
    par = 100.0 - 100.0 * p0t
    joint = (float(c.stderr) ** 2 + float(p.stderr) ** 2) ** 0.5
    assert abs(float(c.price) - float(p.price) - par) <= 4.0 * joint
    with pytest.raises(ValueError, match="payoff"):
        price_hw_equity(opt, payoff="digital")
    with pytest.raises(ValueError, match="rho"):
        price_hw_equity(opt, rho=2.0)


def oracle_cnd(x):
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def test_bootstrap_from_par_swaps_round_trip():
    """Par rates generated from a known curve are recovered: the
    bootstrapped curve reprices every quote (swap PV = 0) to ~1e-12
    and matches the source discounts on the quote grid."""
    from mc_tpu.models.hullwhite import DiscountCurve
    tenor = 0.5
    mats = np.array([0.5, 1.0, 2.0, 3.0, 5.0])

    def par_rate(curve, t_m):
        n = int(round(t_m / tenor))
        dfs = [curve.df(tenor * j) for j in range(1, n + 1)]
        return (1.0 - dfs[-1]) / (tenor * sum(dfs))

    pars = [par_rate(DEMO_CURVE, m) for m in mats]
    boot = DiscountCurve.from_par_swaps(mats, pars, tenor=tenor)
    for m, s in zip(mats, pars):
        # quote repriced: par swap PV == 0 on the bootstrapped curve
        assert par_rate(boot, m) == pytest.approx(s, rel=1e-12)
    # discounts match the source curve AT the quote maturities (between
    # quotes the interpolation conventions legitimately differ)
    for m in mats:
        assert boot.df(m) == pytest.approx(DEMO_CURVE.df(m), rel=5e-4)
    with pytest.raises(ValueError, match="tenor grid"):
        DiscountCurve.from_par_swaps([0.7], [0.03], tenor=0.5)
    with pytest.raises(ValueError, match="ascending"):
        DiscountCurve.from_par_swaps([1.0, 1.0], [0.03, 0.03])


def test_hw_swaption_greeks_match_oracle_fd():
    """CRN-FD price sensitivities on the curve: European curve_dv01 and
    vega_r vs central differences of the Jamshidian closed form; the
    Bermudan's greeks are finite with dv01 at/above the European's (the
    option to wait adds curve sensitivity here: later exercise dates
    load more of the curve)."""
    from mc_tpu.models.hullwhite import hw_swaption_greeks
    sim = SimParams(n_paths=1 << 17, n_steps=1)
    g = hw_swaption_greeks(SPEC, DEMO_HW, DEMO_CURVE, sim,
                           which=("curve_dv01", "vega_r"))

    def jam(bump=0.0, sig=DEMO_HW.sigma_r):
        cv = (DEMO_CURVE if bump == 0.0 else
              DiscountCurve(DEMO_CURVE.times,
                            np.asarray(DEMO_CURVE.zeros) + bump))
        return oracle.hw_swaption(DEMO_HW.a, sig, cv.df, SPEC.expiry,
                                  SPEC.tenor, SPEC.n_payments,
                                  SPEC.k_rate)

    h = 1e-4
    fd_dv01 = (jam(h) - jam(-h)) / (2 * h) * 1e-4
    fd_vega = (jam(sig=DEMO_HW.sigma_r + h)
               - jam(sig=DEMO_HW.sigma_r - h)) / (2 * h)
    assert float(g["curve_dv01"]) == pytest.approx(fd_dv01, rel=2e-2)
    assert float(g["vega_r"]) == pytest.approx(fd_vega, rel=2e-2)
    gb = hw_swaption_greeks(SPEC, DEMO_HW, DEMO_CURVE,
                            SimParams(n_paths=1 << 15, n_steps=1),
                            style="bermudan", which=("curve_dv01",))
    assert np.isfinite(gb["curve_dv01"])
    with pytest.raises(ValueError, match="unknown greeks"):
        hw_swaption_greeks(which=("charm",))


def test_qmc_bermudan_on_the_curve():
    """Frozen-policy Sobol Bermudan on the curve: 1-payment BITWISE ==
    the European QMC; at 10 payments the value sits at/below the AB
    upper bound of the same fitted policy and the equal-budget stderr
    drops >4x (measured ~6.5x)."""
    from mc_tpu.models.hullwhite import (bermudan_hw_swaption_bounds,
                                         price_bermudan_hw_swaption,
                                         price_bermudan_hw_swaption_qmc,
                                         price_hw_swaption_qmc)
    s1 = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=1, k_rate=0.04)
    sim1 = SimParams(n_paths=1 << 12, n_steps=1)
    qb = price_bermudan_hw_swaption_qmc(s1, DEMO_HW, DEMO_CURVE, sim1)
    qe = price_hw_swaption_qmc(s1, DEMO_HW, DEMO_CURVE, sim1)
    assert float(qb.price) == float(qe.price)
    sim = SimParams(n_paths=1 << 13, n_steps=1)
    q = price_bermudan_hw_swaption_qmc(SPEC, DEMO_HW, DEMO_CURVE, sim,
                                       n_fit=8192)
    _, up = bermudan_hw_swaption_bounds(
        SPEC, DEMO_HW, DEMO_CURVE, SimParams(n_paths=8192, n_steps=1),
        n_branch=16)
    assert (float(q.price)
            <= float(up.price) + 4.0 * (float(q.stderr)
                                        + float(up.stderr)))
    plain = price_bermudan_hw_swaption(
        SPEC, DEMO_HW, DEMO_CURVE,
        SimParams(n_paths=(1 << 13) * 16, n_steps=1))
    joint = (float(q.stderr) ** 2 + float(plain.stderr) ** 2) ** 0.5
    assert abs(float(q.price) - float(plain.price)) <= 4.0 * joint + 2e-4
    assert float(plain.stderr) > 4.0 * float(q.stderr)


def test_qmc_shift_sharded_mesh_invariant():
    """Shift-sharded HW QMC: each chip runs the full Sobol point set
    for its shifts, so 1/2/8-device meshes and the single-chip program
    all agree BITWISE."""
    import jax

    from mc_tpu.models.hullwhite import price_hw_swaption_qmc
    from mc_tpu.parallel import make_mesh
    sim = SimParams(n_paths=1 << 12, n_steps=1)
    solo = price_hw_swaption_qmc(SPEC, DEMO_HW, DEMO_CURVE, sim,
                                 n_shifts=16)
    for k in (1, 2, 8):
        m = price_hw_swaption_qmc(SPEC, DEMO_HW, DEMO_CURVE, sim,
                                  n_shifts=16,
                                  mesh=make_mesh(jax.devices()[:k]))
        assert float(m.price) == float(solo.price), k
        assert float(m.stderr) == float(solo.stderr), k
    # n_shifts rounds up to a mesh multiple
    r = price_hw_swaption_qmc(SPEC, DEMO_HW, DEMO_CURVE, sim,
                              n_shifts=9, mesh=make_mesh())
    assert float(r.n_paths) == (1 << 12) * 16.0


def test_bucket_dv01_ladder_sums_localizes_and_matches_oracle():
    """Key-rate DV01 ladder: (a) the buckets SUM to the parallel
    curve_dv01 (a parallel shift is the sum of the knot bumps to first
    order — both FD at the same h, so agreement is tight), (b) the
    0.5y pillar carries EXACTLY zero (every coupon date is >= the 1y
    knot, and log-linear df interpolation never reads through it —
    risk localizes), (c) every material bucket matches per-knot FD of
    the Jamshidian oracle."""
    from mc_tpu.models.hullwhite import (hw_swaption_bucket_dv01,
                                         hw_swaption_greeks)
    sim = SimParams(n_paths=1 << 17, n_steps=1)
    b = hw_swaption_bucket_dv01(SPEC, DEMO_HW, DEMO_CURVE, sim)
    assert b.shape == DEMO_CURVE.times.shape
    g = hw_swaption_greeks(SPEC, DEMO_HW, DEMO_CURVE, sim,
                           which=("curve_dv01",))
    assert b.sum() == pytest.approx(float(g["curve_dv01"]), rel=1e-3)
    assert b[0] == 0.0

    def jam(k, h):
        z = np.array(DEMO_CURVE.zeros)
        z[k] += h
        cv = DiscountCurve(DEMO_CURVE.times, z)
        return oracle.hw_swaption(DEMO_HW.a, DEMO_HW.sigma_r, cv.df,
                                  SPEC.expiry, SPEC.tenor,
                                  SPEC.n_payments, SPEC.k_rate)

    h = 1e-4
    for k in range(len(DEMO_CURVE.times)):
        fd = (jam(k, h) - jam(k, -h)) / (2 * h) * 1e-4
        assert b[k] == pytest.approx(fd, rel=2e-2, abs=1e-8), k
    with pytest.raises(ValueError, match="european|bermudan"):
        hw_swaption_bucket_dv01(SPEC, style="american")


def test_bucket_dv01_bermudan_sums_to_parallel():
    """Frozen-key Bermudan ladder: finite everywhere and sums to the
    Bermudan parallel curve_dv01 under the same CRN-FD convention."""
    from mc_tpu.models.hullwhite import (hw_swaption_bucket_dv01,
                                         hw_swaption_greeks)
    sim = SimParams(n_paths=1 << 14, n_steps=1)
    b = hw_swaption_bucket_dv01(SPEC, DEMO_HW, DEMO_CURVE, sim,
                                style="bermudan")
    assert np.all(np.isfinite(b)) and b[0] == 0.0
    g = hw_swaption_greeks(SPEC, DEMO_HW, DEMO_CURVE, sim,
                           style="bermudan", which=("curve_dv01",))
    # 3%: single-knot bumps re-fit the policy independently, so a few
    # take/not-take flips per bump keep the sum from composing exactly
    # (measured 0.4% at 2^14, 7% at 2^13; the European ladder above
    # composes to 0.1%).
    assert b.sum() == pytest.approx(float(g["curve_dv01"]), rel=3e-2)
