"""Curve-fitted G2++ two-factor rates: oracle degeneracy to Hull-White,
tower/curve-repricing identities, and the swaption-strip exposure."""

import math

import numpy as np
import pytest

from mc_tpu import SimParams, oracle
from mc_tpu.models.g2pp import (DEMO_G2, G2Dynamics, g2_swap_exposure,
                                price_g2_swaption)
from mc_tpu.models.hullwhite import DEMO_CURVE
from mc_tpu.models.swaption import SwaptionSpec

SPEC = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=10, k_rate=0.04)


def _ref(spec, payer=True, dyn=DEMO_G2):
    return oracle.g2_swaption(dyn.a, dyn.sigma, dyn.b_mr, dyn.eta,
                              dyn.rho, DEMO_CURVE.df, spec.expiry,
                              spec.tenor, spec.n_payments, spec.k_rate,
                              payer=payer)


def test_oracle_degenerates_to_hull_white():
    """eta -> 0 kills the second factor: the conditional-Jamshidian
    two-factor price collapses to the one-factor Jamshidian (kink-robust
    trapezoid keeps the degenerate limit accurate to ~3e-6)."""
    for (t0, tau, n, k) in ((1.0, 0.5, 10, 0.04), (2.0, 0.25, 8, 0.05)):
        hw = oracle.hw_swaption(0.3, 0.015, DEMO_CURVE.df, t0, tau, n, k)
        g2 = oracle.g2_swaption(0.3, 0.015, 0.5, 1e-9, 0.0,
                                DEMO_CURVE.df, t0, tau, n, k)
        assert g2 == pytest.approx(hw, rel=5e-6), (t0, g2, hw)


def test_oracle_payer_receiver_parity_is_exact():
    """payer - receiver == the curve's forward-swap value (the integral
    construction conserves the swap identically, ~1e-16)."""
    g2p = _ref(SPEC)
    g2r = _ref(SPEC, payer=False)
    dfs = [DEMO_CURVE.df(1.0 + 0.5 * j) for j in range(11)]
    swap = dfs[0] - dfs[10] - 0.04 * 0.5 * sum(dfs[1:11])
    assert g2p - g2r == pytest.approx(swap, abs=1e-12)


def test_second_factor_adds_value():
    """An imperfectly-correlated second factor adds volatility the
    one-factor projection misses — the ATM-ish swaption is worth more
    than with eta = 0 (all else equal)."""
    base = oracle.g2_swaption(DEMO_G2.a, DEMO_G2.sigma, DEMO_G2.b_mr,
                              1e-9, 0.0, DEMO_CURVE.df, 1.0, 0.5, 10,
                              0.045)
    two = oracle.g2_swaption(DEMO_G2.a, DEMO_G2.sigma, DEMO_G2.b_mr,
                             DEMO_G2.eta, 0.0, DEMO_CURVE.df, 1.0, 0.5,
                             10, 0.045)
    assert two > base


def test_mc_matches_the_oracle():
    r = price_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE,
                          SimParams(n_paths=1 << 19, n_steps=1))
    z = (float(r.price) - _ref(SPEC)) / float(r.stderr)
    assert abs(z) < 4.0, (float(r.price), _ref(SPEC), z)


def test_receiver_mc_matches_the_oracle():
    spec = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=10,
                        k_rate=0.04, payer=False)
    r = price_g2_swaption(spec, DEMO_G2, DEMO_CURVE,
                          SimParams(n_paths=1 << 19, n_steps=1))
    z = (float(r.price) - _ref(spec, payer=False)) / float(r.stderr)
    assert abs(z) < 4.0


def test_curve_repricing_and_bond_tower():
    """Two exact identities of the simulation + reconstruction pair:
    E[pathwise discount-to-0] == P(0, t_i), and the TOWER property
    E[D(0, t_i) P(t_i, t_j; x, y)] == P(0, t_j) — the sharpest check
    that the A(t,S) exponent and the (x, y, int) covariances agree."""
    import jax.numpy as jnp

    from mc_tpu import rng
    from mc_tpu.models.g2pp import _g2_tables, _simulate_g2_grid
    p0, vhalf, amat, bamat, bbmat = _g2_tables(SPEC, DEMO_G2, DEMO_CURVE)
    key = jnp.asarray(rng.derive_key(1234, 0, 0x6270), jnp.uint32)
    n = 1 << 16
    grid = _simulate_g2_grid(SPEC, DEMO_G2, n, 10, key)
    for i, j in ((0, 3), (4, 7), (9, 10)):
        x, y, z = grid[i]
        disc = np.asarray(jnp.exp(-z - jnp.float32(vhalf[i])),
                          np.float64) * p0[i]
        se = disc.std() / math.sqrt(n)
        assert abs(disc.mean() - p0[i]) < 4.0 * se + 1e-6
        pij = np.asarray(
            jnp.float32(p0[j] / p0[i])
            * jnp.exp(jnp.float32(amat[i, j])
                      - jnp.float32(bamat[i, j]) * x
                      - jnp.float32(bbmat[i, j]) * y), np.float64)
        v = disc * pij
        se_t = v.std() / math.sqrt(n)
        assert abs(v.mean() - p0[j]) < 4.0 * se_t + 1e-6, (i, j)


def test_exposure_profile_is_the_g2_swaption_strip():
    e = g2_swap_exposure(SPEC, DEMO_G2, DEMO_CURVE,
                         SimParams(n_paths=1 << 17, n_steps=1))
    ee, _ = e.exposure_profile()
    for i in (0, 3, 6):
        t_i = SPEC.expiry + i * SPEC.tenor
        ref = oracle.g2_swaption(DEMO_G2.a, DEMO_G2.sigma, DEMO_G2.b_mr,
                                 DEMO_G2.eta, DEMO_G2.rho,
                                 DEMO_CURVE.df, t_i, SPEC.tenor,
                                 SPEC.n_payments - i, SPEC.k_rate)
        assert float(ee[i]) == pytest.approx(ref, abs=4e-4), (i, ref)


def test_exposure_xva_metrics_compose():
    e = g2_swap_exposure(SPEC, DEMO_G2, DEMO_CURVE,
                         SimParams(n_paths=1 << 14, n_steps=1))
    flat = float(e.cva(0.02))
    assert flat > 0.0
    assert float(e.cva_wwr(0.02, 2.0)) > flat
    assert float(e.collateralized(0.005, mpor_steps=1).cva(0.02)) < flat


def test_one_payment_bermudan_is_european_bitwise():
    from mc_tpu.models.g2pp import price_bermudan_g2_swaption
    spec = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=1,
                        k_rate=0.04)
    sim = SimParams(n_paths=1 << 15, n_steps=1)
    eur = price_g2_swaption(spec, DEMO_G2, DEMO_CURVE, sim)
    ber = price_bermudan_g2_swaption(spec, DEMO_G2, DEMO_CURVE, sim)
    assert float(ber.price) == float(eur.price)


def test_bermudan_dominates_european_and_matches_hw_in_the_limit():
    """The two-factor Bermudan beats its European, and with the second
    factor switched off it agrees with the ONE-factor Hull-White
    Bermudan within joint stderr (independent machinery, same model)."""
    from mc_tpu.models.g2pp import price_bermudan_g2_swaption
    from mc_tpu.models.hullwhite import (HullWhiteDynamics,
                                         price_bermudan_hw_swaption)
    sim = SimParams(n_paths=1 << 16, n_steps=1)
    ber = price_bermudan_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE, sim)
    assert float(ber.price) >= _ref(SPEC) - 3.0 * float(ber.stderr)
    d0 = G2Dynamics(a=0.3, sigma=0.015, b_mr=0.5, eta=1e-9, rho=0.0)
    b2 = price_bermudan_g2_swaption(SPEC, d0, DEMO_CURVE, sim)
    b1 = price_bermudan_hw_swaption(
        SPEC, HullWhiteDynamics(a=0.3, sigma_r=0.015), DEMO_CURVE, sim)
    joint = (float(b2.stderr) ** 2 + float(b1.stderr) ** 2) ** 0.5
    assert abs(float(b2.price) - float(b1.price)) <= 4.0 * joint + 2e-5


def test_calibrate_g2_reprices_in_and_out_of_sample():
    """G2's five parameters sit on near-flat ridges (an exact
    (a, sigma) <-> (b_mr, eta) relabeling symmetry among them), so the
    honest calibration gate is REPRICING: the fit must reproduce the
    quote set to ~1e-6 and price an OUT-OF-SAMPLE swaption (expiry and
    tenor not in the set) at the true model's value."""
    from mc_tpu.calibrate import calibrate_g2
    true = (0.5, 0.01, 0.05, 0.008, -0.7)
    quotes = []
    for t0 in (0.5, 1.0, 3.0):
        for (tau, n) in ((0.5, 10), (0.5, 4), (1.0, 7)):
            for k in (0.035, 0.05):
                px = oracle.g2_swaption(*true, DEMO_CURVE.df, t0, tau,
                                        n, k, n_quad=801)
                quotes.append((t0, tau, n, k, px))
    fit = calibrate_g2(DEMO_CURVE, quotes, n_iter=80)
    assert fit.rmse < 1e-7, fit
    oos_true = oracle.g2_swaption(*true, DEMO_CURVE.df, 2.0, 0.25, 8,
                                  0.045)
    oos_fit = oracle.g2_swaption(fit.a, fit.sigma, fit.b_mr, fit.eta,
                                 fit.rho, DEMO_CURVE.df, 2.0, 0.25, 8,
                                 0.045)
    assert oos_fit == pytest.approx(oos_true, abs=2e-5)
    with pytest.raises(ValueError, match="5"):
        calibrate_g2(DEMO_CURVE, quotes[:3])


def test_bermudan_bounds_bracket_two_factor():
    """AB bracket of the two-factor curve Bermudan via the shared
    running max: lower BITWISE == the LSMC pricer, tight gap, and the
    1-payment bracket collapses bitwise to the European."""
    from mc_tpu.models.g2pp import (bermudan_g2_swaption_bounds,
                                    price_bermudan_g2_swaption)
    sim = SimParams(n_paths=1 << 13, n_steps=1)
    lo, up = bermudan_g2_swaption_bounds(SPEC, DEMO_G2, DEMO_CURVE, sim,
                                         n_branch=16)
    ber = price_bermudan_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE, sim)
    assert float(lo.price) == float(ber.price)
    assert float(up.price) >= float(lo.price)
    assert float(up.price) - float(lo.price) < 0.10 * float(lo.price)
    spec1 = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=1,
                         k_rate=0.04)
    l1, u1 = bermudan_g2_swaption_bounds(spec1, DEMO_G2, DEMO_CURVE,
                                         sim, n_branch=2)
    eur = price_g2_swaption(spec1, DEMO_G2, DEMO_CURVE, sim)
    assert float(l1.price) == float(eur.price)
    assert float(u1.price) == float(eur.price)


def test_bermudan_exposure_telescopes_two_factor():
    from mc_tpu.models.g2pp import (bermudan_g2_swaption_exposure,
                                    price_bermudan_g2_swaption)
    e = bermudan_g2_swaption_exposure(
        SPEC, DEMO_G2, DEMO_CURVE,
        SimParams(n_paths=4096, n_steps=1, n_paths_inner=16))
    ee, _ = e.exposure_profile()
    ee = np.asarray(ee)
    assert np.all(np.diff(ee) <= 1e-5), ee
    ber = price_bermudan_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE,
                                     SimParams(n_paths=1 << 16,
                                               n_steps=1))
    assert abs(float(ee[0]) - float(ber.price)) \
        <= 0.02 * float(ber.price)
    assert float(e.cva(0.02)) > 0.0


def test_dynamics_validation():
    sim = SimParams(n_paths=128, n_steps=1)
    with pytest.raises(ValueError, match="mean reversions"):
        price_g2_swaption(SPEC, G2Dynamics(a=-0.1), DEMO_CURVE, sim)
    with pytest.raises(ValueError, match="vols"):
        price_g2_swaption(SPEC, G2Dynamics(eta=-0.1), DEMO_CURVE, sim)
    with pytest.raises(ValueError, match="rho"):
        price_g2_swaption(SPEC, G2Dynamics(rho=-1.5), DEMO_CURVE, sim)


def test_multicurve_two_factor():
    """Multi-curve under G2++: 2-D quadrature oracle reproduces the
    conditional-Jamshidian at zero basis; the MC matches the oracle
    under a +25bp projection spread; the EE strip holds per date."""
    from mc_tpu.models.hullwhite import DiscountCurve
    proj = DiscountCurve(DEMO_CURVE.times,
                         np.asarray(DEMO_CURVE.zeros) + 0.0025)
    one = _ref(SPEC)
    quad0 = oracle.g2_swaption_multicurve(
        DEMO_G2.a, DEMO_G2.sigma, DEMO_G2.b_mr, DEMO_G2.eta, DEMO_G2.rho,
        DEMO_CURVE.df, DEMO_CURVE.df, SPEC.expiry, SPEC.tenor,
        SPEC.n_payments, SPEC.k_rate)
    assert quad0 == pytest.approx(one, rel=1e-6)
    ref = oracle.g2_swaption_multicurve(
        DEMO_G2.a, DEMO_G2.sigma, DEMO_G2.b_mr, DEMO_G2.eta, DEMO_G2.rho,
        DEMO_CURVE.df, proj.df, SPEC.expiry, SPEC.tenor,
        SPEC.n_payments, SPEC.k_rate)
    assert ref > one
    r = price_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE,
                          SimParams(n_paths=1 << 19, n_steps=1),
                          projection_curve=proj)
    z = (float(r.price) - ref) / float(r.stderr)
    assert abs(z) < 4.0, (float(r.price), ref, z)
    e = g2_swap_exposure(SPEC, DEMO_G2, DEMO_CURVE,
                         SimParams(n_paths=1 << 16, n_steps=1),
                         projection_curve=proj)
    ee, _ = e.exposure_profile()
    for i in (0, 4):
        t_i = SPEC.expiry + i * SPEC.tenor
        ref_i = oracle.g2_swaption_multicurve(
            DEMO_G2.a, DEMO_G2.sigma, DEMO_G2.b_mr, DEMO_G2.eta,
            DEMO_G2.rho, DEMO_CURVE.df, proj.df, t_i, SPEC.tenor,
            SPEC.n_payments - i, SPEC.k_rate)
        assert float(ee[i]) == pytest.approx(ref_i, abs=6e-4), (i, ref_i)


def test_g2_swap_cva_greeks_match_strip_fd():
    """CRN-FD CVA sensitivities under two factors: curve_dv01 and the
    per-factor vegas gated against FD of the G2 swaption-strip CVA."""
    from mc_tpu.models.g2pp import g2_swap_cva_greeks
    from mc_tpu.models.hullwhite import DiscountCurve
    LAM = 0.02
    sim = SimParams(n_paths=1 << 16, n_steps=1)
    g = g2_swap_cva_greeks(SPEC, DEMO_G2, DEMO_CURVE, sim,
                           hazard_rate=LAM,
                           which=("curve_dv01", "vega_x", "vega_y"))

    def strip_cva(curve_bump=0.0, sig=None, eta=None):
        cv = (DEMO_CURVE if curve_bump == 0.0 else
              DiscountCurve(DEMO_CURVE.times,
                            np.asarray(DEMO_CURVE.zeros) + curve_bump))
        s = DEMO_G2.sigma if sig is None else sig
        e_ = DEMO_G2.eta if eta is None else eta
        n = SPEC.n_payments
        # TRUE coupon observation dates expiry + i*tenor (the exposure
        # matrix's obs_dates), NOT the uniform grid j*T/n — the round-4
        # fix for the default-leg date misallocation (ADVICE r03).
        t = SPEC.expiry + np.arange(n) * SPEC.tenor
        tp = np.concatenate([[0.0], t[:-1]])
        dpd = np.exp(-LAM * tp) - np.exp(-LAM * t)
        ee = [oracle.g2_swaption(DEMO_G2.a, s, DEMO_G2.b_mr, e_,
                                 DEMO_G2.rho, cv.df,
                                 SPEC.expiry + i * SPEC.tenor,
                                 SPEC.tenor, n - i, SPEC.k_rate,
                                 n_quad=801)
              for i in range(n)]
        return 0.6 * sum(x * d for x, d in zip(ee, dpd))

    h = 1e-4
    fd_dv01 = (strip_cva(h) - strip_cva(-h)) / (2 * h) * 1e-4
    fd_vx = (strip_cva(sig=DEMO_G2.sigma + h)
             - strip_cva(sig=DEMO_G2.sigma - h)) / (2 * h)
    fd_vy = (strip_cva(eta=DEMO_G2.eta + h)
             - strip_cva(eta=DEMO_G2.eta - h)) / (2 * h)
    assert float(g["curve_dv01"]) == pytest.approx(fd_dv01, rel=2e-2)
    assert float(g["vega_x"]) == pytest.approx(fd_vx, rel=3e-2)
    assert float(g["vega_y"]) == pytest.approx(fd_vy, rel=3e-2)


def test_sharded_g2_swaption_mesh_invariance():
    import jax

    from mc_tpu.models.g2pp import (price_bermudan_g2_swaption,
                                    price_g2_swaption_sharded)
    from mc_tpu.parallel import make_mesh
    # 4 payments keeps the 8-device shard_map trace tractable on the
    # virtual CPU mesh (the 10-date Bermudan's unrolled psum regressions
    # compile for minutes there)
    spec = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=4,
                        k_rate=0.04)
    sim = SimParams(n_paths=1 << 14, n_steps=1)
    for style, solo_fn in (("european", price_g2_swaption),
                           ("bermudan", price_bermudan_g2_swaption)):
        solo = solo_fn(spec, DEMO_G2, DEMO_CURVE, sim)
        m1 = price_g2_swaption_sharded(spec, DEMO_G2, DEMO_CURVE, sim,
                                       style=style,
                                       mesh=make_mesh(jax.devices()[:1]))
        m8 = price_g2_swaption_sharded(spec, DEMO_G2, DEMO_CURVE, sim,
                                       style=style, mesh=make_mesh())
        # identical path set; means differ only by XLA reduction order
        # (the two-factor per-path value chains more f32 ops, so the
        # reassociation noise is ~1e-5 rel vs HW's ~3e-7)
        assert abs(float(m1.price) - float(solo.price)) \
            <= 1e-5 * max(float(solo.price), 1e-9), style
        assert abs(float(m8.price) - float(solo.price)) \
            <= 1e-4 * max(float(solo.price), 1e-9), style


def test_swap_netting_set_two_factor():
    from mc_tpu.models.g2pp import g2_swap_book_exposure
    sim = SimParams(n_paths=1 << 13, n_steps=1)
    pay = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=10,
                       k_rate=0.04)
    rec = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=6,
                       k_rate=0.045, payer=False)
    book = g2_swap_book_exposure([pay, rec], DEMO_G2, DEMO_CURVE, sim,
                                 weights=[1.0, 2.0])
    a = g2_swap_exposure(pay, DEMO_G2, DEMO_CURVE, sim)
    b = g2_swap_exposure(rec, DEMO_G2, DEMO_CURVE, sim)
    vb = np.zeros_like(np.asarray(book.values))
    vb[:, :6] = np.asarray(b.values)
    assert np.array_equal(
        np.asarray(book.values),
        np.float32(np.asarray(a.values) + 2.0 * np.float32(vb)))
    ee_net = np.asarray(book.exposure_profile()[0])
    ee_sum = (np.asarray(a.exposure_profile()[0])
              + 2.0 * np.concatenate([
                  np.asarray(b.exposure_profile()[0]), np.zeros(4)]))
    assert np.all(ee_net <= ee_sum + 1e-7)
    assert ee_net[0] < ee_sum[0]


def test_qmc_g2_swaption_oracle_and_variance_reduction():
    """3-dim Sobol on the exact (x, y, int) draw: matches the
    conditional-Jamshidian within its stderr and beats plain MC's
    stderr by >10x at the same total budget."""
    from mc_tpu.models.g2pp import price_g2_swaption_qmc
    q = price_g2_swaption_qmc(SPEC, DEMO_G2, DEMO_CURVE,
                              SimParams(n_paths=1 << 14, n_steps=1))
    ref = _ref(SPEC)
    assert abs(float(q.price) - ref) <= 5.0 * float(q.stderr) + 1e-6
    m = price_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE,
                          SimParams(n_paths=(1 << 14) * 16, n_steps=1))
    assert float(q.stderr) < float(m.stderr) / 10.0
    with pytest.raises(ValueError, match="n_shifts"):
        price_g2_swaption_qmc(n_shifts=1)


def test_qmc_bermudan_two_factor():
    """Frozen-policy Sobol Bermudan under two-factor rates: 1-payment
    BITWISE == the European QMC; at 10 payments it agrees with the
    plain two-factor LSMC within joint stderr and cuts the equal-budget
    stderr >4x (measured ~7x)."""
    from mc_tpu.models.g2pp import (price_bermudan_g2_swaption,
                                    price_bermudan_g2_swaption_qmc,
                                    price_g2_swaption_qmc)
    s1 = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=1, k_rate=0.04)
    sim1 = SimParams(n_paths=1 << 12, n_steps=1)
    qb = price_bermudan_g2_swaption_qmc(s1, DEMO_G2, DEMO_CURVE, sim1)
    qe = price_g2_swaption_qmc(s1, DEMO_G2, DEMO_CURVE, sim1)
    assert float(qb.price) == float(qe.price)
    sim = SimParams(n_paths=1 << 13, n_steps=1)
    q = price_bermudan_g2_swaption_qmc(SPEC, DEMO_G2, DEMO_CURVE, sim,
                                       n_fit=8192)
    plain = price_bermudan_g2_swaption(
        SPEC, DEMO_G2, DEMO_CURVE,
        SimParams(n_paths=(1 << 13) * 16, n_steps=1))
    joint = (float(q.stderr) ** 2 + float(plain.stderr) ** 2) ** 0.5
    assert abs(float(q.price) - float(plain.price)) <= 4.0 * joint + 2e-4
    assert float(plain.stderr) > 4.0 * float(q.stderr)


def test_g2_swaption_greeks_match_oracle_fd():
    """CRN-FD price sensitivities under two-factor rates: European
    curve_dv01 and per-factor vegas vs central differences of the
    conditional-Jamshidian closed form; the Bermudan's dv01 is finite;
    unknown names raise."""
    from mc_tpu.models.g2pp import g2_swaption_greeks
    sim = SimParams(n_paths=1 << 20, n_steps=1)
    g = g2_swaption_greeks(SPEC, DEMO_G2, DEMO_CURVE, sim,
                           which=("curve_dv01", "vega_x", "vega_y"))

    from mc_tpu.models.hullwhite import DiscountCurve

    def jam(bump=0.0, dyn=DEMO_G2):
        cv = (DEMO_CURVE if bump == 0.0 else
              DiscountCurve(DEMO_CURVE.times,
                            np.asarray(DEMO_CURVE.zeros) + bump))
        return oracle.g2_swaption(dyn.a, dyn.sigma, dyn.b_mr, dyn.eta,
                                  dyn.rho, cv.df, SPEC.expiry,
                                  SPEC.tenor, SPEC.n_payments,
                                  SPEC.k_rate)

    import dataclasses
    h = 1e-4
    fd_dv01 = (jam(h) - jam(-h)) / (2 * h) * 1e-4
    fd_vx = (jam(dyn=dataclasses.replace(DEMO_G2, sigma=DEMO_G2.sigma + h))
             - jam(dyn=dataclasses.replace(
                 DEMO_G2, sigma=DEMO_G2.sigma - h))) / (2 * h)
    fd_vy = (jam(dyn=dataclasses.replace(DEMO_G2, eta=DEMO_G2.eta + h))
             - jam(dyn=dataclasses.replace(
                 DEMO_G2, eta=DEMO_G2.eta - h))) / (2 * h)
    assert float(g["curve_dv01"]) == pytest.approx(fd_dv01, rel=2e-2)
    # vega CRN-FD carries ~2.5% seed noise at 2^20 paths (the exercise
    # kink); gate at ~3 se — still catches sign/scale/bump errors
    assert float(g["vega_x"]) == pytest.approx(fd_vx, rel=8e-2)
    assert float(g["vega_y"]) == pytest.approx(fd_vy, rel=1e-1)
    gb = g2_swaption_greeks(SPEC, DEMO_G2, DEMO_CURVE,
                            SimParams(n_paths=1 << 14, n_steps=1),
                            style="bermudan", which=("curve_dv01",))
    assert np.isfinite(gb["curve_dv01"])
    with pytest.raises(ValueError, match="unknown greeks"):
        g2_swaption_greeks(which=("charm",))


def test_qmc_shift_sharded_mesh_invariant_two_factor():
    """Shift-sharded G2 QMC agrees BITWISE with the single-chip program
    on 1/2/8-device meshes (full point set per shift per chip)."""
    import jax

    from mc_tpu.models.g2pp import price_g2_swaption_qmc
    from mc_tpu.parallel import make_mesh
    sim = SimParams(n_paths=1 << 12, n_steps=1)
    solo = price_g2_swaption_qmc(SPEC, DEMO_G2, DEMO_CURVE, sim,
                                 n_shifts=16)
    for k in (1, 2, 8):
        m = price_g2_swaption_qmc(SPEC, DEMO_G2, DEMO_CURVE, sim,
                                  n_shifts=16,
                                  mesh=make_mesh(jax.devices()[:k]))
        assert float(m.price) == float(solo.price), k
        assert float(m.stderr) == float(solo.stderr), k


def test_bucket_dv01_two_factor_sums_localizes_and_matches_oracle():
    """Key-rate DV01 ladder under G2++: buckets sum to the parallel
    curve_dv01, the unused 0.5y pillar is exactly zero, and material
    buckets match per-knot FD of the conditional-Jamshidian oracle."""
    from mc_tpu.models.g2pp import (g2_swaption_bucket_dv01,
                                    g2_swaption_greeks)
    from mc_tpu.models.hullwhite import DiscountCurve
    sim = SimParams(n_paths=1 << 17, n_steps=1)
    b = g2_swaption_bucket_dv01(SPEC, DEMO_G2, DEMO_CURVE, sim)
    assert b.shape == DEMO_CURVE.times.shape
    g = g2_swaption_greeks(SPEC, DEMO_G2, DEMO_CURVE, sim,
                           which=("curve_dv01",))
    assert b.sum() == pytest.approx(float(g["curve_dv01"]), rel=1e-3)
    assert b[0] == 0.0

    def orc(k, h):
        z = np.array(DEMO_CURVE.zeros)
        z[k] += h
        cv = DiscountCurve(DEMO_CURVE.times, z)
        return oracle.g2_swaption(DEMO_G2.a, DEMO_G2.sigma, DEMO_G2.b_mr,
                                  DEMO_G2.eta, DEMO_G2.rho, cv.df,
                                  SPEC.expiry, SPEC.tenor,
                                  SPEC.n_payments, SPEC.k_rate)

    h = 1e-4
    for k in range(len(DEMO_CURVE.times)):
        fd = (orc(k, h) - orc(k, -h)) / (2 * h) * 1e-4
        assert b[k] == pytest.approx(fd, rel=2e-2, abs=1e-8), k
    # Bermudan ladder: finite, localized, sums to its parallel dv01
    simb = SimParams(n_paths=1 << 13, n_steps=1)
    bb = g2_swaption_bucket_dv01(SPEC, DEMO_G2, DEMO_CURVE, simb,
                                 style="bermudan")
    assert np.all(np.isfinite(bb)) and bb[0] == 0.0
    gb = g2_swaption_greeks(SPEC, DEMO_G2, DEMO_CURVE, simb,
                            style="bermudan", which=("curve_dv01",))
    # 6%: per-knot policy re-fits flip a few exercise decisions each,
    # so the Bermudan ladder composes only to LSMC-noise order at 2^13
    assert bb.sum() == pytest.approx(float(gb["curve_dv01"]), rel=6e-2)
