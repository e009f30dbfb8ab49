"""Vasicek swaptions: exact date-grid MC vs the Jamshidian oracle, and
the Bermudan LSMC's bracketing/degenerate gates."""

import math

import numpy as np
import pytest

from mc_tpu import SimParams, oracle
from mc_tpu.models.swaption import (SwaptionSpec, price_bermudan_swaption,
                                    price_swaption)
from mc_tpu.models.vasicek import VasicekDynamics

DYN = VasicekDynamics(a=0.3, b=0.05, sigma_r=0.015)
SPEC = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=10, k_rate=0.05)
R0 = 0.05
SIM = SimParams(n_paths=1 << 19, n_steps=1)


def _oracle(spec, payer=True):
    return oracle.vasicek_swaption(R0, DYN.a, DYN.b, DYN.sigma_r,
                                   spec.expiry, spec.tenor,
                                   spec.n_payments, spec.k_rate,
                                   payer=payer)


def test_payer_matches_jamshidian():
    r = price_swaption(SPEC, DYN, SIM, r0=R0)
    z = (float(r.price) - _oracle(SPEC)) / float(r.stderr)
    assert abs(z) < 4.0, (float(r.price), _oracle(SPEC), z)


def test_receiver_matches_jamshidian():
    spec = SwaptionSpec(payer=False)
    r = price_swaption(spec, DYN, SIM, r0=R0)
    z = (float(r.price) - _oracle(spec, payer=False)) / float(r.stderr)
    assert abs(z) < 4.0


def test_moneyness_ladder():
    """Payer premium decreases in the fixed rate; deep OTM ~ 0 (both MC
    and the oracle agree across the ladder)."""
    prev = float("inf")
    for k in (0.02, 0.05, 0.09):
        spec = SwaptionSpec(k_rate=k)
        r = price_swaption(spec, DYN, SIM, r0=R0)
        assert float(r.price) < prev + 1e-9
        z = (float(r.price) - _oracle(spec)) / max(float(r.stderr), 1e-9)
        assert abs(z) < 4.0, (k, z)
        prev = float(r.price)


def test_one_payment_bermudan_is_european_bitwise():
    """n_payments=1: the only exercise date is the expiry — the LSMC
    collapses to the European estimator on the SAME draws (CRN tag)."""
    spec = SwaptionSpec(n_payments=1)
    sim = SimParams(n_paths=1 << 15, n_steps=1)
    eur = price_swaption(spec, DYN, sim, r0=R0)
    ber = price_bermudan_swaption(spec, DYN, sim, r0=R0)
    assert float(ber.price) == float(eur.price)


def test_bermudan_dominates_european():
    sim = SimParams(n_paths=1 << 16, n_steps=1)
    ber = price_bermudan_swaption(SPEC, DYN, sim, r0=R0)
    eur = _oracle(SPEC)
    assert float(ber.price) >= eur - 3.0 * float(ber.stderr)


def test_bermudan_deterministic_limit():
    """sigma_r -> 0: rates are deterministic, so the Bermudan is the
    max over exercise dates of the discounted intrinsic along the
    deterministic rate path."""
    dyn0 = VasicekDynamics(a=0.3, b=0.05, sigma_r=1e-7)
    sim = SimParams(n_paths=1 << 12, n_steps=1)
    ber = price_bermudan_swaption(SPEC, DYN.__class__(
        a=dyn0.a, b=dyn0.b, sigma_r=dyn0.sigma_r), sim, r0=R0)
    # deterministic r(t) = b + (r0 - b)e^{-at}; y(t) = int_0^t r
    a, b = 0.3, 0.05
    best = 0.0
    for i in range(SPEC.n_payments):
        t_i = SPEC.expiry + i * SPEC.tenor
        r_i = b + (R0 - b) * math.exp(-a * t_i)
        y_i = b * t_i + (R0 - b) * (1.0 - math.exp(-a * t_i)) / a
        # remaining swap intrinsic with sigma_r = 0 bonds
        fixed = sum(
            oracle.vasicek_zcb(r_i, a, b, 0.0, SPEC.tenor * (j + 1))
            for j in range(SPEC.n_payments - i))
        p_last = oracle.vasicek_zcb(
            r_i, a, b, 0.0, SPEC.tenor * (SPEC.n_payments - i))
        intr = max(1.0 - p_last - SPEC.k_rate * SPEC.tenor * fixed, 0.0)
        best = max(best, intr * math.exp(-y_i))
    assert float(ber.price) == pytest.approx(best, abs=2e-4)


def test_r0_monotonicity():
    """Payer swaptions gain when rates rise."""
    lo = price_swaption(SPEC, DYN, SIM, r0=0.03)
    hi = price_swaption(SPEC, DYN, SIM, r0=0.07)
    assert float(hi.price) > float(lo.price)


def test_validation():
    with pytest.raises(ValueError, match="n_payments"):
        price_swaption(SwaptionSpec(n_payments=0))
    with pytest.raises(ValueError, match="expiry/tenor"):
        price_swaption(SwaptionSpec(tenor=-1.0))
    with pytest.raises(ValueError, match="degree"):
        price_bermudan_swaption(degree=0)


def test_swaption_greeks_match_oracle_fd():
    """One reverse-mode pass through the exact-grid pricer vs central
    differences of the Jamshidian closed form."""
    from mc_tpu.models.swaption import swaption_greeks
    g = swaption_greeks(SPEC, DYN, SimParams(n_paths=1 << 18, n_steps=1),
                        r0=R0)
    h = 1e-4
    fd_dv01 = (oracle.vasicek_swaption(R0 + h, DYN.a, DYN.b, DYN.sigma_r,
                                       1.0, 0.5, 10, 0.05)
               - oracle.vasicek_swaption(R0 - h, DYN.a, DYN.b,
                                         DYN.sigma_r, 1.0, 0.5, 10,
                                         0.05)) / (2 * h)
    fd_vega = (oracle.vasicek_swaption(R0, DYN.a, DYN.b, DYN.sigma_r + h,
                                       1.0, 0.5, 10, 0.05)
               - oracle.vasicek_swaption(R0, DYN.a, DYN.b,
                                         DYN.sigma_r - h, 1.0, 0.5, 10,
                                         0.05)) / (2 * h)
    assert abs(float(g["dv01"]) - fd_dv01) < 0.01
    assert abs(float(g["vega_r"]) - fd_vega) < 0.02


def test_bermudan_greeks_finite_and_bracketed():
    """Frozen-policy Bermudan dv01 exists and the exercisable payer's
    dv01 is below the European's (part of the value is already locked)."""
    from mc_tpu.models.swaption import swaption_greeks
    sim = SimParams(n_paths=1 << 15, n_steps=1)
    ge = swaption_greeks(SPEC, DYN, sim, r0=R0)
    gb = swaption_greeks(SPEC, DYN, sim, r0=R0, style="bermudan")
    assert np.isfinite(float(gb["dv01"]))
    assert 0.0 < float(gb["dv01"]) < float(ge["dv01"]) + 0.05
    with pytest.raises(ValueError, match="style"):
        swaption_greeks(style="american")


def test_sharded_swaption_mesh_invariance():
    """Paths shard by GLOBAL id and the Bermudan's normal equations meet
    in one psum, so a 1-device mesh is BITWISE the single-chip pricer
    and the 8-device mesh agrees to reorder-level fp noise."""
    import jax

    from mc_tpu.models.swaption import price_swaption_sharded
    from mc_tpu.parallel import make_mesh
    sim = SimParams(n_paths=1 << 15, n_steps=1)
    for style, solo_fn in (("european", price_swaption),
                           ("bermudan", price_bermudan_swaption)):
        solo = solo_fn(SPEC, DYN, sim, r0=R0)
        m1 = price_swaption_sharded(SPEC, DYN, sim, style=style, r0=R0,
                                    mesh=make_mesh(jax.devices()[:1]))
        m8 = price_swaption_sharded(SPEC, DYN, sim, style=style, r0=R0,
                                    mesh=make_mesh())
        assert float(m1.price) == float(solo.price), style
        assert abs(float(m8.price) - float(solo.price)) \
            <= 1e-4 * float(solo.price), style


def test_swap_exposure_profile_is_a_swaption_strip():
    """EVERY point of the swap's EE profile has a closed form: EE(t_i)
    = E[max(V_swap(t_i), 0) e^{-y_i}] is exactly the price of a
    European swaption expiring at t_i on the remaining swap — the
    Jamshidian oracle gates the whole profile, and the ENE side is the
    receiver strip."""
    from mc_tpu.models.swaption import swap_exposure
    e = swap_exposure(SPEC, DYN, SimParams(n_paths=1 << 17, n_steps=1),
                      r0=R0)
    ee, _ = e.exposure_profile()
    ene, _ = e.ene_profile()
    for i in (0, 3, 6):
        t_i = SPEC.expiry + i * SPEC.tenor
        n_rem = SPEC.n_payments - i - 1
        ref = oracle.vasicek_swaption(R0, DYN.a, DYN.b, DYN.sigma_r,
                                      t_i, SPEC.tenor, n_rem,
                                      SPEC.k_rate)
        ref_r = oracle.vasicek_swaption(R0, DYN.a, DYN.b, DYN.sigma_r,
                                        t_i, SPEC.tenor, n_rem,
                                        SPEC.k_rate, payer=False)
        assert float(ee[i]) == pytest.approx(ref, abs=3e-4), i
        assert float(ene[i]) == pytest.approx(ref_r, abs=3e-4), i
    assert float(ee[-1]) == 0.0  # all cashflows settled at the last date


def test_swap_exposure_xva_metrics_compose():
    """The swap surface carries the whole metric set: WWR raises the
    payer's CVA (rates up = ITM = default), collateral lowers it."""
    from mc_tpu.models.swaption import swap_exposure
    e = swap_exposure(SPEC, DYN, SimParams(n_paths=1 << 14, n_steps=1),
                      r0=R0)
    flat = float(e.cva(0.02))
    assert float(e.cva_wwr(0.02, 2.0)) > flat
    assert float(e.collateralized(0.005, mpor_steps=1).cva(0.02)) < flat
    assert float(e.mva(0.01)) > 0.0


def test_bermudan_bounds_lower_is_lsmc_bitwise():
    """The bracket's lower leg reuses the LSMC's outer stream and fit,
    so it equals price_bermudan_swaption bitwise."""
    from mc_tpu.models.swaption import bermudan_swaption_bounds
    sim = SimParams(n_paths=1 << 13, n_steps=1)
    lo, up = bermudan_swaption_bounds(SPEC, DYN, sim, r0=R0, n_branch=4)
    ber = price_bermudan_swaption(SPEC, DYN, sim, r0=R0)
    assert float(lo.price) == float(ber.price)
    assert float(up.price) >= float(lo.price)


def test_bermudan_bounds_bracket_is_tight():
    """Andersen-Broadie on the fitted degree-3 policy: the bracket
    contains the European oracle floor and the duality gap is a few
    percent of the premium (policy-quality certificate)."""
    from mc_tpu.models.swaption import bermudan_swaption_bounds
    sim = SimParams(n_paths=1 << 13, n_steps=1)
    lo, up = bermudan_swaption_bounds(SPEC, DYN, sim, r0=R0,
                                      n_branch=32)
    eur = _oracle(SPEC)
    assert float(up.price) + 3 * float(up.stderr) >= eur
    gap = float(up.price) - float(lo.price)
    assert 0.0 <= gap < 0.10 * float(lo.price), gap


def test_one_payment_bounds_collapse():
    """n_payments=1: one exercise date — no policy, no martingale, so
    upper == lower == the European estimator, all bitwise."""
    from mc_tpu.models.swaption import bermudan_swaption_bounds
    spec = SwaptionSpec(n_payments=1)
    sim = SimParams(n_paths=1 << 13, n_steps=1)
    lo, up = bermudan_swaption_bounds(spec, DYN, sim, r0=R0, n_branch=2)
    eur = price_swaption(spec, DYN, sim, r0=R0)
    assert float(lo.price) == float(eur.price)
    assert float(up.price) == float(eur.price)


def test_bounds_validation():
    from mc_tpu.models.swaption import bermudan_swaption_bounds
    with pytest.raises(ValueError, match="degree"):
        bermudan_swaption_bounds(degree=0)
    with pytest.raises(ValueError, match="n_branch"):
        bermudan_swaption_bounds(n_branch=1)


def test_qmc_swaption_oracle_and_variance_reduction():
    """2-dim Sobol on the exact expiry draw: matches Jamshidian within
    its (tiny) stderr and beats plain MC's stderr by >20x at the SAME
    total budget (measured ~130x)."""
    from mc_tpu.models.swaption import price_swaption_qmc
    q = price_swaption_qmc(SPEC, DYN, SimParams(n_paths=1 << 14,
                                                n_steps=1), r0=R0)
    ref = _oracle(SPEC)
    assert abs(float(q.price) - ref) <= 5.0 * float(q.stderr) + 1e-6
    m = price_swaption(SPEC, DYN, SimParams(n_paths=(1 << 14) * 16,
                                            n_steps=1), r0=R0)
    assert float(q.stderr) < float(m.stderr) / 20.0
    with pytest.raises(ValueError, match="n_shifts"):
        price_swaption_qmc(n_shifts=1)


def test_qmc_bermudan_one_payment_bitwise_european_qmc():
    """n_payments=1: same Sobol net, same shift stream, policy pinned
    to exercise-if-ITM — the frozen-policy QMC pass IS the European QMC
    estimator, bitwise (price AND stderr)."""
    from mc_tpu.models.swaption import (price_bermudan_swaption_qmc,
                                        price_swaption_qmc)
    spec = SwaptionSpec(n_payments=1)
    sim = SimParams(n_paths=1 << 12, n_steps=1)
    qb = price_bermudan_swaption_qmc(spec, DYN, sim, r0=R0)
    qe = price_swaption_qmc(spec, DYN, sim, r0=R0)
    assert float(qb.price) == float(qe.price)
    assert float(qb.stderr) == float(qe.stderr)


def test_qmc_bermudan_bracketed_and_variance_reduced():
    """The frozen-policy Sobol value: (a) sits at/below the AB upper
    bound of the SAME fitted policy (both fit on the 8192-path pilot
    with the shared key convention), (b) above the European floor,
    (c) agrees with a plain LSMC at 16x the paths, and (d) cuts the
    equal-budget stderr by >3x on the 20-dim date-grid integrand
    (measured ~5x)."""
    from mc_tpu.models.swaption import (bermudan_swaption_bounds,
                                        price_bermudan_swaption_qmc)
    sim = SimParams(n_paths=1 << 13, n_steps=1)
    q = price_bermudan_swaption_qmc(SPEC, DYN, sim, r0=R0, n_fit=8192)
    lo, up = bermudan_swaption_bounds(
        SPEC, DYN, SimParams(n_paths=8192, n_steps=1), r0=R0,
        n_branch=32)
    assert (float(q.price)
            <= float(up.price) + 4.0 * (float(q.stderr)
                                        + float(up.stderr)))
    assert float(q.price) > _oracle(SPEC)  # early exercise adds value
    plain = price_bermudan_swaption(
        SPEC, DYN, SimParams(n_paths=(1 << 13) * 16, n_steps=1), r0=R0)
    joint = (float(q.stderr) ** 2 + float(plain.stderr) ** 2) ** 0.5
    assert abs(float(q.price) - float(plain.price)) <= 4.0 * joint
    assert float(plain.stderr) > 3.0 * float(q.stderr)
    with pytest.raises(ValueError, match="n_shifts"):
        price_bermudan_swaption_qmc(n_shifts=1)


def test_swap_cva_greeks_match_strip_oracle_fd():
    """d(swap CVA)/d(market) by forward AD through the exposure
    pipeline vs central differences of the CLOSED-FORM strip CVA (every
    EE point is a Jamshidian swaption, and the mixin's PD weights are
    replicated exactly)."""
    from mc_tpu.models.swaption import swap_cva_greeks
    LAM = 0.02
    sim = SimParams(n_paths=1 << 16, n_steps=1)
    g = swap_cva_greeks(SPEC, DYN, sim, hazard_rate=LAM, r0=R0,
                        which=("dv01", "vega_r"))

    def strip_cva(r0v, sigv):
        n = SPEC.n_payments
        # TRUE coupon observation dates expiry + i*tenor (the exposure
        # matrix's obs_dates), NOT the uniform grid j*T/n — the round-4
        # fix for the default-leg date misallocation (ADVICE r03).
        t = SPEC.expiry + np.arange(n) * SPEC.tenor
        tp = np.concatenate([[0.0], t[:-1]])
        dpd = np.exp(-LAM * tp) - np.exp(-LAM * t)
        ee = [oracle.vasicek_swaption(r0v, DYN.a, DYN.b, sigv,
                                      SPEC.expiry + i * SPEC.tenor,
                                      SPEC.tenor, n - i - 1, SPEC.k_rate)
              if i < n - 1 else 0.0 for i in range(n)]
        return 0.6 * sum(e * d for e, d in zip(ee, dpd))

    h = 1e-4
    fd_dv01 = (strip_cva(R0 + h, DYN.sigma_r)
               - strip_cva(R0 - h, DYN.sigma_r)) / (2 * h)
    fd_vega = (strip_cva(R0, DYN.sigma_r + h)
               - strip_cva(R0, DYN.sigma_r - h)) / (2 * h)
    assert float(g["dv01"]) == pytest.approx(fd_dv01, rel=1e-2)
    assert float(g["vega_r"]) == pytest.approx(fd_vega, rel=1e-2)
    assert float(g["dv01"]) > 0.0  # payer: rates up = ITM = more CVA
    assert float(g["vega_r"]) > 0.0
    with pytest.raises(ValueError, match="unknown greeks"):
        swap_cva_greeks(hazard_rate=LAM, which=("charm",))


def test_bermudan_exposure_telescopes_to_the_price():
    """Exercise ABSORBS: EE(t_i) = E[cash at i] + EE(t_{i+1}), so the
    profile is nonincreasing and EE(t_0) is the Bermudan (policy)
    price; the surface carries the whole XVA metric set."""
    from mc_tpu.models.swaption import bermudan_swaption_exposure
    e = bermudan_swaption_exposure(
        SPEC, DYN, SimParams(n_paths=4096, n_steps=1, n_paths_inner=16),
        r0=R0)
    ee, pfe = e.exposure_profile()
    ee = np.asarray(ee)
    assert np.all(np.diff(ee) <= 1e-5), ee  # telescoping decay
    ber = price_bermudan_swaption(SPEC, DYN,
                                  SimParams(n_paths=1 << 16, n_steps=1),
                                  r0=R0)
    assert abs(float(ee[0]) - float(ber.price)) <= 0.01 * float(ber.price)
    assert float(e.cva(0.02)) > 0.0
    assert float(e.collateralized(0.005).cva(0.02)) < float(e.cva(0.02))
    # early dates: most paths alive -> the 95% quantile dominates the
    # mean (late dates legitimately have pfe < ee when < 5% of paths
    # still carry the position)
    assert np.all(np.asarray(pfe)[:3] >= ee[:3])


def test_bermudan_exposure_one_payment_is_european():
    """n_payments=1: one date, every rollout returns the immediate
    intrinsic — EE(t_0) is the European estimator on the outer set."""
    from mc_tpu.models.swaption import bermudan_swaption_exposure
    spec = SwaptionSpec(n_payments=1)
    e = bermudan_swaption_exposure(
        spec, DYN, SimParams(n_paths=1 << 14, n_steps=1,
                             n_paths_inner=4), r0=R0)
    ee, _ = e.exposure_profile()
    ref = _oracle(spec)
    assert float(ee[0]) == pytest.approx(ref, abs=4e-4)


def test_bounds_reject_overlong_date_grids():
    """The rollout draw convention keys counters by tag*64 + date: a
    grid past 64 payments would silently alias streams, so the policy
    machinery rejects it."""
    from mc_tpu.models.swaption import bermudan_swaption_bounds
    with pytest.raises(ValueError, match="64"):
        bermudan_swaption_bounds(
            SwaptionSpec(expiry=1.0, tenor=0.25, n_payments=80),
            DYN, SimParams(n_paths=256, n_steps=1), n_branch=2)


def test_qmc_shift_sharded_mesh_invariant_vasicek():
    """Shift-sharded Vasicek-swaption QMC agrees BITWISE with the
    single-chip program on 1/2/8-device meshes."""
    import jax

    from mc_tpu.models.swaption import price_swaption_qmc
    from mc_tpu.parallel import make_mesh
    sim = SimParams(n_paths=1 << 12, n_steps=1)
    solo = price_swaption_qmc(SPEC, DYN, sim, n_shifts=16)
    for k in (1, 2, 8):
        m = price_swaption_qmc(SPEC, DYN, sim, n_shifts=16,
                               mesh=make_mesh(jax.devices()[:k]))
        assert float(m.price) == float(solo.price), k
        assert float(m.stderr) == float(solo.stderr), k
