"""Model-family FD+CRN greeks (Merton, SABR) vs oracle differences."""

import numpy as np
import pytest

from mc_tpu import OptionParams, SimParams
from mc_tpu.greeks import merton_greeks, sabr_greeks

SIM = SimParams(n_paths=200_000, n_steps=50)


def _oracle_fd_merton(field, h, **over):
    from mc_tpu.models.merton import merton_call_closed_form
    base = dict(s0=100.0, k=100.0, t=1.0, r=0.1, sigma=0.2,
                lam=0.3, mu_j=-0.10, sigma_j=0.15)
    base.update(over)
    up = dict(base)
    dn = dict(base)
    up[field] += h
    dn[field] -= h
    return (merton_call_closed_form(**up)
            - merton_call_closed_form(**dn)) / (2 * h)


def test_merton_market_and_jump_sens_vs_series_oracle():
    g = merton_greeks(sim=SIM, antithetic=True,
                      which=("delta", "vega", "lam_sens", "sigma_j_sens"))
    for name, field in (("delta", "s0"), ("vega", "sigma"),
                        ("lam_sens", "lam"), ("sigma_j_sens", "sigma_j")):
        want = _oracle_fd_merton(field, 1e-3 if field != "s0" else 0.1)
        got = float(g[name])
        assert got == pytest.approx(want, rel=0.1, abs=0.02), (
            name, got, want)


def test_merton_unknown_greek():
    with pytest.raises(ValueError, match="unknown greeks"):
        merton_greeks(which=("charm",))


def _oracle_fd_sabr(field, h, **over):
    from mc_tpu.models.sabr import sabr_call_hagan
    base = dict(s0=100.0, k=100.0, t=1.0, r=0.1,
                alpha=0.2, beta=1.0, nu=0.4, rho=-0.4)
    base.update(over)
    up = dict(base)
    dn = dict(base)
    up[field] += h
    dn[field] -= h
    return (sabr_call_hagan(**up) - sabr_call_hagan(**dn)) / (2 * h)


def test_sabr_calibration_sens_vs_hagan():
    """MC CRN-FD sensitivities vs FD of the Hagan oracle.  The expansion
    carries ~1% price bias but it is SMOOTH in the parameters, so its
    derivative matches the MC derivative to the same order."""
    g = sabr_greeks(sim=SIM, antithetic=True,
                    which=("delta", "alpha_sens", "nu_sens", "rho_fv_sens"))
    for name, field, h in (("delta", "s0", 0.1),
                           ("alpha_sens", "alpha", 1e-3),
                           ("nu_sens", "nu", 1e-2),
                           ("rho_fv_sens", "rho", 1e-2)):
        want = _oracle_fd_sabr(field, h)
        got = float(g[name])
        assert got == pytest.approx(want, rel=0.15, abs=0.05), (
            name, got, want)


def test_sabr_unknown_greek():
    with pytest.raises(ValueError, match="unknown greeks"):
        sabr_greeks(which=("vega",))


def _oracle_fd_bsv(field, h, **over):
    from mc_tpu.oracle import bsv_call
    base = dict(s0=100.0, k=100.0, t=1.0, r0=0.1, sigma_s=0.2,
                a=0.3, b=0.05, sigma_r=0.015, rho=-0.3)
    base.update(over)
    up = dict(base)
    dn = dict(base)
    up[field] += h
    dn[field] -= h
    return (bsv_call(**up) - bsv_call(**dn)) / (2 * h)


def test_vasicek_market_and_curve_sens_vs_merton73():
    """MC CRN-FD sensitivities under stochastic rates vs FD of the exact
    Merton-1973 closed form — spot, initial-rate, long-run level, rate
    vol and equity/rate correlation."""
    from mc_tpu.greeks import vasicek_greeks
    sim = SimParams(n_paths=200_000, n_steps=20)
    g = vasicek_greeks(sim=sim, antithetic=True,
                       which=("delta", "rho0", "b_sens", "sigma_r_sens",
                              "rho_sr_sens"))
    for name, field, h in (("delta", "s0", 0.1),
                           ("rho0", "r0", 1e-3),
                           ("b_sens", "b", 1e-3),
                           ("sigma_r_sens", "sigma_r", 1e-4),
                           ("rho_sr_sens", "rho", 1e-3)):
        want = _oracle_fd_bsv(field, h)
        got = float(g[name])
        assert got == pytest.approx(want, rel=0.15, abs=0.03), (
            name, got, want)


def test_vasicek_unknown_greek():
    from mc_tpu.greeks import vasicek_greeks
    with pytest.raises(ValueError, match="unknown greeks"):
        vasicek_greeks(which=("vanna",))
