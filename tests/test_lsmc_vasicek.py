"""American exercise under stochastic (Vasicek) rates.

The LSMC backward induction discounts PATHWISE along each path's own
integrated rate and regresses continuation values on the (S, r) basis —
gated by the constant-rate degenerate limit (CRR binomial) and the
European parity floor from the Merton-1973 closed form.
"""

import math

import numpy as np
import pytest

from mc_tpu import OptionParams, SimParams
from mc_tpu.lsmc import binomial_american, price_american_vasicek
from mc_tpu.models.vasicek import VasicekDynamics
from mc_tpu.oracle import bsv_call, vasicek_zcb

OPT = OptionParams()  # r0 = 0.1


def _eu_put_bsv(s0=100.0, k=100.0, t=1.0, r0=0.1, ss=0.2, a=0.3, b=0.05,
                sr=0.015, rho=-0.3):
    """European put under BSV via put-call parity:
    p = c - S0 + K P(0,T)."""
    return (bsv_call(s0, k, t, r0, ss, a, b, sr, rho) - s0
            + k * vasicek_zcb(r0, a, b, sr, t))


def test_degenerate_matches_binomial():
    """sigma_r ~ 0, b = r0: constant rates — the (S, r) LSMC must land
    where the plain GBM LSMC does relative to the CRR American oracle."""
    dyn = VasicekDynamics(a=0.3, b=0.1, sigma_r=1e-6, rho=0.0)
    sim = SimParams(n_paths=100_000, n_steps=50)
    r = price_american_vasicek(dyn=dyn, sim=sim)
    oracle = binomial_american(100.0, 100.0, 1.0, 0.1, 0.2, kind="put")
    assert float(r.price) <= oracle + 3.0 * float(r.stderr)
    assert float(r.price) >= oracle - 4.0 * float(r.stderr) - 0.06


def test_american_dominates_european():
    """General stochastic-rate config: the American put must exceed the
    European parity price by a clearly positive premium at r0 = 0.1."""
    sim = SimParams(n_paths=100_000, n_steps=50)
    r = price_american_vasicek(sim=sim)
    eu = _eu_put_bsv()
    assert float(r.price) > eu + 0.2, (float(r.price), eu)


def test_two_pass_ordering():
    """One-pass (foresight, high-biased) >= two-pass (clean lower bound)
    up to MC noise, on the same regression stream."""
    sim = SimParams(n_paths=50_000, n_steps=20)
    one = price_american_vasicek(sim=sim, two_pass=False)
    two = price_american_vasicek(sim=sim, two_pass=True)
    se = math.hypot(float(one.stderr), float(two.stderr))
    assert float(one.price) >= float(two.price) - 3.0 * se


def test_rate_level_monotonicity():
    """A higher long-run rate level lowers the American put (stronger
    forward drift + deeper discounting)."""
    sim = SimParams(n_paths=50_000, n_steps=20)
    lo = price_american_vasicek(dyn=VasicekDynamics(b=0.02), sim=sim)
    hi = price_american_vasicek(dyn=VasicekDynamics(b=0.15), sim=sim)
    assert float(lo.price) > float(hi.price) + 0.1


def test_bermudan_schedule():
    """Coarser exercise grids can only lower the price (fewer rights)."""
    sim = SimParams(n_paths=50_000, n_steps=20)
    amer = price_american_vasicek(sim=sim, exercise_every=1)
    berm = price_american_vasicek(sim=sim, exercise_every=5)
    se = math.hypot(float(amer.stderr), float(berm.stderr))
    assert float(berm.price) <= float(amer.price) + 3.0 * se


def test_validation():
    with pytest.raises(ValueError, match="even n_steps"):
        price_american_vasicek(sim=SimParams(n_paths=1024, n_steps=7))
