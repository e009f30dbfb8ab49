"""Multi-asset greeks: one reverse-mode pass through the XLA dual gives
per-asset delta/vega vectors and the correlation-sensitivity matrix.

Gates: CRN-free analytic checks — finite differences of the Stulz
closed forms (d=2 rainbow) and the Black-Scholes delta/vega (d=1 basket
degenerate limit)."""

import numpy as np
import pytest

from mc_tpu import OptionParams, SimParams, oracle
from mc_tpu.greeks import basket_greeks, rainbow_greeks
from mc_tpu.models.basket import BasketDynamics

S1, S2, K, T, R = 100.0, 100.0, 100.0, 1.0, 0.1
SIG1, SIG2, RHO = 0.25, 0.2, 0.4


def _dyn2():
    return BasketDynamics(
        s0s=np.array([S1, S2], np.float32),
        sigmas=np.array([SIG1, SIG2], np.float32),
        weights=np.array([0.5, 0.5], np.float32),
        corr=np.array([[1.0, RHO], [RHO, 1.0]], np.float32))


def _stulz_fd(fn, i, h=0.01):
    args = [S1, S2]
    args[i] += h
    up = fn(*args)
    args[i] -= 2 * h
    dn = fn(*args)
    return (up - dn) / (2 * h)


def test_rainbow_deltas_match_stulz_fd():
    sim = SimParams(n_paths=1 << 18, n_steps=1)
    g = rainbow_greeks(OptionParams(), _dyn2(), sim, "call_on_max",
                       which=("delta",))
    fn = lambda s1, s2: oracle.stulz_max_call(s1, s2, K, T, R, SIG1,
                                              SIG2, RHO)
    for i in range(2):
        assert abs(float(g["delta"][i]) - _stulz_fd(fn, i)) < 5e-3, i


def test_rainbow_min_call_deltas_and_vegas():
    sim = SimParams(n_paths=1 << 18, n_steps=1)
    g = rainbow_greeks(OptionParams(), _dyn2(), sim, "call_on_min")
    fn = lambda s1, s2: oracle.stulz_min_call(s1, s2, K, T, R, SIG1,
                                              SIG2, RHO)
    for i in range(2):
        assert abs(float(g["delta"][i]) - _stulz_fd(fn, i)) < 5e-3, i
    # vega vector vs FD of the oracle in each sigma
    h = 1e-3
    v1 = (oracle.stulz_min_call(S1, S2, K, T, R, SIG1 + h, SIG2, RHO)
          - oracle.stulz_min_call(S1, S2, K, T, R, SIG1 - h, SIG2,
                                  RHO)) / (2 * h)
    v2 = (oracle.stulz_min_call(S1, S2, K, T, R, SIG1, SIG2 + h, RHO)
          - oracle.stulz_min_call(S1, S2, K, T, R, SIG1, SIG2 - h,
                                  RHO)) / (2 * h)
    assert abs(float(g["vega"][0]) - v1) < 0.35, (g["vega"], v1)
    assert abs(float(g["vega"][1]) - v2) < 0.35, (g["vega"], v2)


def test_rainbow_cega_matches_stulz_fd():
    sim = SimParams(n_paths=1 << 18, n_steps=1)
    g = rainbow_greeks(OptionParams(), _dyn2(), sim, "call_on_max",
                       which=("cega",))
    h = 1e-3
    ref = (oracle.stulz_max_call(S1, S2, K, T, R, SIG1, SIG2, RHO + h)
           - oracle.stulz_max_call(S1, S2, K, T, R, SIG1, SIG2,
                                   RHO - h)) / (2 * h)
    c = np.asarray(g["cega"])
    assert c[0, 0] == 0.0 and c[1, 1] == 0.0    # diagonal not a param
    assert c[0, 1] == c[1, 0]                    # symmetric fold
    assert abs(float(c[0, 1]) - ref) < 0.12, (c, ref)


def test_exchange_deltas_match_margrabe():
    """Margrabe homogeneity: delta_1 = dM/ds1, delta_2 = dM/ds2 < 0."""
    sim = SimParams(n_paths=1 << 18, n_steps=1)
    g = rainbow_greeks(OptionParams(), _dyn2(), sim, "exchange",
                       which=("delta",))
    h = 0.01
    fn = lambda s1, s2: oracle.margrabe(s1, s2, T, SIG1, SIG2, RHO)
    for i in range(2):
        assert abs(float(g["delta"][i]) - _stulz_fd(fn, i)) < 5e-3, i
    assert float(g["delta"][1]) < 0.0


def test_basket_d1_degenerates_to_black_scholes():
    dyn = BasketDynamics(s0s=np.array([100.0], np.float32),
                         sigmas=np.array([0.2], np.float32),
                         weights=np.array([1.0], np.float32),
                         corr=np.array([[1.0]], np.float32))
    sim = SimParams(n_paths=1 << 18, n_steps=8)
    g = basket_greeks(OptionParams(), dyn, sim, "vanilla_call")
    assert abs(float(g["delta"][0])
               - float(oracle.bs_delta_call(100, 100, 1, 0.1, 0.2))) < 6e-3
    assert abs(float(g["vega"][0])
               - float(oracle.bs_vega(100, 100, 1, 0.1, 0.2))) < 0.35
    assert float(np.asarray(g["cega"])[0, 0]) == 0.0


def test_basket_rejects_discontinuous_payoff():
    with pytest.raises(ValueError, match="a.e.-differentiable"):
        basket_greeks(payoff="digital_call")


def test_unknown_greek_rejected():
    with pytest.raises(ValueError, match="unknown greeks"):
        rainbow_greeks(which=("delta", "charm"))
