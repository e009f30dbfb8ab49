"""Longstaff-Schwartz American pricing vs the CRR binomial oracle."""

import numpy as np
import pytest

from mc_tpu import OptionParams, SimParams
from mc_tpu.lsmc import binomial_american, price_american
from mc_tpu.oracle import bs_call, bs_put

# Standard American-put test config (early exercise premium is material
# at high r): S0=100, K=100, r=0.1, sigma=0.2, T=1.
OPT = OptionParams()
SIM = SimParams(n_paths=100_000, n_steps=50)


def test_binomial_oracle_european_limit():
    """American call (no dividends) == European call; binomial converges
    to BS."""
    bs = float(bs_call(100.0, 100.0, 1.0, 0.1, 0.2))
    bin_call = binomial_american(100.0, 100.0, 1.0, 0.1, 0.2, kind="call")
    assert bin_call == pytest.approx(bs, rel=2e-3)


def test_binomial_put_above_european():
    eur = float(bs_put(100.0, 100.0, 1.0, 0.1, 0.2))
    amer = binomial_american(100.0, 100.0, 1.0, 0.1, 0.2, kind="put")
    assert amer > eur + 0.05


def test_lsmc_put_matches_binomial():
    ref = binomial_american(100.0, 100.0, 1.0, 0.1, 0.2, kind="put")
    res = price_american(OPT, SIM, payoff="vanilla_put")
    # LSMC carries a small low bias (suboptimal fitted policy) plus the
    # discrete exercise dates; 1% relative + 3.5 se tolerance.
    tol = 3.5 * float(res.stderr) + 0.012 * ref
    assert abs(float(res.price) - ref) <= tol, (float(res.price), ref)


def test_lsmc_put_above_european():
    eur = float(bs_put(100.0, 100.0, 1.0, 0.1, 0.2))
    res = price_american(OPT, SIM, payoff="vanilla_put")
    assert float(res.price) > eur


def test_lsmc_call_equals_european():
    """American call without dividends should not be exercised early."""
    bs = float(bs_call(100.0, 100.0, 1.0, 0.1, 0.2))
    res = price_american(OPT, SIM, payoff="vanilla_call")
    assert float(res.price) == pytest.approx(bs, rel=0.02)


def test_lsmc_deep_itm_put():
    """Deep ITM American put: immediate exercise dominates, price ~= K-S."""
    opt = OptionParams(s0=60.0)
    ref = binomial_american(60.0, 100.0, 1.0, 0.1, 0.2, kind="put")
    res = price_american(opt, SIM, payoff="vanilla_put")
    assert float(res.price) == pytest.approx(ref, rel=0.02)
    assert float(res.price) >= 39.5  # >= K - S0 - eps


def test_lsmc_degree_insensitivity():
    a = price_american(OPT, SIM, payoff="vanilla_put", degree=2)
    b = price_american(OPT, SIM, payoff="vanilla_put", degree=4)
    assert abs(float(a.price) - float(b.price)) < 0.05


def test_lsmc_guard():
    with pytest.raises(KeyError):
        price_american(payoff="nope")


def test_two_pass_removes_foresight_bias():
    """Longstaff-Schwartz protocol check at a deliberately overfit config:
    a DEEP-OTM put leaves only a handful of in-the-money paths per date,
    so a degree-7 regression on 2k paths overfits badly — the one-pass
    estimator inflates (regression foresight) while the two-pass
    estimator prices an independent set with the frozen policy.  The
    seed-averaged paired ordering one-pass > two-pass must be
    significant (measured t ~ 4 at this config)."""
    import numpy as np
    opt = OptionParams(k=80.0)
    one, two = [], []
    for s in range(16):
        sim = SimParams(n_paths=2048, n_steps=50, seed=s)
        one.append(float(price_american(opt, sim, two_pass=False,
                                        degree=7).price))
        two.append(float(price_american(opt, sim, two_pass=True,
                                        degree=7).price))
    diff = np.asarray(one) - np.asarray(two)
    sem = diff.std(ddof=1) / np.sqrt(len(diff))
    assert diff.mean() > 2.0 * sem, (diff.mean(), sem)   # one >= two

    # On the reference put config the two-pass estimate stays a valid
    # lower bound bracketing the binomial oracle within noise.
    oracle = binomial_american(100.0, 100.0, 1.0, 0.1, 0.2, kind="put")
    r = price_american(sim=SimParams(n_paths=100_000, n_steps=50))
    assert float(r.price) <= oracle + 3.0 * float(r.stderr)
