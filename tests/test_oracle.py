"""Black-Scholes oracle tests (reference: inc/BlackandScholes.hpp)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.stats import norm

from mc_tpu.oracle import (PriceResult, bs_call, bs_call_as, bs_delta_call,
                           bs_put, cnd_as, summarize)

# The reference demo config (hello.cu:5-13); BS call value cross-checked
# against scipy and the reference's printed oracle.
DEMO = dict(s0=100.0, k=100.0, t=1.0, r=0.1, sigma=0.2)
DEMO_CALL = 13.269676584660893


def test_bs_call_demo_value():
    assert float(bs_call(**DEMO)) == pytest.approx(DEMO_CALL, rel=1e-5)


def test_put_call_parity():
    c = float(bs_call(**DEMO))
    p = float(bs_put(**DEMO))
    assert c - p == pytest.approx(
        DEMO["s0"] - DEMO["k"] * np.exp(-DEMO["r"] * DEMO["t"]), rel=1e-6)


def test_cnd_as_matches_exact_cdf():
    # A&S 5-term polynomial: |err| <= 7.5e-8 in f64; f32 arithmetic adds
    # rounding, so gate at 1e-6 (still far below any MC tolerance).
    x = jnp.linspace(-6.0, 6.0, 4001)
    err = jnp.abs(cnd_as(x) - norm.cdf(x))
    assert float(jnp.max(err)) < 1e-6


def test_bs_call_as_close_to_exact():
    a = float(bs_call_as(**{k: v for k, v in DEMO.items()}))
    assert a == pytest.approx(DEMO_CALL, abs=1e-4)


def test_delta_bounds_and_monotonicity():
    deltas = [float(bs_delta_call(s, 100.0, 1.0, 0.1, 0.2))
              for s in (50.0, 100.0, 200.0)]
    assert all(0.0 <= d <= 1.0 for d in deltas)
    assert deltas == sorted(deltas)


def test_summarize_matches_numpy_moments():
    rs = np.random.RandomState(0)
    x = rs.exponential(size=10_000).astype(np.float32)
    disc = 0.9
    res = summarize(jnp.float32(x.sum()), jnp.float32((x * x).sum()),
                    x.size, disc)
    assert float(res.price) == pytest.approx(disc * x.mean(), rel=1e-4)
    expected_se = disc * x.std(ddof=1) / np.sqrt(x.size)
    assert float(res.stderr) == pytest.approx(expected_se, rel=1e-3)


def test_within_criterion():
    res = PriceResult(price=jnp.float32(13.28), stderr=jnp.float32(0.01),
                      n_paths=1, payoff_mean=0.0, payoff_var=0.0)
    assert bool(res.within(13.27))
    assert not bool(res.within(13.20))
