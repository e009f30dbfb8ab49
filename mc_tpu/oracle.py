"""Black-Scholes analytic oracle + Monte Carlo error statistics.

TPU-native equivalent of ``inc/BlackandScholes.hpp``.  The reference uses the
Abramowitz-Stegun 5-coefficient polynomial CND approximation
(``BlackandScholes.hpp:8-30``) as its ground truth; here the primary oracle
uses the exact normal CDF (`jax.scipy.stats.norm.cdf`), and the A&S
polynomial is kept as a secondary implementation for parity checks against
the reference's printed values.

Also provides the MC standard-error statistics the reference never computed
(SURVEY.md section 5): the framework's acceptance criterion is
``|price - BS| <= 3 * stderr``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

__all__ = [
    "bs_call",
    "bs_digital_call",
    "bs_put",
    "bs_delta_call",
    "bs_up_out_call",
    "bs_down_out_call",
    "bs_vega",
    "bs_gamma",
    "bs_implied_vol",
    "cnd_as",
    "bs_call_as",
    "PriceResult",
]


def bs_call(s0, k, t, r, sigma, q=0.0):
    """European call, exact closed form with continuous dividend yield
    (cf. BlackandScholes.hpp:34-43, which has q=0)."""
    s0, k, t, r, sigma, q = map(jnp.asarray, (s0, k, t, r, sigma, q))
    sqrt_t = jnp.sqrt(t)
    d1 = (jnp.log(s0 / k) + (r - q + 0.5 * sigma * sigma) * t) / (sigma * sqrt_t)
    d2 = d1 - sigma * sqrt_t
    return (s0 * jnp.exp(-q * t) * norm.cdf(d1)
            - k * jnp.exp(-r * t) * norm.cdf(d2))


def bs_put(s0, k, t, r, sigma, q=0.0):
    """European put via put-call parity."""
    call = bs_call(s0, k, t, r, sigma, q)
    return (call - s0 * jnp.exp(-jnp.asarray(q) * t)
            + k * jnp.exp(-jnp.asarray(r) * t))


def bs_digital_call(s0, k, t, r, sigma, q=0.0):
    """Cash-or-nothing digital call: e^{-rT} N(d2)."""
    s0, k, t, r, sigma, q = map(jnp.float32, (s0, k, t, r, sigma, q))
    st = sigma * jnp.sqrt(t)
    d2 = (jnp.log(s0 / k) + (r - q - 0.5 * sigma * sigma) * t) / st
    return jnp.exp(-r * t) * norm.cdf(d2)


def bs_delta_call(s0, k, t, r, sigma, q=0.0):
    """BS call delta e^{-qT} N(d1) — the control-variate coefficient."""
    s0, k, t, r, sigma, q = map(jnp.asarray, (s0, k, t, r, sigma, q))
    sqrt_t = jnp.sqrt(t)
    d1 = (jnp.log(s0 / k) + (r - q + 0.5 * sigma * sigma) * t) / (sigma * sqrt_t)
    return jnp.exp(-q * t) * norm.cdf(d1)


def cnd_as(x):
    """Abramowitz-Stegun polynomial CND, max abs error ~7.5e-8.

    Same 5-term approximation as the reference (BlackandScholes.hpp:8-30),
    re-expressed branch-free with `jnp.where` (the reference's sign branch
    becomes a mask, which is the idiomatic vector form on the VPU).
    """
    x = jnp.asarray(x, jnp.float32)
    p = jnp.float32(0.2316419)
    b = (0.31938153, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
    one_over_sqrt2pi = jnp.float32(0.39894228)
    ax = jnp.abs(x)
    tt = 1.0 / (1.0 + p * ax)
    poly = tt * (b[0] + tt * (b[1] + tt * (b[2] + tt * (b[3] + tt * b[4]))))
    upper_tail = one_over_sqrt2pi * jnp.exp(-0.5 * ax * ax) * poly
    return jnp.where(x >= 0, 1.0 - upper_tail, upper_tail)


def bs_call_as(s0, k, t, r, sigma):
    """BS call using the A&S CND — bitwise-comparable to the reference oracle."""
    s0, k, t, r, sigma = (jnp.asarray(v, jnp.float32) for v in (s0, k, t, r, sigma))
    sqrt_t = jnp.sqrt(t)
    d1 = (jnp.log(s0 / k) + (r + 0.5 * sigma * sigma) * t) / (sigma * sqrt_t)
    d2 = d1 - sigma * sqrt_t
    return s0 * cnd_as(d1) - k * jnp.exp(-r * t) * cnd_as(d2)


# ---------------------------------------------------------------------------
# Continuously monitored barrier closed forms (reflection principle) — the
# oracles for the Brownian-bridge-corrected barrier payoffs.  Host-side f64.
# ---------------------------------------------------------------------------


def _call_segment_f64(x, k, t, r, sigma, q, lo, hi):
    """e^{-rT} E_x[(S_T - k) 1{lo < S_T < hi}] under GBM, host f64.

    Direct truncated-lognormal expectation — numerically stable where the
    'call-spread + digital' decomposition catastrophically cancels (the
    reflection argument can sit orders of magnitude past the barrier).
    ``hi=None`` means +infinity.
    """
    import math
    st = sigma * math.sqrt(t)
    nd = lambda v: 0.5 * (1.0 + math.erf(v / math.sqrt(2.0)))

    def d1(y):
        return (math.log(x / y) + (r - q + 0.5 * sigma * sigma) * t) / st

    n1_lo, n2_lo = nd(d1(lo)), nd(d1(lo) - st)
    n1_hi = nd(d1(hi)) if hi is not None else 0.0
    n2_hi = nd(d1(hi) - st) if hi is not None else 0.0
    return (x * math.exp(-q * t) * (n1_lo - n1_hi)
            - k * math.exp(-r * t) * (n2_lo - n2_hi))


def bs_up_out_call(s0, k, t, r, sigma, b, q=0.0) -> float:
    """Up-and-out call with a CONTINUOUSLY monitored barrier b (> s0, > k).

    Reflection principle for drifted Brownian motion: with
    mu = r - q - sigma^2/2,

        P_{s0}(S_T in dz, max S > b) = (b/s0)^{2mu/sigma^2}
                                       P_{b^2/s0}(S_T in dz)    (z < b)

    so  C_uo = seg(s0) - (b/s0)^{2mu/sigma^2} seg(b^2/s0)  with
    seg(x) = e^{-rT} E_x[(S_T-K) 1{K < S_T < b}]  (equivalent to the
    Rubinstein-Reiner form).  Host-side f64; the oracle for the
    `up_out_call_bb` payoff.
    """
    s0, k, t, r, sigma, b, q = map(float, (s0, k, t, r, sigma, b, q))
    if s0 >= b or k >= b:
        return 0.0
    mu = r - q - 0.5 * sigma * sigma
    refl = (b / s0) ** (2.0 * mu / (sigma * sigma))
    return (_call_segment_f64(s0, k, t, r, sigma, q, k, b)
            - refl * _call_segment_f64(b * b / s0, k, t, r, sigma, q, k, b))


def bs_down_out_call(s0, k, t, r, sigma, b, q=0.0) -> float:
    """Down-and-out call, CONTINUOUSLY monitored barrier b (< s0).

    Same reflection identity with the crossing measured downward; the
    surviving payoff region is S_T > max(k, b):
        C_do = seg(s0) - (b/s0)^{2mu/sigma^2} seg(b^2/s0),
        seg(x) = e^{-rT} E_x[(S_T-K) 1{S_T > max(k, b)}].
    Host-side f64; the oracle for `down_out_call_bb`.
    """
    s0, k, t, r, sigma, b, q = map(float, (s0, k, t, r, sigma, b, q))
    if s0 <= b:
        return 0.0
    mu = r - q - 0.5 * sigma * sigma
    refl = (b / s0) ** (2.0 * mu / (sigma * sigma))
    lo = max(k, b)
    return (_call_segment_f64(s0, k, t, r, sigma, q, lo, None)
            - refl * _call_segment_f64(b * b / s0, k, t, r, sigma, q,
                                       lo, None))


def bs_vega(s0, k, t, r, sigma, q=0.0):
    """dC/dsigma = s0 e^{-qT} phi(d1) sqrt(T)."""
    s0, k, t, r, sigma, q = map(jnp.asarray, (s0, k, t, r, sigma, q))
    sqrt_t = jnp.sqrt(t)
    d1 = (jnp.log(s0 / k) + (r - q + 0.5 * sigma * sigma) * t) \
        / (sigma * sqrt_t)
    return s0 * jnp.exp(-q * t) * norm.pdf(d1) * sqrt_t


def bs_gamma(s0, k, t, r, sigma, q=0.0):
    """d2C/dS0^2 = e^{-qT} phi(d1) / (s0 sigma sqrt(T))."""
    s0, k, t, r, sigma, q = map(jnp.asarray, (s0, k, t, r, sigma, q))
    sqrt_t = jnp.sqrt(t)
    d1 = (jnp.log(s0 / k) + (r - q + 0.5 * sigma * sigma) * t) \
        / (sigma * sqrt_t)
    return jnp.exp(-q * t) * norm.pdf(d1) / (s0 * sigma * sqrt_t)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def bs_implied_vol(price, s0, k, t, r, q=0.0, n_iter: int = 24):
    """Black-Scholes implied volatility of a call, fully vectorized + jitted.

    Bisection-safeguarded Newton: the bracket [lo, hi] shrinks
    monotonically (vega > 0 makes the call price strictly increasing in
    sigma), Newton steps are taken whenever they land strictly inside it,
    bisection otherwise — globally convergent, fixed trip count, no
    data-dependent control flow (TPU/jit friendly).  Prices outside the
    static no-arbitrage band (forward intrinsic, spot) return NaN.
    Inverts MC prices back to vol surfaces without leaving the device.
    """
    price, s0, k, t, r, q = map(
        lambda v: jnp.asarray(v, jnp.float32), (price, s0, k, t, r, q))
    lb = jnp.maximum(s0 * jnp.exp(-q * t) - k * jnp.exp(-r * t), 0.0)
    ub = s0 * jnp.exp(-q * t)
    valid = jnp.logical_and(price > lb, price < ub)

    lo = jnp.full_like(price, 1e-4)
    hi = jnp.full_like(price, 5.0)
    # Brenner-Subrahmanyam ATM start: sigma ~ sqrt(2 pi / T) * C / S0
    sigma0 = jnp.clip(jnp.sqrt(2.0 * jnp.pi / t) * price / s0, 1e-3, 4.0)

    def body(_, carry):
        sigma, lo, hi = carry
        diff = bs_call(s0, k, t, r, sigma, q) - price
        lo = jnp.where(diff < 0.0, sigma, lo)
        hi = jnp.where(diff > 0.0, sigma, hi)
        vega = bs_vega(s0, k, t, r, sigma, q)
        newton = sigma - diff / jnp.maximum(vega, 1e-8)
        inside = jnp.logical_and(newton > lo, newton < hi)
        sigma = jnp.where(inside, newton, 0.5 * (lo + hi))
        return (sigma, lo, hi)

    sigma, _, _ = jax.lax.fori_loop(0, n_iter, body, (sigma0, lo, hi))
    return jnp.where(valid, sigma, jnp.nan)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PriceResult:
    """A Monte Carlo price with its statistical error.

    The reference printed bare point estimates (wrappers.cuh:52,86,119);
    every engine here returns the standard error as a first-class output so
    correctness is checkable as |price - oracle| <= 3 * stderr.
    """

    price: Any          # discounted mean payoff
    stderr: Any         # standard error of the discounted mean
    n_paths: Any        # effective number of (outer) paths
    payoff_mean: Any    # undiscounted mean payoff
    payoff_var: Any     # undiscounted payoff sample variance

    def within(self, oracle_price, n_se: float = 3.0) -> Any:
        """|price - oracle| <= n_se * stderr (the acceptance criterion)."""
        return jnp.abs(self.price - oracle_price) <= n_se * self.stderr


def summarize(sum_w, sum_w2, n, discount):
    """Build a PriceResult from fp64 accumulators of payoff and payoff^2."""
    n = jnp.asarray(n, jnp.asarray(sum_w).dtype)
    mean = sum_w / n
    var = jnp.maximum(sum_w2 / n - mean * mean, 0.0) * (n / jnp.maximum(n - 1.0, 1.0))
    stderr = jnp.sqrt(var / n) * discount
    return PriceResult(
        price=(discount * mean),
        stderr=stderr,
        n_paths=n,
        payoff_mean=mean,
        payoff_var=var,
    )
