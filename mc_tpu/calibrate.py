"""Smile calibration: fit SABR parameters to an implied-vol curve, jitted.

The production loop this closes: simulate (or observe) option prices →
invert to Black-Scholes implied vols (`oracle.bs_implied_vol`, on-device)
→ fit the smile model (here: Hagan's SABR expansion, differentiable jnp)
→ feed the fitted dynamics back into the MC engines (`models.sabr`).

The fit is damped Gauss-Newton (Levenberg-Marquardt) on the residuals
r_i = hagan_iv(k_i; theta) - iv_i with theta = (alpha, nu, rho)
reparameterized unconstrained (log for the positive parameters, atanh for
the correlation), Jacobians by `jax.jacfwd`, a fixed trip count, and no
data-dependent Python control flow — the whole calibration jits to one
XLA program and vmaps across smiles.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["hagan_iv", "calibrate_sabr", "SABRFit"]


def hagan_iv(f, k, t, alpha, beta, nu, rho):
    """Hagan et al. (2002) lognormal implied vol — differentiable jnp.

    Matches `models.sabr.sabr_implied_vol` (host f64) to f32 precision;
    the ATM singularity of z/x(z) is replaced by its series
    1 - rho z/2 + (2 - 3 rho^2) z^2 / 12 on a branch-free `where`.
    """
    f, k, t, alpha, beta, nu, rho = map(
        lambda v: jnp.asarray(v, jnp.float32), (f, k, t, alpha, beta, nu,
                                                rho))
    omb = 1.0 - beta
    lfk = jnp.log(f / k)
    fkb = (f * k) ** (omb / 2.0)
    corr = 1.0 + (omb ** 2 / 24.0 * alpha ** 2 / (fkb * fkb)
                  + rho * beta * nu * alpha / (4.0 * fkb)
                  + (2.0 - 3.0 * rho * rho) / 24.0 * nu * nu) * t
    denom = fkb * (1.0 + omb ** 2 / 24.0 * lfk ** 2
                   + omb ** 4 / 1920.0 * lfk ** 4)
    z = nu / alpha * fkb * lfk
    # x(z) is computed on a safe argument; the |z|->0 limit switches to
    # the series (also keeps the jacfwd derivative finite at ATM).
    small = jnp.abs(z) < 1e-4
    z_safe = jnp.where(small, 1.0, z)
    xz = jnp.log((jnp.sqrt(1.0 - 2.0 * rho * z_safe + z_safe * z_safe)
                  + z_safe - rho) / (1.0 - rho))
    ratio_series = 1.0 - 0.5 * rho * z + (2.0 - 3.0 * rho * rho) / 12.0 * z * z
    ratio = jnp.where(small, ratio_series, z_safe / xz)
    return alpha / denom * ratio * corr


class SABRFit(NamedTuple):
    alpha: jnp.ndarray
    nu: jnp.ndarray
    rho: jnp.ndarray
    rmse: jnp.ndarray          # root-mean-square IV residual at the fit
    n_iter: int


def _theta_to_params(theta):
    return (jnp.exp(theta[0]), jnp.exp(theta[1]),
            jnp.float32(0.999) * jnp.tanh(theta[2]))


@functools.partial(jax.jit, static_argnames=("beta", "n_iter"))
def calibrate_sabr(f, t, strikes, target_ivs, *, beta: float = 1.0,
                   init=(0.2, 0.4, -0.3), n_iter: int = 40,
                   lm_damping: float = 1e-3) -> SABRFit:
    """Fit (alpha, nu, rho) of a beta-pinned SABR smile to implied vols.

    ``strikes``/``target_ivs``: (M,) arrays (M >= 3).  ``beta`` is pinned
    (market convention: chosen a priori, the remaining three parameters
    are identified by the smile level/slope/curvature).  Returns the
    fitted parameters and the IV-space RMSE.

    Damped Gauss-Newton with Levenberg-Marquardt regularization; the
    unconstrained parameterization (log alpha, log nu, atanh-scaled rho)
    keeps every iterate feasible without clipping, so the fixed-trip loop
    is branch-free and the whole fit is one jitted XLA program (vmap it
    for surface-wide calibration across maturities).
    """
    f = jnp.float32(f)
    t = jnp.float32(t)
    strikes = jnp.asarray(strikes, jnp.float32)
    target = jnp.asarray(target_ivs, jnp.float32)
    a0, n0, r0 = (jnp.float32(v) for v in init)
    theta0 = jnp.stack([jnp.log(a0), jnp.log(n0),
                        jnp.arctanh(r0 / jnp.float32(0.999))])

    def residuals(theta):
        alpha, nu, rho = _theta_to_params(theta)
        return hagan_iv(f, strikes, t, alpha, beta, nu, rho) - target

    lam = jnp.float32(lm_damping)
    eye = jnp.eye(3, dtype=jnp.float32)

    def body(_, carry):
        theta, lam = carry
        r = residuals(theta)
        jac = jax.jacfwd(residuals)(theta)          # (M, 3)
        g = jac.T @ r
        h = jac.T @ jac
        step = jnp.linalg.solve(h + lam * eye, g)
        theta_new = theta - step
        better = jnp.sum(residuals(theta_new) ** 2) < jnp.sum(r * r)
        # classic LM damping schedule, branch-free
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e4)
        theta = jnp.where(better, theta_new, theta)
        return (theta, lam)

    theta, _ = jax.lax.fori_loop(0, n_iter, body, (theta0, lam))
    alpha, nu, rho = _theta_to_params(theta)
    rmse = jnp.sqrt(jnp.mean(residuals(theta) ** 2))
    return SABRFit(alpha=alpha, nu=nu, rho=rho, rmse=rmse, n_iter=n_iter)
