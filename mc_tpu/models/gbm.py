"""Geometric Brownian Motion dynamics.

The reference hard-codes GBM in every kernel:

* exact one-shot terminal draw over the full horizon ``T``:
  ``St *= exp((r - sigma^2/2) T + sigma sqrt(T) G)``
  (``inc/trajectories.cuh:74-75``, ``inc/tool.cuh:120-126``);
* log-Euler step of size ``dt``:
  ``St *= exp((r - sigma^2/2) dt + sigma sqrt(dt) G)``
  (``inc/trajectories.cuh:144-148``, ``inc/tool.cuh:155-171``).

Here the dynamics are pure functions shared by the XLA engines and the
Pallas kernels (both trace the same jnp ops), and `GBM` packages them with
precomputed per-step drift/vol coefficients so kernels do the two
multiplies + one exp per step and nothing else.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["gbm_exact_terminal", "gbm_log_euler_step", "GBM"]


def gbm_exact_terminal(s0, t, r, sigma, z):
    """S_T = S0 * exp((r - sigma^2/2) T + sigma sqrt(T) Z).

    Exact under GBM — no discretization error (the reference's "vanilla with
    reduce" kernel uses this, trajectories.cuh:74-75).
    """
    drift = (r - 0.5 * sigma * sigma) * t
    vol = sigma * jnp.sqrt(t)
    return s0 * jnp.exp(drift + vol * z)


def gbm_log_euler_step(s, dt, r, sigma, z):
    """One log-Euler step: S <- S * exp((r - sigma^2/2) dt + sigma sqrt(dt) Z)."""
    drift = (r - 0.5 * sigma * sigma) * dt
    vol = sigma * jnp.sqrt(dt)
    return s * jnp.exp(drift + vol * z)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GBM:
    """GBM with precomputed log-step coefficients: log S step = a + b Z."""

    drift_dt: Any   # (r - sigma^2/2) * dt
    vol_dt: Any     # sigma * sqrt(dt)
    drift_t: Any    # (r - sigma^2/2) * T
    vol_t: Any      # sigma * sqrt(T)

    @staticmethod
    def make(t, r, sigma, n_steps: int) -> "GBM":
        t = jnp.float32(t)
        r = jnp.float32(r)
        sigma = jnp.float32(sigma)
        dt = t / jnp.float32(n_steps)
        return GBM(
            drift_dt=(r - 0.5 * sigma * sigma) * dt,
            vol_dt=sigma * jnp.sqrt(dt),
            drift_t=(r - 0.5 * sigma * sigma) * t,
            vol_t=sigma * jnp.sqrt(t),
        )

    def step(self, s, z):
        """One log-Euler step (vector)."""
        return s * jnp.exp(self.drift_dt + self.vol_dt * z)

    def terminal(self, s0, z):
        """Exact terminal draw over the full horizon."""
        return s0 * jnp.exp(self.drift_t + self.vol_t * z)
