"""XVA metrics on nested-MC value surfaces.

The NMC engines (`nmc.py`, `nmc_engine.py`, `nmc_book.py`) produce a
per-(path, step) conditional-value surface V_ij — the reference's
flagship output (`/root/reference/inc/nmc.cuh:12-386` materializes the
same object for ONE contract).  This module turns that surface into the
quantities an XVA desk actually books, shared by every result type
through the `ExposureMetrics` mixin:

* EE/ENE/PFE profiles (positive and negative expected exposure),
* unilateral CVA (counterparty default leg, flat hazard),
* DVA (own default leg, on the NEGATIVE exposure) and bilateral
  CVA = CVA - DVA,
* FVA split into funding cost (FCA, on EE) and benefit (FBA, on ENE),
* collateralized exposure under a two-way CSA: thresholds, minimum
  transfer amount, and a margin period of risk (the collateral held at
  t_j was called at t_{j-m}, so the exposure keeps the last m steps of
  market moves — the standard discrete-CSA model, Gregory ch. 7 /
  Brigo-Morini-Pallavicini ch. 13).

All values are ALREADY discounted (the engines discount the inner legs
to t=0), so the metrics integrate profiles directly — the EE* convention
`NMCResult.cva` documents.

Observation dates.  Surface column j observes the portfolio value at a
date t_j; all time integrals (default-leg increments, funding/margin
dt-weights, WWR intensity) are taken over the actual intervals
(t_{j-1}, t_j] with t_0 = 0.  NMC surfaces observe on the uniform step
grid t_j = j*T/n (the default); the rates exposure matrices observe at
COUPON dates expiry + i*tenor — non-uniform from 0 whenever
expiry != tenor — and carry that vector explicitly in ``obs_dates``
(round-4 fix: the uniform assumption misallocated default probability
across dates for every rates CVA).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp

__all__ = ["ExposureMetrics", "CollateralizedExposure", "coupon_dates"]


def coupon_dates(expiry, tenor, n):
    """Observation dates of a rates exposure grid: expiry + i*tenor for
    i = 0..n-1 (the swap's coupon/exercise dates — the grid every
    hw/g2/swaption exposure matrix observes on)."""
    return (jnp.float32(expiry)
            + jnp.arange(n, dtype=jnp.float32) * jnp.float32(tenor))


def _grid_weights(dates):
    """(t, t_prev, dt) from an explicit observation-date vector t_1..t_n
    (t_0 = 0): the integration intervals (t_{j-1}, t_j]."""
    t = jnp.asarray(dates, jnp.float32)
    t_prev = jnp.concatenate([jnp.zeros((1,), jnp.float32), t[:-1]])
    return t, t_prev, t - t_prev


def _cva_on(v, hazard_rate, recovery, dates, side: float):
    """Default-leg integral on the positive (side=+1, CVA) or negative
    (side=-1, DVA) part of the value matrix ``v`` (n_paths, n_steps),
    observed at ``dates``: (1-R) * sum_j E[(side*V_j)^+] *
    [e^{-lam t_{j-1}} - e^{-lam t_j}]."""
    exp_prof = jnp.mean(jnp.maximum(side * v, 0.0), axis=0)
    t, t_prev, _ = _grid_weights(dates)
    lam = jnp.float32(hazard_rate)
    dpd = jnp.exp(-lam * t_prev) - jnp.exp(-lam * t)
    return (1.0 - jnp.float32(recovery)) * jnp.sum(exp_prof * dpd)


class ExposureMetrics:
    """Shared XVA surface metrics.  Hosts require ``surface_matrix()``
    -> (n_paths, n_steps) discounted values and a ``t_horizon`` field
    (both NMCResult and NMCBookResult provide them).  Hosts whose
    columns do NOT observe on the uniform grid j*T/n additionally carry
    an ``obs_dates`` vector (the rates exposure matrices observe at
    coupon dates expiry + i*tenor); when present it is authoritative
    and any ``t_horizon=`` override is ignored.
    """

    obs_dates = None  # hosts with non-uniform observation set a field

    def observation_dates(self, t_horizon: Optional[float] = None,
                          n: Optional[int] = None):
        """Dates t_1..t_n the surface columns observe at (t_0 = 0 is
        implicit).  ``obs_dates`` if the host carries one, else the
        uniform grid j * t_horizon / n.  ``n``: the column count, when
        the caller already holds the surface (avoids materializing it a
        second time just for its shape)."""
        od = getattr(self, "obs_dates", None)
        if od is not None:
            return jnp.asarray(od, jnp.float32)
        if n is None:
            n = self.surface_matrix().shape[1]
        th = jnp.float32(self.t_horizon if t_horizon is None
                         else t_horizon)
        return jnp.arange(1, n + 1, dtype=jnp.float32) * (th / n)

    def exposure_profile(self, quantile: float = 0.95):
        """Counterparty-exposure profile from the value surface.

        Returns (ee, pfe): expected exposure EE_j = mean(max(V_j, 0))
        and the `quantile` potential future exposure per observation
        date — the standard XVA outputs the NMC surface exists for
        (BASELINE.json config 4 "exposure estimates").  Shapes
        (n_steps,).
        """
        pos = jnp.maximum(self.surface_matrix(), 0.0)
        return jnp.mean(pos, axis=0), jnp.quantile(pos, quantile, axis=0)

    def ene_profile(self, quantile: float = 0.95):
        """(ENE, NPFE): expected NEGATIVE exposure mean(max(-V, 0)) and
        its quantile per step — the own-default / funding-benefit side."""
        neg = jnp.maximum(-self.surface_matrix(), 0.0)
        return jnp.mean(neg, axis=0), jnp.quantile(neg, quantile, axis=0)

    def cva(self, hazard_rate: float, recovery: float = 0.4,
            t_horizon: Optional[float] = None):
        """Unilateral CVA from the expected-exposure profile.

        CVA = (1 - R) * sum_j EE(t_j) * PD(t_{j-1}, t_j) with a flat
        hazard rate: PD over (a, b] = e^{-lambda a} - e^{-lambda b},
        t_j the actual observation dates.  The surface values are
        already discounted, so no extra discount factor is applied (the
        standard EE* convention).  ``t_horizon`` rescales the uniform
        grid only (ignored when the host carries ``obs_dates``).
        """
        v = self.surface_matrix()
        return _cva_on(v, hazard_rate, recovery,
                       self.observation_dates(t_horizon, v.shape[1]),
                       +1.0)

    def dva(self, own_hazard_rate: float, own_recovery: float = 0.4,
            t_horizon: Optional[float] = None):
        """Debit valuation adjustment: the own-default leg on the
        negative exposure (what the counterparty would lose)."""
        v = self.surface_matrix()
        return _cva_on(v, own_hazard_rate, own_recovery,
                       self.observation_dates(t_horizon, v.shape[1]),
                       side=-1.0)

    def bilateral_cva(self, hazard_rate: float, own_hazard_rate: float,
                      recovery: float = 0.4, own_recovery: float = 0.4,
                      t_horizon: Optional[float] = None):
        """BCVA = CVA - DVA (independent flat hazards; no first-to-
        default correction — the additive convention desks report)."""
        v = self.surface_matrix()
        dates = self.observation_dates(t_horizon, v.shape[1])
        return (_cva_on(v, hazard_rate, recovery, dates, +1.0)
                - _cva_on(v, own_hazard_rate, own_recovery, dates, -1.0))

    def fva(self, funding_spread: float,
            t_horizon: Optional[float] = None):
        """(FCA, FBA): funding cost spread * integral EE dt on the
        positive exposure, funding benefit on the negative, each date
        weighted by its actual interval t_j - t_{j-1}.  Net
        FVA = FCA - FBA."""
        v = self.surface_matrix()
        _, _, dt = _grid_weights(
            self.observation_dates(t_horizon, v.shape[1]))
        sp = jnp.float32(funding_spread)
        fca = sp * jnp.sum(jnp.mean(jnp.maximum(v, 0.0), axis=0) * dt)
        fba = sp * jnp.sum(jnp.mean(jnp.maximum(-v, 0.0), axis=0) * dt)
        return fca, fba

    def cva_wwr(self, hazard_rate: float, beta: float,
                recovery: float = 0.4, t_horizon: Optional[float] = None):
        """CVA under WRONG-WAY RISK: the default intensity rides each
        path's own exposure, lambda_i(t_j) = hazard_rate * exp(beta *
        (V_ij - mean_j V)) (Hull-White 2012's exposure-linked intensity,
        centered so beta=0 reproduces the flat-hazard `cva` exactly).
        Positive beta makes default MORE likely exactly when the
        exposure is large — the correlation a flat-hazard CVA misses.
        Survival and default increments are evaluated PER PATH along its
        own intensity path over the actual observation intervals, then
        averaged.
        """
        v = self.surface_matrix()
        _, _, dt = _grid_weights(
            self.observation_dates(t_horizon, v.shape[1]))
        lam = (jnp.float32(hazard_rate)
               * jnp.exp(jnp.float32(beta)
                         * (v - jnp.mean(v, axis=0, keepdims=True))))
        # per-path survival to t_{j-1} and default prob over (t_{j-1}, t_j]
        h = lam * dt
        cum = jnp.cumsum(h, axis=1)
        surv_prev = jnp.exp(-(cum - h))
        dpd = surv_prev * (1.0 - jnp.exp(-h))
        pos = jnp.maximum(v, 0.0)
        return (1.0 - jnp.float32(recovery)) * jnp.mean(
            jnp.sum(pos * dpd, axis=1))

    def im_profile(self, quantile: float = 0.99, mpor_steps: int = 2):
        """Dynamic initial margin: IM(t_j) = the ``quantile`` of the
        adverse value move (V_{j+m} - V_j)^+ over the margin period of
        risk — the ISDA-SIMM-style quantile-of-PnL model computed
        directly on the simulated surface.  The last m dates (no full
        MPoR left inside the horizon) carry the final computable value.
        """
        if mpor_steps < 1:
            raise ValueError(f"mpor_steps must be >= 1, got {mpor_steps}")
        v = self.surface_matrix()
        m = min(int(mpor_steps), v.shape[1] - 1)
        if m < 1:
            return jnp.zeros((v.shape[1],), v.dtype)
        move = jnp.maximum(v[:, m:] - v[:, :-m], 0.0)
        im = jnp.quantile(move, quantile, axis=0)
        pad = jnp.full((m,), im[-1], im.dtype)
        return jnp.concatenate([im, pad])

    def mva(self, funding_spread: float, quantile: float = 0.99,
            mpor_steps: int = 2, t_horizon: Optional[float] = None):
        """Margin valuation adjustment: the funding cost of posting the
        initial-margin profile, spread * integral IM(t) dt over the
        actual observation intervals."""
        im = self.im_profile(quantile, mpor_steps)
        _, _, dt = _grid_weights(
            self.observation_dates(t_horizon, im.shape[0]))
        return jnp.float32(funding_spread) * jnp.sum(im * dt)

    def collateralized(self, threshold: float = 0.0,
                       own_threshold: Optional[float] = None,
                       mta: float = 0.0,
                       mpor_steps: int = 0) -> "CollateralizedExposure":
        """Exposure under a two-way CSA.

        The collateral balance held against date t_j was fixed at the
        call date t_{j-m} (``mpor_steps`` = m, the margin period of
        risk): C_j = (V_{j-m} - H)^+ - (-V_{j-m} - H_own)^+, each leg
        posted only when the call amount exceeds ``mta``.  The
        collateralized value V_j - C_j keeps exactly the last m steps
        of market moves plus the threshold/MTA stubs.  m=0 means
        instantaneous margining: with H = mta = 0 the residual exposure
        is identically zero (gated in tests).  The host's observation
        dates carry through to the collateralized metrics.
        """
        if mpor_steps < 0:
            raise ValueError(f"mpor_steps must be >= 0, got {mpor_steps}")
        if mta < 0.0:
            raise ValueError(f"mta must be >= 0, got {mta}")
        v = self.surface_matrix()
        h_c = jnp.float32(threshold)
        h_o = jnp.float32(threshold if own_threshold is None
                          else own_threshold)
        m = int(mpor_steps)
        # value at the collateral-call date: lag by m steps; the first m
        # dates are uncollateralized (no call has settled yet) -> C = 0,
        # encoded by lagging against a zero-padded matrix and treating
        # V_call = 0 there (both legs clamp to zero).
        if m == 0:
            v_call = v
        else:
            # m >= n_steps means no call ever settles inside the horizon
            m = min(m, v.shape[1])
            v_call = jnp.concatenate(
                [jnp.zeros((v.shape[0], m), v.dtype), v[:, : v.shape[1] - m]],
                axis=1)
        call_c = jnp.maximum(v_call - h_c, 0.0)
        call_o = jnp.maximum(-v_call - h_o, 0.0)
        mta_f = jnp.float32(mta)
        coll = (jnp.where(call_c > mta_f, call_c, 0.0)
                - jnp.where(call_o > mta_f, call_o, 0.0))
        return CollateralizedExposure(values=v - coll,
                                      t_horizon=self.t_horizon,
                                      obs_dates=getattr(self, "obs_dates",
                                                        None))


@dataclasses.dataclass(frozen=True)
class CollateralizedExposure(ExposureMetrics):
    """Value matrix with the full metrics surface — `exposure_profile` /
    `cva` / `dva` / `fva` compose unchanged.  Doubles as the carrier for
    any externally built exposure matrix (net-of-collateral values, the
    rates swap/Bermudan MtM grids, netting sets); non-uniform
    observation dates ride in ``obs_dates``."""

    values: Any          # (n_paths, n_steps), discounted
    t_horizon: Any
    obs_dates: Any = None  # (n_steps,) dates t_1..t_n; None = uniform grid

    def surface_matrix(self):
        return self.values
