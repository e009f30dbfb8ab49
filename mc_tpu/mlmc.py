"""Multilevel Monte Carlo for biased discretizations (Giles 2008).

GBM needs no MLMC here (the log-Euler scheme is exact in distribution),
but the Heston full-truncation Euler scheme carries O(dt) weak bias —
exactly the setting multilevel was built for: write

    E[P_L] = E[P_0] + sum_l E[P_l - P_{l-1}]

with level l using ``n0 * 2^l`` integration substeps, and estimate each
correction with COUPLED paths: the coarse path consumes the pairwise sums
of the fine path's Brownian increments (z_c = (z_{2k} + z_{2k+1})/sqrt(2)
for both the variance and the orthogonal factor), so Var[P_l - P_{l-1}]
decays ~ O(dt_l) while a single-level estimator would pay the finest
cost at full variance.  Total cost to RMS accuracy eps drops from
O(eps^-3) to O(eps^-2 log^2 eps).

Level sample counts follow the standard allocation
N_l ~ sqrt(V_l / C_l) * sum(sqrt(V_l C_l)) / eps^2, estimated from pilot
runs.  The estimator runs through the jitted XLA engine (fast on TPU via
XLA fusion; the per-level coupled kernel is the same step loop the Pallas
engines use elsewhere).
"""

from __future__ import annotations

import dataclasses
import functools
from types import SimpleNamespace
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mc_tpu import rng
from mc_tpu.config import DEMO_OPTION, OptionParams
from mc_tpu.models.heston import (DEMO_HESTON, HestonDynamics, _pack_heston,
                                  _unpack_heston, heston_euler_step)
from mc_tpu.ops._pallas import LANES, round_up, xla_moment_scan
from mc_tpu.ops.payoffs import get_payoff
from mc_tpu.ops.reduce import finish_sum

__all__ = ["price_heston_mlmc", "MLMCResult", "heston_level_moments"]

# Path-dependent payoffs whose functional refines with the grid (each
# level prices a finer discretization of the SAME continuous contract) —
# Giles 2008's Asian/lookback setting.  Step-grid-defined contracts
# (bullet window, discrete knock-out count) are rejected.
_MLMC_PATH_OK = {"asian_call", "lookback_call", "up_out_call",
                 "down_in_call"}


def _coupled_level_tile(payoff, p, ids, valid, k0, k1, n_fine: int,
                        coupled: bool):
    """(P_fine - P_coarse) payoff tile with pairwise-coupled increments.

    Fine path: n_fine substeps.  Coarse path: n_fine/2 substeps driven by
    z_c = (z_{2k} + z_{2k+1}) / sqrt(2) — the same Brownian path seen at
    half resolution.  For level 0 (coupled=False) only the fine path runs;
    an odd n_fine there gets an epilogue substep so e.g. n0=1 integrates
    the full horizon instead of silently taking zero steps.

    Path-dependent payoffs (Asian mean, lookback max — Giles's original
    test cases) are supported: each leg carries its own payoff state,
    updated on ITS OWN grid, and evaluates the level's discretization of
    the continuous functional (per-leg dt / inv_n_steps in the params
    namespace).  Level-DEFINED contracts (the bullet's step-count window)
    are not grid-refinable and are rejected upstream.
    """
    if coupled and n_fine % 2:
        raise ValueError(
            f"coupled MLMC level needs an even substep count, got {n_fine}")
    if n_fine < 1:
        raise ValueError(f"n_fine must be >= 1, got {n_fine}")
    shape = ids.shape
    dt_f = p.t / jnp.float32(n_fine)
    sq_f = jnp.sqrt(dt_f)
    dt_c = dt_f * 2.0
    sq_c = jnp.sqrt(dt_c)
    inv_sqrt2 = jnp.float32(0.7071067811865476)
    track_state = payoff.n_state > 0
    pf = SimpleNamespace(**{**p.__dict__, "dt": dt_f,
                            "inv_n_steps": 1.0 / n_fine})
    pc = SimpleNamespace(**{**p.__dict__, "dt": dt_c,
                            "inv_n_steps": 2.0 / max(n_fine, 2)})

    def draw(j):
        c1 = jnp.full(shape, 0, jnp.uint32) + jnp.asarray(j, jnp.uint32)
        return rng.normal_pair(k0, k1, ids, c1)

    zero = jnp.zeros(shape, jnp.float32)
    v0 = jnp.full(shape, p.v0, jnp.float32)
    st_f0 = payoff.init(pf, zero)
    st_c0 = payoff.init(pc, zero)

    def fine_sub(wf, vf, st_f, z_v, z_p):
        wf, vf = heston_euler_step(p, wf, vf, z_v, z_p, dt_f, sq_f)
        if track_state:
            st_f = payoff.update(st_f, p.s0 * jnp.exp(wf), pf)
        return wf, vf, st_f

    def body(k, carry):
        wf, vf, wc, vc, st_f, st_c = carry
        z_v0, z_p0 = draw(2 * k)
        z_v1, z_p1 = draw(2 * k + 1)
        wf, vf, st_f = fine_sub(wf, vf, st_f, z_v0, z_p0)
        wf, vf, st_f = fine_sub(wf, vf, st_f, z_v1, z_p1)
        if coupled:
            zc_v = (z_v0 + z_v1) * inv_sqrt2
            zc_p = (z_p0 + z_p1) * inv_sqrt2
            wc, vc = heston_euler_step(p, wc, vc, zc_v, zc_p, dt_c, sq_c)
            if track_state:
                st_c = payoff.update(st_c, p.s0 * jnp.exp(wc), pc)
        return (wf, vf, wc, vc, st_f, st_c)

    wf, vf, wc, vc, st_f, st_c = jax.lax.fori_loop(
        0, n_fine // 2, body, (zero, v0, zero, v0, st_f0, st_c0))
    if n_fine % 2:
        # uncoupled odd tail: the pair loop covered draws 0..n_fine-2
        z_v, z_p = draw(n_fine - 1)
        wf, vf, st_f = fine_sub(wf, vf, st_f, z_v, z_p)
    s_f = p.s0 * jnp.exp(wf)
    pay = payoff.terminal(st_f, s_f, pf)
    if coupled:
        s_c = p.s0 * jnp.exp(wc)
        pay = pay - payoff.terminal(st_c, s_c, pc)
    return jnp.where(valid, pay, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("payoff", "n_paths", "n_fine", "coupled", "tile_rows"))
def heston_level_moments(option, heston, payoff, n_paths, n_fine, coupled,
                         tile_rows, key, path_offset=0):
    """(sum Y, sum Y^2) of the level-l correction over paths
    [path_offset, path_offset + n_paths)."""
    p = _unpack_heston(_pack_heston_ns(option, heston))
    k0 = jnp.asarray(key[0], jnp.uint32)
    k1 = jnp.asarray(key[1], jnp.uint32)
    offset = jnp.asarray(path_offset, jnp.uint32)

    def tile_fn(ids, valid):
        pay = _coupled_level_tile(payoff, p, ids, valid, k0, k1, n_fine,
                                  coupled)
        return [pay, pay * pay]

    s, sq = xla_moment_scan(tile_fn, n_paths, tile_rows, 2, offset=offset,
                            bound=offset + jnp.uint32(n_paths))
    return finish_sum(s), finish_sum(sq)


def _pack_heston_ns(option, heston):
    # reuse the heston param vector (n_steps irrelevant for the namespace
    # fields the coupled stepper uses; dt/sqrt_dt recomputed per level)
    return _pack_heston(option, heston, 1)


@dataclasses.dataclass(frozen=True)
class MLMCResult:
    price: Any
    stderr: Any
    levels: tuple            # n_fine per level
    n_per_level: tuple
    level_means: tuple
    level_vars: tuple

    def variance_decay_rate(self) -> float:
        """Fitted beta in Var[Y_l] ~ 2^{-beta l} over the coupled levels."""
        v = np.asarray(self.level_vars[1:], np.float64)
        ell = np.arange(1, len(self.level_vars))
        mask = v > 0
        if mask.sum() < 2:
            return float("nan")
        slope = np.polyfit(ell[mask], np.log2(v[mask]), 1)[0]
        return float(-slope)


def price_heston_mlmc(option: OptionParams = DEMO_OPTION,
                      heston: HestonDynamics = DEMO_HESTON,
                      payoff="vanilla_call",
                      *,
                      n0: int = 4,
                      n_levels: int = 5,
                      n_pilot: int = 20_000,
                      eps: Optional[float] = None,
                      n_per_level: Optional[Sequence[int]] = None,
                      tile_rows: int = 64,
                      seed: int = 1234) -> MLMCResult:
    """Multilevel Heston price to target RMS accuracy ``eps``.

    Level l integrates with ``n0 * 2^l`` substeps; pilot runs estimate
    (V_l, C_l) and the standard allocation sizes N_l (overridable with
    ``n_per_level``).  Each level uses an independent threefry stream.
    """
    po = get_payoff(payoff)
    if not (po.terminal_only or po.name in _MLMC_PATH_OK):
        raise ValueError(
            f"MLMC supports terminal payoffs and the grid-refinable "
            f"path functionals {sorted(_MLMC_PATH_OK)}; {po.name!r} is "
            "defined by the step grid itself (e.g. a step-count window) "
            "so the levels would price different contracts")
    if n0 < 1:
        raise ValueError(f"n0 must be >= 1, got {n0}")
    opt32 = option.as_f32()
    hes32 = heston.as_f32()
    fines = tuple(n0 * (1 << l) for l in range(n_levels))
    keys = [jnp.asarray(rng.derive_key(seed, 0x4D4C, l), jnp.uint32)
            for l in range(n_levels)]

    n_pilot = round_up(max(n_pilot, 1024), tile_rows * LANES)

    def level_sums(l, n, path_offset=0):
        """(sum, sumsq, n) over n paths starting at path_offset."""
        n = round_up(max(n, 0), tile_rows * LANES)
        if n == 0:
            return 0.0, 0.0, 0
        s, sq = heston_level_moments(opt32, hes32, po, n, fines[l], l > 0,
                                     tile_rows, keys[l],
                                     jnp.uint32(path_offset))
        return float(s), float(sq), n

    # pilot pass — sums are KEPT and merged into the final estimate
    pilot = [level_sums(l, n_pilot) for l in range(n_levels)]
    v_l = np.array([max(sq / n - (s / n) ** 2, 0.0)
                    for s, sq, n in pilot])
    c_l = np.array([fines[l] for l in range(n_levels)], float)

    if n_per_level is None:
        if eps is None:
            eps = 2e-3
        lam = np.sum(np.sqrt(v_l * c_l)) / (eps * eps / 2.0)
        n_l = np.maximum(np.ceil(lam * np.sqrt(v_l / c_l)), n_pilot)
    else:
        n_l = np.asarray(n_per_level, float)

    means, varis, ns = [], [], []
    for l in range(n_levels):
        s0_, sq0, n0_ = pilot[l]
        # only the incremental paths beyond the pilot are simulated,
        # at a shifted global path offset (same stream, disjoint range)
        s1, sq1, n1 = level_sums(l, int(n_l[l]) - n0_, path_offset=n0_)
        s, sq, n = s0_ + s1, sq0 + sq1, n0_ + n1
        mean = s / n
        means.append(mean)
        varis.append(max(sq / n - mean * mean, 0.0))
        ns.append(n)

    disc = float(np.exp(-float(opt32.r) * float(opt32.t)))
    price = disc * sum(means)
    stderr = disc * float(np.sqrt(sum(v / n for v, n in zip(varis, ns))))
    return MLMCResult(price=price, stderr=stderr, levels=fines,
                      n_per_level=tuple(ns), level_means=tuple(means),
                      level_vars=tuple(varis))
