"""Nested Monte Carlo under a local-volatility surface.

Extends the flagship NMC capability (the reference's ``inc/nmc.cuh``
re-pricing of every (path, step) point, SURVEY.md C10-C12) to the
smile: conditional values — and hence exposure profiles — under a
sigma(S, t) surface instead of flat vol.

Inner legs resume from the stored (S_j, payoff-state) point; because the
surface is a function of ABSOLUTE log-moneyness log(S/S0) and calendar
step, the inner path's moneyness starts at log(S_j/S0) and each inner
substep u evaluates the surface at step index j+1+u — the same clamped-
ramp lookup as the outer kernel.

Martingale gate: with full e^{-rT} discounting the conditional value of
a NON-NEGATIVE payoff is a martingale, so a vanilla call's expected-
exposure profile must be FLAT at the time-0 price at EVERY step — the
smile moves the PFE quantiles, never the EE mean.

Inner-draw convention: point (i, j), inner path m consumes threefry
pairs ``((j+1)*n_inner + m)*pair_cap + q`` on the inner key,
pair_cap = ceil(n_steps/2), two substeps per pair with the trailing odd
substep dropped by a uniform predicated select (the
`nmc_kernels._simulate_resumed` scheme — both normals used).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mc_tpu import rng
from mc_tpu.config import DEMO_OPTION, DEMO_SIM, OptionParams, SimParams
from mc_tpu.models.localvol import (DEMO_LOCALVOL, LocalVolSurface,
                                    _make_sigma_at, _pack_localvol,
                                    _unpack_localvol_head,
                                    localvol_trajectories_kernel,
                                    validate_surface)
from mc_tpu.nmc import NMCResult
from mc_tpu.oracle import summarize
from mc_tpu.ops import path_kernels as pk
from mc_tpu.ops._pallas import LANES, SUBLANES, use_interpret
from mc_tpu.ops.payoffs import PathPayoff, get_payoff
from mc_tpu.ops.reduce import finish_sum

__all__ = ["price_nmc_localvol"]

STREAM_OUTER, STREAM_INNER = 0, 1


def _localvol_point_tile(payoff: PathPayoff, n_steps: int, n_inner: int,
                         p, sigma_at, ki0, ki1, ids, j, s_t, state_t,
                         bitcast):
    """Inner-MC payoff SUM over n_inner local-vol legs resumed from one
    (path-tile, step j) point; the caller divides and discounts.

    Both normals of each threefry pair are consumed (two substeps per
    pair, the established `nmc_kernels._simulate_resumed` scheme); the
    trailing odd substep is dropped by a uniform predicated select.
    """
    remaining = jnp.int32(n_steps) - j - 1
    pair_cap = (n_steps + 1) // 2  # static counter stride per inner path
    t_base = ((jnp.asarray(j, jnp.uint32) + jnp.uint32(1))
              * jnp.uint32(n_inner))
    base_drift = (p.r - p.q) * p.dt
    sdt = jnp.sqrt(p.dt)
    w0 = jnp.log(s_t / p.s0)  # absolute log-moneyness at the point
    last = jnp.int32(n_steps - 1)

    def substep(w, state, z, u):
        # clamp the (masked-out) overrun substep's surface index in-range
        sg = sigma_at(w, jnp.minimum(u, last))
        w = w + (base_drift - 0.5 * sg * sg * p.dt) + sg * sdt * z
        return w, payoff.update(state, p.s0 * jnp.exp(w), p)

    def inner(m, carry):
        acc, comp = carry
        c_base = ((t_base + jnp.asarray(m, jnp.uint32))
                  * jnp.uint32(pair_cap))

        def body(q, carry2):
            w, state = carry2
            c1 = (jnp.full(ids.shape, 0, jnp.uint32) + c_base
                  + jnp.asarray(q, jnp.uint32))
            z0, z1 = rng.normal_pair(ki0, ki1, ids, c1, bitcast=bitcast)
            u1 = j + 1 + 2 * q
            w1, st1 = substep(w, state, z0, u1)
            w2, st2 = substep(w1, st1, z1, u1 + 1)
            take2 = (2 * q + 1) < remaining
            w = jnp.where(take2, w2, w1)
            state = tuple(jnp.where(take2, b, a)
                          for a, b in zip(st1, st2))
            return (w, state)

        n_pairs = (remaining + 1) // 2
        w, state = jax.lax.fori_loop(0, n_pairs, body, (w0, state_t))
        pay = payoff.terminal(state, p.s0 * jnp.exp(w), p)
        y = pay - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp)

    acc, _ = jax.lax.fori_loop(
        0, n_inner, inner,
        (jnp.zeros_like(s_t), jnp.zeros_like(s_t)))
    return acc


def _make_localvol_inner_kernel(payoff: PathPayoff, n_steps: int,
                                n_inner: int, tile_rows: int,
                                n_knots: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ki_ref, params_ref, meta_ref, s_ref, c_ref, surf_ref):
        p = _unpack_localvol_head(params_ref)
        t_idx = pl.program_id(0)
        i = pl.program_id(1)
        shape = (tile_rows, LANES)
        base = jnp.uint32(i * tile_rows * LANES)
        flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * LANES
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        ids = meta_ref[0] + base + flat
        valid = ids < meta_ref[1]
        sigma_at = _make_sigma_at(params_ref, n_steps, n_knots)
        st_j = (c_ref[0],) if payoff.n_state else ()
        inner_sum = _localvol_point_tile(
            payoff, n_steps, n_inner, p, sigma_at, ki_ref[0], ki_ref[1],
            ids, t_idx, s_ref[0], st_j, pltpu.bitcast)
        # reference parity: full e^{-rT} per point (nmc.cuh:100-104)
        v = inner_sum * (1.0 / n_inner) * jnp.exp(-p.r * p.t)
        surf_ref[0] = jnp.where(valid, v, 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("payoff", "n_steps", "n_inner", "tile_rows",
                     "n_tiles", "n_knots", "interpret"))
def localvol_nmc_inner_kernel(payoff, n_steps, n_inner, tile_rows,
                              n_tiles, n_knots, key_inner, params, s_grid,
                              c_grid, n_valid, interpret=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = use_interpret()
    rows = n_tiles * tile_rows
    tile3 = pl.BlockSpec((1, tile_rows, LANES), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM)
    meta = jnp.stack([jnp.uint32(0), jnp.asarray(n_valid, jnp.uint32)])
    return pl.pallas_call(
        _make_localvol_inner_kernel(payoff, n_steps, n_inner, tile_rows,
                                    n_knots),
        grid=(n_steps, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [tile3, tile3],
        out_specs=tile3,
        out_shape=jax.ShapeDtypeStruct((n_steps, rows, LANES), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(key_inner, jnp.uint32), params, meta, s_grid, c_grid)


def _xla_nmc_localvol(payoff, sim, params, n_knots, key_outer, key_inner,
                      tile_rows):
    """Pure-jnp dual: identical outer/inner streams and Kahan order."""
    p = _unpack_localvol_head(params)
    n = sim.n_steps
    sigma_at = _make_sigma_at(params, n, n_knots)
    ko0, ko1 = (jnp.asarray(key_outer[i], jnp.uint32) for i in (0, 1))
    ki0, ki1 = (jnp.asarray(key_inner[i], jnp.uint32) for i in (0, 1))
    shape = (tile_rows, LANES)
    flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    per_tile = tile_rows * LANES
    n_tiles = -(-sim.n_paths // per_tile)
    bound = jnp.uint32(sim.n_paths)
    base_drift = (p.r - p.q) * p.dt
    sdt = jnp.sqrt(p.dt)

    def one_tile(carry, i):
        acc, comp = carry
        ids = jnp.uint32(i * per_tile) + flat
        valid = ids < bound
        s0 = jnp.full(shape, p.s0, jnp.float32)
        state0 = payoff.init(p, jnp.zeros_like(s0))

        def outer_pair(carry2, jj):
            # mirrors _localvol_leg's pair loop: pair jj -> steps 2jj,2jj+1
            (w, state) = carry2
            c1 = jnp.full(shape, 0, jnp.uint32) + jj
            z0, z1 = rng.normal_pair(ko0, ko1, ids, c1)
            recs = []
            for step_idx, z in ((2 * jj, z0), (2 * jj + 1, z1)):
                sg = sigma_at(w, step_idx)
                w = w + (base_drift - 0.5 * sg * sg * p.dt) + sg * sdt * z
                s = s0 * jnp.exp(w)
                state = payoff.update(state, s, p)
                cv = state[0] if payoff.n_state else jnp.zeros_like(s)
                recs.append((s, cv))
            stacked = tuple(jnp.stack([a, b])
                            for a, b in zip(recs[0], recs[1]))
            return (w, state), stacked

        (w, state), recs = jax.lax.scan(
            outer_pair, (jnp.zeros_like(s0), state0),
            jnp.arange(n // 2, dtype=jnp.uint32))
        s_hist, c_hist = (r.reshape((n,) + shape) for r in recs)
        s_t = s0 * jnp.exp(w)
        pay = jnp.where(valid, payoff.terminal(state, s_t, p), 0.0)
        for m, val in enumerate([pay, pay * pay]):
            acc, comp = pk.kahan_xla_update(
                acc, comp, m, pk.fold_to_sublanes(val, tile_rows))

        def step_fn(j):
            st_j = (c_hist[j],) if payoff.n_state else ()
            inner_sum = _localvol_point_tile(
                payoff, n, sim.n_paths_inner, p, sigma_at, ki0, ki1, ids,
                j.astype(jnp.int32), s_hist[j], st_j,
                jax.lax.bitcast_convert_type)
            val = (inner_sum * (1.0 / sim.n_paths_inner)
                   * jnp.exp(-p.r * p.t))
            return jnp.where(valid, val, 0.0)

        surf = jax.lax.map(step_fn, jnp.arange(n))
        return (acc, comp), surf

    zeros = jnp.zeros((2, SUBLANES, LANES), jnp.float32)
    (acc, _), surfs = jax.lax.scan(
        one_tile, (zeros, zeros), jnp.arange(n_tiles, dtype=jnp.uint32))
    surface = jnp.moveaxis(surfs, 0, 1).reshape(
        n, n_tiles * tile_rows, LANES)
    return surface, acc[0], acc[1]


@functools.partial(
    jax.jit,
    static_argnames=("payoff", "sim", "n_knots", "engine", "tile_rows",
                     "interpret"))
def _price_nmc_localvol_impl(option, surf, payoff, sim, n_knots, engine,
                             tile_rows, interpret, key_outer, key_inner):
    params = _pack_localvol(option, surf, sim.n_steps)
    p = _unpack_localvol_head(params)

    if engine == "xla":
        surface, osum, osq = _xla_nmc_localvol(
            payoff, sim, params, n_knots, key_outer, key_inner, tile_rows)
    elif engine == "pallas":
        cfg = pk.KernelConfig(n_paths=sim.n_paths, n_steps=sim.n_steps,
                              tile_rows=tile_rows)
        s_g, c_g, osum, osq = localvol_trajectories_kernel(
            payoff, cfg, n_knots, key_outer, params, interpret=interpret)
        surface = localvol_nmc_inner_kernel(
            payoff, sim.n_steps, sim.n_paths_inner, tile_rows, cfg.n_tiles,
            n_knots, key_inner, params, s_g, c_g, sim.n_paths,
            interpret=interpret)
    else:
        raise ValueError(f"unknown engine {engine!r}")

    outer = summarize(finish_sum(osum), finish_sum(osq),
                      jnp.asarray(sim.n_paths, jnp.float32),
                      jnp.exp(-p.r * p.t))
    n_points = sim.n_paths * sim.n_steps
    surface_mean = jnp.sum(surface, dtype=jnp.float32) / n_points
    return NMCResult(surface=surface, outer=outer,
                     surface_mean=surface_mean,
                     n_points=jnp.asarray(n_points, jnp.float32),
                     t_horizon=jnp.asarray(option.t, jnp.float32))


def price_nmc_localvol(option: OptionParams = DEMO_OPTION,
                       surf: LocalVolSurface = None,
                       sim: SimParams = DEMO_SIM,
                       payoff="vanilla_call",
                       *,
                       engine: str = "pallas",
                       tile_rows: int = 8,
                       stream_outer: int = STREAM_OUTER,
                       stream_inner: int = STREAM_INNER,
                       interpret: Optional[bool] = None) -> NMCResult:
    """Nested MC price surface under a local-volatility smile.

    Every (path, step) point is re-priced by ``sim.n_paths_inner`` inner
    legs resumed from the stored (S_t, payoff state), stepping on the
    SAME sigma(S, t) surface — exposure profiles
    (``result.exposure_profile()``) and CVA under the smile.
    """
    if surf is None:
        surf = (DEMO_LOCALVOL if sim.n_steps == 100
                else LocalVolSurface.demo(sim.n_steps))
    po = get_payoff(payoff)
    if po.n_state > 1:
        raise ValueError("NMC supports payoffs with at most one state "
                         "array")
    s32 = validate_surface(surf, sim.n_steps)
    if sim.n_steps % 2:
        raise ValueError("localvol requires an even n_steps "
                         "(pair-consuming outer loop)")
    span = ((sim.n_steps + 1) * sim.n_paths_inner
            * ((sim.n_steps + 1) // 2))
    if span >= 1 << 32:
        raise ValueError(
            "inner RNG counter space exhausted: "
            "(n_steps+1)*n_inner*ceil(n_steps/2) = "
            f"{span} >= 2^32; reduce n_steps or n_paths_inner")
    key_outer = jnp.asarray(
        rng.derive_key(sim.seed, stream_outer, 0x10CA), jnp.uint32)
    key_inner = jnp.asarray(
        rng.derive_key(sim.seed, stream_inner, 0x10CA), jnp.uint32)
    return _price_nmc_localvol_impl(option.as_f32(), s32, po,
                                    sim.replace(seed=0), s32.n_knots,
                                    engine, tile_rows, interpret,
                                    key_outer, key_inner)
