"""Nested Monte Carlo under Merton jump-diffusion.

Extends the flagship NMC capability (the reference's ``inc/nmc.cuh``
re-pricing of every (path, step) point, SURVEY.md C10-C12) to the jump
model family: conditional re-pricing resumes from the stored
``(S_t, payoff_state_t)`` (the compound-Poisson increments are i.i.d., so
S is the whole market state) with jump-diffusion inner legs.  Exposure
profiles and CVA under CRASH RISK: jumps fatten the exposure tail, so
PFE/CVA under Merton exceed their diffusion-model counterparts at matched
vol — the standard XVA argument for jump models.

Same C10 "grid" design as nmc_heston: the Merton trajectory kernel
materializes step-major (S, state) HBM grids; an inner kernel re-prices
every point with ``n_paths_inner`` exact-in-law legs in registers.  The
XLA dual rebuilds identical streams (bitwise engine pair).

Inner-draw convention: point (path i, step j), inner path m, substep u
consumes counters ``c_base + 2u`` (Box-Muller pair -> diffusion normal z,
jump-size normal e) and ``c_base + 2u + 1`` (raw bits -> Poisson uniform)
with ``c_base = ((j+1) * n_inner + m) * 2 * n_steps``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mc_tpu import rng
from mc_tpu.config import DEMO_OPTION, DEMO_SIM, OptionParams, SimParams
from mc_tpu.models.merton import (DEMO_MERTON, MertonDynamics,
                                  _jump_increment, _pack_merton,
                                  _poisson_inv_cdf, _unpack_merton,
                                  merton_trajectories_kernel, poisson_kmax)
from mc_tpu.nmc import NMCResult
from mc_tpu.oracle import summarize
from mc_tpu.ops import path_kernels as pk
from mc_tpu.ops._pallas import LANES, SUBLANES, use_interpret
from mc_tpu.ops.payoffs import PathPayoff, get_payoff
from mc_tpu.ops.reduce import finish_sum

__all__ = ["price_nmc_merton"]

STREAM_OUTER, STREAM_INNER = 0, 1


def _merton_point_tile(payoff: PathPayoff, n_steps: int, n_inner: int,
                       kmax: int, p, ki0, ki1, ids, j, s_t, state_t,
                       bitcast):
    """Inner-MC payoff SUM over n_inner jump-diffusion legs resumed from
    one (path-tile, step j) point; the caller divides and discounts."""
    remaining = jnp.int32(n_steps) - j - 1
    t_base = ((jnp.asarray(j, jnp.uint32) + jnp.uint32(1))
              * jnp.uint32(n_inner))
    two_n = jnp.uint32(2 * n_steps)

    def inner(m, carry):
        acc, comp = carry
        c_base = (t_base + jnp.asarray(m, jnp.uint32)) * two_n

        def step(u, carry2):
            w, state = carry2
            cu = c_base + jnp.uint32(2) * jnp.asarray(u, jnp.uint32)
            c1 = jnp.full(ids.shape, 0, jnp.uint32) + cu
            z, e = rng.normal_pair(ki0, ki1, ids, c1, bitcast=bitcast)
            b0, _ = rng.threefry2x32(ki0, ki1, ids,
                                     c1 + jnp.uint32(1),
                                     rounds=rng.DEFAULT_ROUNDS)
            uu = rng.bits_to_unit(b0, bitcast)
            n = _poisson_inv_cdf(uu, p.lam_dt, kmax)
            w = w + p.drift_dt + p.vol_dt * z + _jump_increment(p, n, e)
            state = payoff.update(state, s_t * jnp.exp(w), p)
            return (w, state)

        w, state = jax.lax.fori_loop(0, remaining, step,
                                     (jnp.zeros_like(s_t), state_t))
        pay = payoff.terminal(state, s_t * jnp.exp(w), p)
        y = pay - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp)

    acc, _ = jax.lax.fori_loop(0, n_inner, inner,
                               (jnp.zeros_like(s_t), jnp.zeros_like(s_t)))
    return acc


def _discount(p):
    """Reference parity: the full e^{-rT} per point (nmc.cuh:100-104)."""
    return jnp.exp(-p.r * p.t)


def _make_merton_inner_kernel(payoff: PathPayoff, n_steps: int,
                              n_inner: int, kmax: int, tile_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ki_ref, params_ref, meta_ref, s_ref, c_ref, surf_ref):
        p = _unpack_merton(params_ref)
        t_idx = pl.program_id(0)
        i = pl.program_id(1)
        shape = (tile_rows, LANES)
        base = jnp.uint32(i * tile_rows * LANES)
        flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * LANES
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        ids = meta_ref[0] + base + flat
        valid = ids < meta_ref[1]
        st_j = (c_ref[0],) if payoff.n_state else ()
        inner_sum = _merton_point_tile(
            payoff, n_steps, n_inner, kmax, p, ki_ref[0], ki_ref[1], ids,
            t_idx, s_ref[0], st_j, pltpu.bitcast)
        v = inner_sum * (1.0 / n_inner) * _discount(p)
        surf_ref[0] = jnp.where(valid, v, 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("payoff", "n_steps", "n_inner", "kmax", "tile_rows",
                     "n_tiles", "interpret"))
def merton_nmc_inner_kernel(payoff, n_steps, n_inner, kmax, tile_rows,
                            n_tiles, key_inner, params, s_grid, c_grid,
                            n_valid, interpret=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = use_interpret()
    rows = n_tiles * tile_rows
    tile3 = pl.BlockSpec((1, tile_rows, LANES), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM)
    meta = jnp.stack([jnp.uint32(0), jnp.asarray(n_valid, jnp.uint32)])
    return pl.pallas_call(
        _make_merton_inner_kernel(payoff, n_steps, n_inner, kmax,
                                  tile_rows),
        grid=(n_steps, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [tile3, tile3],
        out_specs=tile3,
        out_shape=jax.ShapeDtypeStruct((n_steps, rows, LANES), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(key_inner, jnp.uint32), params, meta, s_grid, c_grid)


def _xla_nmc_merton(payoff, sim, params, kmax, key_outer, key_inner,
                    tile_rows):
    """Pure-jnp dual: identical outer/inner streams and Kahan order."""
    from mc_tpu.models.merton import _merton_draw3
    p = _unpack_merton(params)
    n = sim.n_steps
    ko0, ko1 = (jnp.asarray(key_outer[i], jnp.uint32) for i in (0, 1))
    ki0, ki1 = (jnp.asarray(key_inner[i], jnp.uint32) for i in (0, 1))
    shape = (tile_rows, LANES)
    flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    per_tile = tile_rows * LANES
    n_tiles = -(-sim.n_paths // per_tile)
    bound = jnp.uint32(sim.n_paths)

    def one_tile(carry, i):
        acc, comp = carry
        ids = jnp.uint32(i * per_tile) + flat
        valid = ids < bound
        s0 = jnp.full(shape, p.s0, jnp.float32)
        state0 = payoff.init(p, jnp.zeros_like(s0))

        def outer_pair(carry2, m):
            w, state = carry2
            z0, z1, e0, e1, u0, u1 = _merton_draw3(
                ko0, ko1, ids, m, jax.lax.bitcast_convert_type)

            def half(w, state, z, e, u):
                nj = _poisson_inv_cdf(u, p.lam_dt, kmax)
                w = w + p.drift_dt + p.vol_dt * z + _jump_increment(p, nj, e)
                s = s0 * jnp.exp(w)
                return w, s, payoff.update(state, s, p)

            w, s_a, state = half(w, state, z0, e0, u0)
            cv_a = state[0] if payoff.n_state else jnp.zeros_like(s_a)
            w, s_b, state = half(w, state, z1, e1, u1)
            cv_b = state[0] if payoff.n_state else jnp.zeros_like(s_b)
            return (w, state), (jnp.stack([s_a, s_b]),
                                jnp.stack([cv_a, cv_b]))

        (w, state), (s_hist, c_hist) = jax.lax.scan(
            outer_pair, (jnp.zeros_like(s0), state0),
            jnp.arange(n // 2, dtype=jnp.uint32))
        s_hist = s_hist.reshape((n,) + shape)
        c_hist = c_hist.reshape((n,) + shape)
        s_t = s0 * jnp.exp(w)
        pay = jnp.where(valid, payoff.terminal(state, s_t, p), 0.0)
        for m, val in enumerate([pay, pay * pay]):
            acc, comp = pk.kahan_xla_update(
                acc, comp, m, pk.fold_to_sublanes(val, tile_rows))

        def step_fn(j):
            st_j = (c_hist[j],) if payoff.n_state else ()
            inner_sum = _merton_point_tile(
                payoff, n, sim.n_paths_inner, kmax, p, ki0, ki1, ids,
                j.astype(jnp.int32), s_hist[j], st_j,
                jax.lax.bitcast_convert_type)
            val = inner_sum * (1.0 / sim.n_paths_inner) * _discount(p)
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
    static_argnames=("payoff", "sim", "kmax", "engine", "tile_rows",
                     "interpret"))
def _price_nmc_merton_impl(option, dyn, payoff, sim, kmax, engine,
                           tile_rows, interpret, key_outer, key_inner):
    params = _pack_merton(option, dyn, sim.n_steps)
    p = _unpack_merton(params)

    if engine == "xla":
        surface, osum, osq = _xla_nmc_merton(payoff, sim, params, kmax,
                                             key_outer, key_inner,
                                             tile_rows)
    elif engine == "pallas":
        cfg = pk.KernelConfig(n_paths=sim.n_paths, n_steps=sim.n_steps,
                              tile_rows=tile_rows)
        s_g, c_g, osum, osq = merton_trajectories_kernel(
            payoff, cfg, kmax, key_outer, params, interpret=interpret)
        surface = merton_nmc_inner_kernel(
            payoff, sim.n_steps, sim.n_paths_inner, kmax, tile_rows,
            cfg.n_tiles, key_inner, params, s_g, c_g, sim.n_paths,
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


def price_nmc_merton(option: OptionParams = DEMO_OPTION,
                     dyn: MertonDynamics = DEMO_MERTON,
                     sim: SimParams = DEMO_SIM,
                     payoff="vanilla_call",
                     *,
                     engine: str = "pallas",
                     tile_rows: int = 8,
                     stream_outer: int = STREAM_OUTER,
                     stream_inner: int = STREAM_INNER,
                     interpret: Optional[bool] = None) -> NMCResult:
    """Nested MC price surface under Merton jump-diffusion.

    Every (path, step) point is re-priced by ``sim.n_paths_inner`` inner
    jump-diffusion legs resumed from the stored (S_t, payoff state):
    exposure profiles (``result.exposure_profile()``) and CVA
    (``result.cva(...)``) under crash risk.
    """
    po = get_payoff(payoff)
    if po.n_state > 1:
        raise ValueError("NMC supports payoffs with at most one state "
                         "array")
    if sim.n_steps % 2:
        raise ValueError("Merton requires an even n_steps")
    # t_base uses j+1 (max n_steps), so the counter layout spans
    # 2*(n_steps+1)*n_inner per step-row — same form as nmc_vasicek.
    span = 2 * (sim.n_steps + 1) * sim.n_paths_inner * sim.n_steps
    if span >= 1 << 32:
        raise ValueError(
            "inner RNG counter space exhausted: "
            "2*(n_steps+1)*n_inner*n_steps = "
            f"{span} >= 2^32; reduce n_steps or n_paths_inner")
    kmax = poisson_kmax(float(dyn.lam) * float(option.t) / sim.n_steps)
    key_outer = jnp.asarray(
        rng.derive_key(sim.seed, stream_outer, 0x3E44), jnp.uint32)
    key_inner = jnp.asarray(
        rng.derive_key(sim.seed, stream_inner, 0x3E44), jnp.uint32)
    return _price_nmc_merton_impl(option.as_f32(), dyn.as_f32(), po,
                                  sim.replace(seed=0), kmax, engine,
                                  tile_rows, interpret, key_outer,
                                  key_inner)
