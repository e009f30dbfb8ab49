"""Nested Monte Carlo under Heston stochastic volatility.

Extends the flagship NMC capability (the reference's ``inc/nmc.cuh``
re-pricing of every (path, step) point, SURVEY.md C10-C12) from GBM to the
Heston model family: the conditional re-pricing resumes from the FULL
stored market state ``(S_t, v_t, payoff_state_t)`` — the variance is part
of the state, so exposure profiles under stochastic volatility (XVA's
standard setting) come out of the same surface machinery.

Strategy is the C10 "grid" design: the Heston trajectory kernel
(models/heston.heston_trajectories_kernel) materializes the step-major
(S, v, state) HBM grids, and an inner kernel re-prices every point with
``n_paths_inner`` full-truncation Euler legs kept in registers.  The XLA
dual rebuilds the identical streams, so ``engine="pallas"`` and
``engine="xla"`` agree bit-for-bit like every other engine pair.

Inner-draw convention: point (path i, step j), inner path m, substep u
consumes threefry pair ``(i, ((j+1)*n_inner + m)*n_steps + u)`` — one
Box-Muller pair per substep (Heston needs two correlated normals per
step, z_v and z_perp).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mc_tpu import rng
from mc_tpu.config import DEMO_OPTION, DEMO_SIM, OptionParams, SimParams
from mc_tpu.models.heston import (DEMO_HESTON, HestonDynamics, _pack_heston,
                                  _unpack_heston, heston_euler_step,
                                  heston_trajectories_kernel)
from mc_tpu.nmc import NMCResult
from mc_tpu.oracle import summarize
from mc_tpu.ops import path_kernels as pk
from mc_tpu.ops._pallas import LANES, SUBLANES, use_interpret
from mc_tpu.ops.payoffs import PathPayoff, get_payoff
from mc_tpu.ops.reduce import finish_sum

__all__ = ["price_nmc_heston"]

STREAM_OUTER, STREAM_INNER = 0, 1


def _heston_point_tile(payoff: PathPayoff, n_steps: int, n_inner: int,
                       p, ki0, ki1, ids, j, s_t, v_t, state_t, bitcast):
    """Inner-MC payoff SUM over n_inner Heston legs resumed from one
    (path-tile, step j) point; the caller divides and discounts."""
    remaining = jnp.int32(n_steps) - j - 1
    t_base = ((jnp.asarray(j, jnp.uint32) + jnp.uint32(1))
              * jnp.uint32(n_inner))

    def inner(m, carry):
        acc, comp = carry
        c_base = ((t_base + jnp.asarray(m, jnp.uint32))
                  * jnp.uint32(n_steps))

        def step(u, carry2):
            w, v, state = carry2
            c1 = (jnp.full(ids.shape, 0, jnp.uint32) + c_base
                  + jnp.asarray(u, jnp.uint32))
            z_v, z_p = rng.normal_pair(ki0, ki1, ids, c1, bitcast=bitcast)
            w, v = heston_euler_step(p, w, v, z_v, z_p, p.dt, p.sqrt_dt)
            state = payoff.update(state, s_t * jnp.exp(w), p)
            return (w, v, state)

        w, v, state = jax.lax.fori_loop(
            0, remaining, step,
            (jnp.zeros_like(s_t), v_t, state_t))
        pay = payoff.terminal(state, s_t * jnp.exp(w), p)
        y = pay - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp)

    acc, _ = jax.lax.fori_loop(
        0, n_inner, inner,
        (jnp.zeros_like(s_t), jnp.zeros_like(s_t)))
    return acc


def _discount(p, j, n_steps):
    """Reference parity: the full e^{-rT} per point (nmc.cuh:100-104)."""
    del j, n_steps
    return jnp.exp(-p.r * p.t)


def _make_heston_inner_kernel(payoff: PathPayoff, n_steps: int,
                              n_inner: int, tile_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ki_ref, params_ref, meta_ref, s_ref, v_ref, c_ref,
               surf_ref):
        p = _unpack_heston(params_ref)
        t_idx = pl.program_id(0)
        i = pl.program_id(1)
        shape = (tile_rows, LANES)
        base = jnp.uint32(i * tile_rows * LANES)
        flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * LANES
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        ids = meta_ref[0] + base + flat
        valid = ids < meta_ref[1]
        st_j = (c_ref[0],) if payoff.n_state else ()
        inner_sum = _heston_point_tile(
            payoff, n_steps, n_inner, p, ki_ref[0], ki_ref[1], ids, t_idx,
            s_ref[0], v_ref[0], st_j, pltpu.bitcast)
        v = inner_sum * (1.0 / n_inner) * _discount(p, t_idx, n_steps)
        surf_ref[0] = jnp.where(valid, v, 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("payoff", "n_steps", "n_inner", "tile_rows", "n_tiles",
                     "interpret"))
def heston_nmc_inner_kernel(payoff, n_steps, n_inner, tile_rows, n_tiles,
                            key_inner, params, s_grid, v_grid, c_grid,
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
        _make_heston_inner_kernel(payoff, n_steps, n_inner, tile_rows),
        grid=(n_steps, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [tile3, tile3, tile3],
        out_specs=tile3,
        out_shape=jax.ShapeDtypeStruct((n_steps, rows, LANES), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(key_inner, jnp.uint32), params, meta, s_grid, v_grid,
      c_grid)


def _xla_nmc_heston(payoff, sim, params, key_outer, key_inner, tile_rows):
    """Pure-jnp dual: identical outer/inner streams and Kahan order."""
    p = _unpack_heston(params)
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

        def outer_step(carry2, u):
            w, v, state = carry2
            c1 = jnp.full(shape, 0, jnp.uint32) + u
            z_v, z_p = rng.normal_pair(ko0, ko1, ids, c1)
            w, v = heston_euler_step(p, w, v, z_v, z_p, p.dt, p.sqrt_dt)
            s = s0 * jnp.exp(w)
            state = payoff.update(state, s, p)
            cv = state[0] if payoff.n_state else jnp.zeros_like(s)
            return (w, v, state), (s, v, cv)

        v_init = jnp.full_like(s0, p.v0)
        (w, v, state), (s_hist, v_hist, c_hist) = jax.lax.scan(
            outer_step, (jnp.zeros_like(s0), v_init, state0),
            jnp.arange(n, dtype=jnp.uint32))
        s_t = s0 * jnp.exp(w)
        pay = jnp.where(valid, payoff.terminal(state, s_t, p), 0.0)
        for m, val in enumerate([pay, pay * pay]):
            acc, comp = pk.kahan_xla_update(
                acc, comp, m, pk.fold_to_sublanes(val, tile_rows))

        def step_fn(j):
            st_j = (c_hist[j],) if payoff.n_state else ()
            inner_sum = _heston_point_tile(
                payoff, n, sim.n_paths_inner, p, ki0, ki1, ids,
                j.astype(jnp.int32), s_hist[j], v_hist[j], st_j,
                jax.lax.bitcast_convert_type)
            val = (inner_sum * (1.0 / sim.n_paths_inner)
                   * _discount(p, j, n))
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
    static_argnames=("payoff", "sim", "engine", "tile_rows", "interpret"))
def _price_nmc_heston_impl(option, heston, payoff, sim, engine, tile_rows,
                           interpret, key_outer, key_inner):
    params = _pack_heston(option, heston, sim.n_steps)
    p = _unpack_heston(params)

    if engine == "xla":
        surface, osum, osq = _xla_nmc_heston(payoff, sim, params,
                                             key_outer, key_inner,
                                             tile_rows)
    elif engine == "pallas":
        cfg = pk.KernelConfig(n_paths=sim.n_paths, n_steps=sim.n_steps,
                              tile_rows=tile_rows)
        s_g, v_g, c_g, osum, osq = heston_trajectories_kernel(
            payoff, cfg, key_outer, params, interpret=interpret)
        surface = heston_nmc_inner_kernel(
            payoff, sim.n_steps, sim.n_paths_inner, tile_rows, cfg.n_tiles,
            key_inner, params, s_g, v_g, c_g, sim.n_paths,
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


def price_nmc_heston(option: OptionParams = DEMO_OPTION,
                     heston: HestonDynamics = DEMO_HESTON,
                     sim: SimParams = DEMO_SIM,
                     payoff="vanilla_call",
                     *,
                     engine: str = "pallas",
                     tile_rows: int = 8,
                     stream_outer: int = STREAM_OUTER,
                     stream_inner: int = STREAM_INNER,
                     interpret: Optional[bool] = None) -> NMCResult:
    """Nested MC price surface under Heston stochastic volatility.

    Every (path, step) point of the outer trajectories is re-priced by
    ``sim.n_paths_inner`` inner legs resumed from the stored market state
    (S_t, v_t) AND payoff state — exposure profiles
    (``result.exposure_profile()``) under stochastic vol for XVA.
    """
    po = get_payoff(payoff)
    if po.n_state > 1:
        raise ValueError("NMC supports payoffs with at most one state "
                         "array")
    span = sim.n_steps * sim.n_paths_inner * sim.n_steps
    if span >= 1 << 32:
        raise ValueError(
            "inner RNG counter space exhausted: n_steps^2 * n_inner = "
            f"{span} >= 2^32; reduce n_steps or n_paths_inner")
    key_outer = jnp.asarray(
        rng.derive_key(sim.seed, stream_outer, 0x4E57), jnp.uint32)
    key_inner = jnp.asarray(
        rng.derive_key(sim.seed, stream_inner, 0x4E57), jnp.uint32)
    return _price_nmc_heston_impl(option.as_f32(), heston.as_f32(), po,
                                  sim.replace(seed=0), engine, tile_rows,
                                  interpret, key_outer, key_inner)
