"""Nested Monte Carlo under Black-Scholes–Vasicek stochastic rates.

Extends the flagship NMC capability (the reference's ``inc/nmc.cuh``
re-pricing of every (path, step) point, SURVEY.md C10-C12) to STOCHASTIC
DISCOUNTING — the setting where nested simulation is the production tool
(XVA desks discount exposures along the simulated rate path, not by a
scalar e^{-rT}).

The conditional value at point (path i, step j) is discounted to TIME 0
pathwise:

    V*_ij = exp(-y_j) * (1/M) sum_m  payoff_m * exp(-(y_T^m - y_j)),

where y = int_0^t r du accumulates along the OUTER path up to t_j (stored
in the trajectory grid) and each INNER leg m resumes from the stored
market state (S_j, x_j = r_j - b, payoff state) and accumulates its own
remaining discount.  Martingale consequence used as the test gate: for a
`zcb` payoff the expected exposure profile is FLAT at the closed-form
P(0,T) for EVERY j.

Inner-draw convention: point (i, j), inner path m, substep u consumes
threefry pairs ``2*(((j+1)*n_inner + m)*n_steps + u) + {0,1}`` on the
inner key — two pairs per substep (the exact scheme needs three normals;
the fourth is discarded).

Strategy is the C10 "grid" design like `nmc_heston`: the trajectory
kernel materializes step-major (S, x, y, state) HBM grids and an inner
kernel re-prices every point with the legs kept in registers; the XLA
dual rebuilds identical streams so engines agree bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mc_tpu import rng
from mc_tpu.config import DEMO_OPTION, DEMO_SIM, OptionParams, SimParams
from mc_tpu.models.vasicek import (DEMO_VASICEK, VasicekDynamics,
                                   _pack_vasicek, _unpack_vasicek,
                                   vasicek_step,
                                   vasicek_trajectories_kernel)
from mc_tpu.nmc import NMCResult
from mc_tpu.oracle import summarize
from mc_tpu.ops import path_kernels as pk
from mc_tpu.ops._pallas import LANES, SUBLANES, use_interpret
from mc_tpu.ops.payoffs import PathPayoff, get_payoff
from mc_tpu.ops.reduce import finish_sum

__all__ = ["price_nmc_vasicek"]

STREAM_OUTER, STREAM_INNER = 0, 1


def _vasicek_point_tile(payoff: PathPayoff, n_steps: int, n_inner: int,
                        p, ki0, ki1, ids, j, s_t, x_t, state_t, bitcast):
    """Inner-MC sum of payoff * exp(-(y_T - y_j)) over n_inner exact legs
    resumed from one (path-tile, step j) point; the caller multiplies by
    exp(-y_j)/n_inner for the time-0 value."""
    remaining = jnp.int32(n_steps) - j - 1
    t_base = ((jnp.asarray(j, jnp.uint32) + jnp.uint32(1))
              * jnp.uint32(n_inner))

    def inner(m, carry):
        acc, comp = carry
        c_base = ((t_base + jnp.asarray(m, jnp.uint32))
                  * jnp.uint32(n_steps))

        def step(u, carry2):
            wxy, state = carry2
            cu = jnp.uint32(2) * (c_base + jnp.asarray(u, jnp.uint32))
            c1a = jnp.full(ids.shape, 0, jnp.uint32) + cu
            za, zb = rng.normal_pair(ki0, ki1, ids, c1a, bitcast=bitcast)
            zc, _ = rng.normal_pair(ki0, ki1, ids, c1a + jnp.uint32(1),
                                    bitcast=bitcast)
            wxy, s = vasicek_step(p, wxy, za, zb, zc, s_t)
            return (wxy, payoff.update(state, s, p))

        zeros = jnp.zeros_like(s_t)
        (w, _, yd), state = jax.lax.fori_loop(
            0, remaining, step, ((zeros, x_t, zeros), state_t))
        pay = payoff.terminal(state, s_t * jnp.exp(w), p) * jnp.exp(-yd)
        y = pay - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp)

    acc, _ = jax.lax.fori_loop(
        0, n_inner, inner,
        (jnp.zeros_like(s_t), jnp.zeros_like(s_t)))
    return acc


def _make_vasicek_inner_kernel(payoff: PathPayoff, n_steps: int,
                               n_inner: int, tile_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ki_ref, params_ref, meta_ref, s_ref, x_ref, y_ref, c_ref,
               surf_ref):
        p = _unpack_vasicek(params_ref)
        t_idx = pl.program_id(0)
        i = pl.program_id(1)
        shape = (tile_rows, LANES)
        base = jnp.uint32(i * tile_rows * LANES)
        flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * LANES
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        ids = meta_ref[0] + base + flat
        valid = ids < meta_ref[1]
        st_j = (c_ref[0],) if payoff.n_state else ()
        inner_sum = _vasicek_point_tile(
            payoff, n_steps, n_inner, p, ki_ref[0], ki_ref[1], ids, t_idx,
            s_ref[0], x_ref[0], st_j, pltpu.bitcast)
        v = inner_sum * (1.0 / n_inner) * jnp.exp(-y_ref[0])
        surf_ref[0] = jnp.where(valid, v, 0.0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("payoff", "n_steps", "n_inner", "tile_rows",
                     "n_tiles", "interpret"))
def vasicek_nmc_inner_kernel(payoff, n_steps, n_inner, tile_rows, n_tiles,
                             key_inner, params, s_grid, x_grid, y_grid,
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
        _make_vasicek_inner_kernel(payoff, n_steps, n_inner, tile_rows),
        grid=(n_steps, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [tile3, tile3, tile3, tile3],
        out_specs=tile3,
        out_shape=jax.ShapeDtypeStruct((n_steps, rows, LANES), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(key_inner, jnp.uint32), params, meta, s_grid, x_grid,
      y_grid, c_grid)


def _xla_nmc_vasicek(payoff, sim, params, key_outer, key_inner, tile_rows):
    """Pure-jnp dual: identical outer/inner streams and Kahan order."""
    p = _unpack_vasicek(params)
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

        def outer_pair(carry2, jj):
            # mirrors _vasicek_leg's pair loop: pairs (3jj, 3jj+1, 3jj+2)
            wxy, state = carry2

            def draw(m):
                c1 = jnp.full(shape, 0, jnp.uint32) + m
                return rng.normal_pair(ko0, ko1, ids, c1)

            z0, z1 = draw(3 * jj)
            z2, z3 = draw(3 * jj + 1)
            z4, z5 = draw(3 * jj + 2)
            wxy, s_a = vasicek_step(p, wxy, z0, z1, z2, s0)
            state = payoff.update(state, s_a, p)
            cv_a = state[0] if payoff.n_state else jnp.zeros_like(s_a)
            rec_a = (s_a, wxy[1], wxy[2], cv_a)
            wxy, s_b = vasicek_step(p, wxy, z3, z4, z5, s0)
            state = payoff.update(state, s_b, p)
            cv_b = state[0] if payoff.n_state else jnp.zeros_like(s_b)
            rec_b = (s_b, wxy[1], wxy[2], cv_b)
            recs = tuple(jnp.stack([a, b]) for a, b in zip(rec_a, rec_b))
            return (wxy, state), recs

        zeros = jnp.zeros_like(s0)
        x0 = jnp.full_like(s0, p.x0)
        ((w, _, y), state), recs = jax.lax.scan(
            outer_pair, ((zeros, x0, zeros), state0),
            jnp.arange(n // 2, dtype=jnp.uint32))
        s_hist, x_hist, y_hist, c_hist = (
            r.reshape((n,) + shape) for r in recs)
        s_t = s0 * jnp.exp(w)
        pay = jnp.where(valid,
                        payoff.terminal(state, s_t, p) * jnp.exp(-y), 0.0)
        for m, val in enumerate([pay, pay * pay]):
            acc, comp = pk.kahan_xla_update(
                acc, comp, m, pk.fold_to_sublanes(val, tile_rows))

        def step_fn(j):
            st_j = (c_hist[j],) if payoff.n_state else ()
            inner_sum = _vasicek_point_tile(
                payoff, n, sim.n_paths_inner, p, ki0, ki1, ids,
                j.astype(jnp.int32), s_hist[j], x_hist[j], st_j,
                jax.lax.bitcast_convert_type)
            val = (inner_sum * (1.0 / sim.n_paths_inner)
                   * jnp.exp(-y_hist[j]))
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
def _price_nmc_vasicek_impl(option, dyn, payoff, sim, engine, tile_rows,
                            interpret, key_outer, key_inner):
    params = _pack_vasicek(option, dyn, sim.n_steps)

    if engine == "xla":
        surface, osum, osq = _xla_nmc_vasicek(payoff, sim, params,
                                              key_outer, key_inner,
                                              tile_rows)
    elif engine == "pallas":
        cfg = pk.KernelConfig(n_paths=sim.n_paths, n_steps=sim.n_steps,
                              tile_rows=tile_rows)
        s_g, x_g, y_g, c_g, osum, osq = vasicek_trajectories_kernel(
            payoff, cfg, key_outer, params, interpret=interpret)
        surface = vasicek_nmc_inner_kernel(
            payoff, sim.n_steps, sim.n_paths_inner, tile_rows, cfg.n_tiles,
            key_inner, params, s_g, x_g, y_g, c_g, sim.n_paths,
            interpret=interpret)
    else:
        raise ValueError(f"unknown engine {engine!r}")

    # outer payoffs are already pathwise-discounted
    outer = summarize(finish_sum(osum), finish_sum(osq),
                      jnp.asarray(sim.n_paths, jnp.float32),
                      jnp.float32(1.0))
    n_points = sim.n_paths * sim.n_steps
    surface_mean = jnp.sum(surface, dtype=jnp.float32) / n_points
    return NMCResult(surface=surface, outer=outer,
                     surface_mean=surface_mean,
                     n_points=jnp.asarray(n_points, jnp.float32),
                     t_horizon=jnp.asarray(option.t, jnp.float32))


def price_nmc_vasicek(option: OptionParams = DEMO_OPTION,
                      dyn: VasicekDynamics = DEMO_VASICEK,
                      sim: SimParams = DEMO_SIM,
                      payoff="vanilla_call",
                      *,
                      engine: str = "pallas",
                      tile_rows: int = 8,
                      stream_outer: int = STREAM_OUTER,
                      stream_inner: int = STREAM_INNER,
                      interpret: Optional[bool] = None) -> NMCResult:
    """Nested MC price surface under stochastic (Vasicek) rates.

    Every (path, step) point is re-priced by ``sim.n_paths_inner`` exact
    inner legs resumed from the stored (S_t, r_t) market state, with the
    discounting done PATHWISE along both the outer and inner rate paths —
    exposure profiles (``result.exposure_profile()``) and CVA
    (``result.cva(...)``) under the rates that actually discount them.
    """
    po = get_payoff(payoff)
    if po.n_state > 1:
        raise ValueError("NMC supports payoffs with at most one state "
                         "array")
    if sim.n_steps % 2:
        raise ValueError("vasicek requires an even n_steps "
                         "(pair-consuming outer loop)")
    span = 2 * (sim.n_steps + 1) * sim.n_paths_inner * sim.n_steps
    if span >= 1 << 32:
        raise ValueError(
            "inner RNG counter space exhausted: "
            "2*(n_steps+1)*n_inner*n_steps = "
            f"{span} >= 2^32; reduce n_steps or n_paths_inner")
    key_outer = jnp.asarray(
        rng.derive_key(sim.seed, stream_outer, 0x7A51), jnp.uint32)
    key_inner = jnp.asarray(
        rng.derive_key(sim.seed, stream_inner, 0x7A51), jnp.uint32)
    return _price_nmc_vasicek_impl(option.as_f32(), dyn.as_f32(), po,
                                   sim.replace(seed=0), engine, tile_rows,
                                   interpret, key_outer, key_inner)
