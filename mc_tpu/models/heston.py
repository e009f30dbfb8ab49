"""Heston stochastic-volatility model family.

Beyond the reference (GBM only): the square-root variance process

    dS = r S dt + sqrt(v) S dW_s
    dv = kappa (theta - v) dt + xi sqrt(v) dW_v,   d<W_s, W_v> = rho dt

discretized with the full-truncation Euler scheme (Lord et al. 2010) —
the standard robust choice: v may go negative in the discretization but
only v+ = max(v, 0) enters the diffusion terms, keeping the scheme
unbiased-in-the-limit without reflection artifacts.

TPU mapping: each step consumes exactly one threefry Box-Muller pair
(z_v, z_perp) — counter (path id, step) — and correlates them in-register
(z_s = rho z_v + sqrt(1-rho^2) z_perp).  The price accumulates in log
space like the GBM kernels (one exp rounding per S_t).  The payoff
registry plugs in unchanged: payoffs only see (state, S, params).

`heston_call_cf` is the semi-analytic oracle (Heston 1993 characteristic
function in the stable "little trap" formulation of Albrecher et al.),
integrated on the host in float64 — the model family's Black-Scholes
equivalent for tolerance tests.
"""

from __future__ import annotations

import dataclasses
import functools
from types import SimpleNamespace
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mc_tpu import rng
from mc_tpu.config import DEMO_OPTION, DEMO_SIM, OptionParams, SimParams
from mc_tpu.engines import STREAM_OUTER
from mc_tpu.oracle import PriceResult, summarize
from mc_tpu.ops import path_kernels as pk
from mc_tpu.ops._pallas import (LANES, SUBLANES, use_interpret,
                                xla_moment_scan)
from mc_tpu.ops.payoffs import get_payoff
from mc_tpu.ops.reduce import finish_sum

__all__ = ["HestonDynamics", "price_heston", "heston_call_cf",
           "heston_euler_step", "DEMO_HESTON"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HestonDynamics:
    """Variance-process parameters (traced pytree leaves)."""

    v0: Any = 0.04       # initial variance (sigma0^2)
    kappa: Any = 2.0     # mean-reversion speed
    theta: Any = 0.04    # long-run variance
    xi: Any = 0.3        # vol-of-vol
    rho: Any = -0.7      # spot/vol correlation

    def astuple(self):
        return (self.v0, self.kappa, self.theta, self.xi, self.rho)

    def as_f32(self) -> "HestonDynamics":
        return HestonDynamics(*(jnp.float32(x) for x in self.astuple()))


DEMO_HESTON = HestonDynamics()

_HESTON_FIELDS = ("s0", "k", "r", "barrier", "p1", "p2", "t", "dt",
                  "inv_n_steps", "v0", "kappa", "theta", "xi", "rho",
                  "rho_perp", "sqrt_dt", "growth")


def _pack_heston(option, heston, n_steps):
    s0, t, k, r, _, barrier, p1, p2, q = (jnp.float32(v)
                                          for v in option.astuple())
    v0, kappa, theta, xi, rho = (jnp.float32(v) for v in heston.astuple())
    n = jnp.float32(n_steps)
    dt = t / n
    vals = dict(s0=s0, k=k, r=r, barrier=barrier, p1=p1, p2=p2, t=t, dt=dt,
                inv_n_steps=1.0 / n, v0=v0, kappa=kappa, theta=theta, xi=xi,
                rho=rho, rho_perp=jnp.sqrt(1.0 - rho * rho),
                sqrt_dt=jnp.sqrt(dt), growth=r - q)
    return jnp.stack([vals[f] for f in _HESTON_FIELDS])


def _unpack_heston(ref):
    return SimpleNamespace(**{f: ref[i] for i, f in
                              enumerate(_HESTON_FIELDS)})


def heston_euler_step(p, w, v, z_v, z_perp, dt, sqrt_dt):
    """One full-truncation Euler substep (log-space price accumulator).

    THE single definition of the scheme — the pricing leg and the MLMC
    coupled levels both call it, so the discretization can never drift
    between them.
    """
    z_s = p.rho * z_v + p.rho_perp * z_perp
    v_plus = jnp.maximum(v, 0.0)
    # double-where sqrt: the primal is bit-identical to sqrt(v_plus)
    # (same input when v > 0, literal 0.0 otherwise) but the JVP at a
    # truncated point is 0 instead of inf*0 = NaN — cva_greeks
    # forward-diffs through this step
    sq = jnp.where(v > 0.0, jnp.sqrt(jnp.where(v > 0.0, v, 1.0)),
                   0.0) * sqrt_dt
    w = w + ((p.growth - 0.5 * v_plus) * dt + sq * z_s)
    v = v + p.kappa * (p.theta - v_plus) * dt + p.xi * sq * z_v
    return w, v


def _heston_leg(payoff, n_steps: int, p, s0, draw_pair, antithetic_sign=1.0):
    """Full-truncation Euler leg; one Box-Muller pair per step."""
    sign = jnp.float32(antithetic_sign)
    state0 = payoff.init(p, jnp.zeros_like(s0))

    def body(j, carry):
        w, v, s, state = carry
        z_v, z_perp = draw_pair(j)
        w, v = heston_euler_step(p, w, v, sign * z_v, sign * z_perp,
                                 p.dt, p.sqrt_dt)
        s = s0 * jnp.exp(w)  # log-space: one exp rounding per S_t
        return (w, v, s, payoff.update(state, s, p))

    w0 = jnp.zeros_like(s0)
    v_init = jnp.full_like(s0, p.v0)
    _, _, s_t, state = jax.lax.fori_loop(
        0, n_steps, body, (w0, v_init, s0, state0))
    return payoff.terminal(state, s_t, p)


def _heston_tile(payoff, n_steps, tile_rows, antithetic, p, ids, valid,
                 k0, k1, bitcast):
    shape = ids.shape

    def draw_pair(j):
        c1 = jnp.full(shape, 0, jnp.uint32) + jnp.asarray(j, jnp.uint32)
        return rng.normal_pair(k0, k1, ids, c1, bitcast=bitcast)

    s0 = jnp.full(shape, p.s0, jnp.float32)
    pay = _heston_leg(payoff, n_steps, p, s0, draw_pair)
    if antithetic:
        pay = 0.5 * (pay + _heston_leg(payoff, n_steps, p, s0, draw_pair,
                                       antithetic_sign=-1.0))
    return jnp.where(valid, pay, 0.0)


def _make_heston_kernel(payoff, cfg: pk.KernelConfig):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(key_ref, params_ref, meta_ref, sum_ref, sq_ref, comp_ref):
        p = _unpack_heston(params_ref)
        i = pl.program_id(0)
        shape = (cfg.tile_rows, LANES)
        base = jnp.uint32(i * cfg.paths_per_tile)
        flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * LANES
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        ids = meta_ref[0] + base + flat
        valid = ids < meta_ref[1]
        pay = _heston_tile(payoff, cfg.n_steps, cfg.tile_rows,
                           cfg.antithetic, p, ids, valid,
                           key_ref[0], key_ref[1], pltpu.bitcast)
        pk._accumulate_moments((sum_ref, sq_ref), comp_ref,
                               [pay, pay * pay], i, cfg.tile_rows)

    return kernel


def _heston_partials_pallas(payoff, cfg, key, params, path_offset, n_valid,
                            interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offset = jnp.asarray(path_offset, jnp.uint32)
    bound = (offset + jnp.uint32(cfg.n_paths) if n_valid is None
             else jnp.asarray(n_valid, jnp.uint32))
    acc_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_heston_kernel(payoff, cfg),
        grid=(cfg.n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=[acc_spec, acc_spec],
        out_shape=[jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((2, SUBLANES, LANES), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(key, jnp.uint32), params, jnp.stack([offset, bound]))


def _heston_partials_xla(payoff, cfg, key, params, path_offset, n_valid):
    p = _unpack_heston(params)
    k0 = jnp.asarray(key[0], jnp.uint32)
    k1 = jnp.asarray(key[1], jnp.uint32)

    def tile_fn(ids, valid):
        pay = _heston_tile(payoff, cfg.n_steps, cfg.tile_rows,
                           cfg.antithetic, p, ids, valid, k0, k1,
                           jax.lax.bitcast_convert_type)
        return [pay, pay * pay]

    return xla_moment_scan(tile_fn, cfg.n_paths, cfg.tile_rows, 2,
                           offset=path_offset, bound=n_valid)


@functools.partial(
    jax.jit,
    static_argnames=("payoff", "sim", "engine", "antithetic", "tile_rows",
                     "interpret"))
def _price_heston_impl(option, heston, payoff, sim, engine, antithetic,
                       tile_rows, interpret, key):
    if interpret is None:
        interpret = use_interpret()
    cfg = pk.KernelConfig(n_paths=sim.n_paths, n_steps=sim.n_steps,
                          tile_rows=tile_rows, antithetic=antithetic)
    params = _pack_heston(option, heston, sim.n_steps)
    if engine == "pallas":
        s, sq = _heston_partials_pallas(payoff, cfg, key, params, 0, None,
                                        interpret)
    else:
        s, sq = _heston_partials_xla(payoff, cfg, key, params, 0, None)
    r = jnp.asarray(option.r, jnp.float32)
    t = jnp.asarray(option.t, jnp.float32)
    return summarize(finish_sum(s), finish_sum(sq),
                     jnp.asarray(sim.n_paths, jnp.float32),
                     jnp.exp(-r * t))


def price_heston(option: OptionParams = DEMO_OPTION,
                 heston: HestonDynamics = DEMO_HESTON,
                 sim: SimParams = DEMO_SIM,
                 payoff="vanilla_call",
                 *,
                 engine: str = "pallas",
                 antithetic: bool = False,
                 tile_rows: int = 128,
                 stream: int = STREAM_OUTER,
                 key=None,
                 interpret: Optional[bool] = None) -> PriceResult:
    """Monte Carlo price under Heston stochastic volatility.

    Every payoff in the registry works (they see only (state, S, params)).
    Counter layout: one threefry pair per (path, step) — independent of the
    GBM stream convention, so Heston and GBM runs at the same seed do not
    share draws.
    """
    po = get_payoff(payoff)
    if po.terminal_only and po.name.startswith("vanilla"):
        pass  # vanilla under Heston still needs the full step loop
    if key is None:
        key = jnp.asarray(rng.derive_key(sim.seed, stream, 0x4E57),
                          jnp.uint32)
    return _price_heston_impl(option.as_f32(), heston.as_f32(), po,
                              sim.replace(seed=0), engine, antithetic,
                              tile_rows, interpret, key)


def heston_call_cf(s0, k, t, r, v0, kappa, theta, xi, rho, q=0.0,
                   n_quad: int = 2048, u_max: float = 200.0) -> float:
    """Semi-analytic Heston European call (host, float64).

    Characteristic-function pricing in the numerically stable 'little
    Heston trap' form (Albrecher et al. 2007), integrated with the
    trapezoid rule — the oracle for the Heston MC tests.
    """
    s0, k, t, r, q = map(float, (s0, k, t, r, q))
    v0, kappa, theta, xi, rho = map(float, (v0, kappa, theta, xi, rho))

    def cf(u):
        # phi(u) = E[exp(i u ln S_T)]
        iu = 1j * u
        d = np.sqrt((rho * xi * iu - kappa) ** 2 + xi * xi * (iu + u * u))
        g2 = (kappa - rho * xi * iu - d) / (kappa - rho * xi * iu + d)
        exp_dt = np.exp(-d * t)
        c = (kappa * theta / xi ** 2) * (
            (kappa - rho * xi * iu - d) * t
            - 2.0 * np.log((1.0 - g2 * exp_dt) / (1.0 - g2)))
        dd = ((kappa - rho * xi * iu - d) / xi ** 2
              * (1.0 - exp_dt) / (1.0 - g2 * exp_dt))
        return np.exp(iu * (np.log(s0) + (r - q) * t) + c + dd * v0)

    # P1, P2 via the standard Gil-Pelaez inversions.
    u = np.linspace(1e-8, u_max, n_quad)
    lnk = np.log(k)
    phi_u = cf(u)
    phi_u_minus_i = cf(u - 1j)
    denom = cf(-1j)  # = E[S_T] = s0 e^{rT}
    int1 = np.real(np.exp(-1j * u * lnk) * phi_u_minus_i / (1j * u * denom))
    int2 = np.real(np.exp(-1j * u * lnk) * phi_u / (1j * u))
    p1 = 0.5 + np.trapezoid(int1, u) / np.pi
    p2 = 0.5 + np.trapezoid(int2, u) / np.pi
    return s0 * p1 - k * np.exp(-r * t) * p2


# ---------------------------------------------------------------------------
# Trajectory materialization under Heston: the (S_t, v_t, state_t) grids
# that feed LSMC (American exercise under stochastic volatility) — the
# Heston analogue of the C9 state-grid kernel (trajectories.cuh:273-351).
# ---------------------------------------------------------------------------


def _make_heston_traj_kernel(payoff, cfg: pk.KernelConfig):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert payoff.n_state <= 1, "trajectory kernel stores one state array"

    def kernel(key_ref, params_ref, meta_ref, s_out, v_out, st_out,
               pay_sum, pay_sq, comp_ref):
        p = _unpack_heston(params_ref)
        i = pl.program_id(0)
        shape = (cfg.tile_rows, LANES)
        base = jnp.uint32(i * cfg.paths_per_tile)
        flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * LANES
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        ids = meta_ref[0] + base + flat
        valid = ids < meta_ref[1]
        k0, k1 = key_ref[0], key_ref[1]

        def draw_pair(j):
            c1 = jnp.full(shape, 0, jnp.uint32) + jnp.asarray(j, jnp.uint32)
            return rng.normal_pair(k0, k1, ids, c1, bitcast=pltpu.bitcast)

        s0 = jnp.full(shape, p.s0, jnp.float32)
        state0 = payoff.init(p, jnp.zeros_like(s0))

        def body(j, carry):
            w, v, s, state = carry
            z_v, z_perp = draw_pair(j)
            w, v = heston_euler_step(p, w, v, z_v, z_perp, p.dt, p.sqrt_dt)
            s = s0 * jnp.exp(w)
            state = payoff.update(state, s, p)
            s_out[j] = s
            v_out[j] = v
            st_out[j] = state[0] if payoff.n_state else jnp.zeros_like(s)
            return (w, v, s, state)

        w0 = jnp.zeros_like(s0)
        v_init = jnp.full_like(s0, p.v0)
        _, _, s_t, state = jax.lax.fori_loop(
            0, cfg.n_steps, body, (w0, v_init, s0, state0))
        pay = jnp.where(valid, payoff.terminal(state, s_t, p), 0.0)
        pk._accumulate_moments((pay_sum, pay_sq), comp_ref,
                               [pay, pay * pay], i, cfg.tile_rows)

    return kernel


@functools.partial(jax.jit, static_argnames=("payoff", "cfg", "interpret"))
def heston_trajectories_kernel(payoff, cfg: pk.KernelConfig, key, params,
                               path_offset=0, n_valid=None, interpret=None):
    """Materialize (S, v, state) grids + terminal payoff partials.

    Grids are step-major (n_steps, n_tiles*tile_rows, 128) like the GBM
    trajectory kernel; ``v`` is the raw full-truncation variance state
    (clip at 0 before using it as a regressor).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mc_tpu.ops._pallas import SUBLANES, use_interpret
    if interpret is None:
        interpret = use_interpret()
    rows = cfg.n_tiles * cfg.tile_rows
    grid_spec = pl.BlockSpec((cfg.n_steps, cfg.tile_rows, LANES),
                             lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    offset = jnp.asarray(path_offset, jnp.uint32)
    bound = (offset + jnp.uint32(cfg.n_paths) if n_valid is None
             else jnp.asarray(n_valid, jnp.uint32))
    return pl.pallas_call(
        _make_heston_traj_kernel(payoff, cfg),
        grid=(cfg.n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=[grid_spec, grid_spec, grid_spec, part_spec, part_spec],
        out_shape=[
            jax.ShapeDtypeStruct((cfg.n_steps, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((cfg.n_steps, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((cfg.n_steps, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, SUBLANES, LANES), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(key, jnp.uint32), params, jnp.stack([offset, bound]))
