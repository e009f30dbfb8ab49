"""Multi-chip pricing for the non-GBM model families.

`mesh.price_sharded` shards the GBM kernels; this module extends the same
construction — paths data-parallel over a 1-D mesh, per-chip fused Pallas
kernels on contiguous GLOBAL path-id ranges, one (8,128)-slab `psum` over
ICI, f64-grade finish on the replicated result — to Heston, CEV, Merton
and SABR.  Because every model kernel keys its counter-based RNG by global
path id, the result is invariant to the mesh size and, on a 1-device
mesh, BIT-identical to the single-chip `price_<model>` at equal tiling
(pinned in tests/test_parallel.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mc_tpu import rng
from mc_tpu.config import DEMO_OPTION, DEMO_SIM, OptionParams, SimParams
from mc_tpu.oracle import PriceResult, summarize
from mc_tpu.ops import path_kernels as pk
from mc_tpu.ops._pallas import use_interpret
from mc_tpu.ops.payoffs import get_payoff
from mc_tpu.ops.reduce import finish_sum
from mc_tpu.parallel.mesh import PATHS_AXIS, make_mesh, shard_bounds

__all__ = ["price_model_sharded", "SHARDED_MODELS"]

SHARDED_MODELS = ("heston", "cev", "merton", "sabr", "rainbow", "vasicek",
                  "term", "localvol")

# Same per-model stream tags as the single-chip price_* entry points —
# what makes the 1-device-mesh result bit-identical to them.
_STREAM_TAGS = {"heston": 0x4E57, "cev": 0xCE4, "merton": 0x3E44,
                "sabr": 0x5AB4, "rainbow": 0xBE0F, "vasicek": 0x7A51,
                "term": 0x7E53, "localvol": 0x10CA}


@functools.partial(
    jax.jit,
    static_argnames=("model", "payoff", "sim", "mesh", "engine",
                     "antithetic", "tile_rows", "interpret", "kmax"))
def _model_sharded_impl(model, option, dyn, payoff, sim, mesh, engine,
                        antithetic, tile_rows, interpret, key, kmax=0):
    if interpret is None:
        interpret = use_interpret()
    n_shards = mesh.devices.size
    n_local = shard_bounds(sim.n_paths, n_shards, tile_rows)
    # Rainbow payoffs are terminal-only: one exact draw over the horizon.
    n_steps = 1 if model == "rainbow" else sim.n_steps
    cfg = pk.KernelConfig(n_paths=n_local, n_steps=n_steps,
                          tile_rows=tile_rows, antithetic=antithetic)

    if model == "heston":
        from mc_tpu.models.heston import (_heston_partials_pallas,
                                          _heston_partials_xla, _pack_heston)
        params = _pack_heston(option, dyn, sim.n_steps)

        def partials(key, params, offset, bound):
            if engine == "pallas":
                return _heston_partials_pallas(payoff, cfg, key, params,
                                               offset, bound, interpret)
            return _heston_partials_xla(payoff, cfg, key, params, offset,
                                        bound)
    elif model == "cev":
        from mc_tpu.models.cev import _cev_partials, _pack_cev
        params = _pack_cev(option, dyn, sim.n_steps)

        def partials(key, params, offset, bound):
            return _cev_partials(payoff, cfg, key, params, offset, bound,
                                 engine, interpret)
    elif model == "merton":
        from mc_tpu.models.merton import _merton_partials, _pack_merton
        params = _pack_merton(option, dyn, sim.n_steps)

        def partials(key, params, offset, bound):
            return _merton_partials(payoff, cfg, kmax, key, params, offset,
                                    bound, engine, interpret)
    elif model == "sabr":
        from mc_tpu.models.sabr import _pack_sabr, _sabr_partials
        params = _pack_sabr(option, dyn, sim.n_steps)

        def partials(key, params, offset, bound):
            return _sabr_partials(payoff, cfg, key, params, offset, bound,
                                  engine, interpret)
    elif model == "rainbow":
        from mc_tpu.models.basket import _basket_namespace, _pack_basket
        from mc_tpu.models.rainbow import _rainbow_partials
        d = int(dyn.s0s.shape[0])
        params = _pack_basket(_basket_namespace(option, dyn, 1), d)

        def partials(key, params, offset, bound):
            # `payoff` is the rainbow payoff NAME (static string)
            return _rainbow_partials(payoff, cfg, d, key, params, offset,
                                     bound, engine, interpret)
    elif model == "vasicek":
        from mc_tpu.models.vasicek import _pack_vasicek, _vasicek_partials
        params = _pack_vasicek(option, dyn, sim.n_steps)

        def partials(key, params, offset, bound):
            return _vasicek_partials(payoff, cfg, key, params, offset,
                                     bound, engine, interpret)
    elif model == "term":
        from mc_tpu.models.term import _pack_term, _term_partials
        params = _pack_term(option, dyn, sim.n_steps)

        def partials(key, params, offset, bound):
            return _term_partials(payoff, cfg, key, params, offset,
                                  bound, engine, interpret)
    elif model == "localvol":
        from mc_tpu.models.localvol import (_localvol_partials,
                                            _pack_localvol)
        n_knots = int(dyn.x_knots.shape[0])
        params = _pack_localvol(option, dyn, sim.n_steps)

        def partials(key, params, offset, bound):
            return _localvol_partials(payoff, cfg, n_knots, key, params,
                                      offset, bound, engine, interpret)
    else:
        raise ValueError(f"unknown model {model!r}; "
                         f"sharded models: {SHARDED_MODELS}")

    n_total = jnp.uint32(sim.n_paths)

    def shard_fn(key, params, n_total):
        rank = jax.lax.axis_index(PATHS_AXIS).astype(jnp.uint32)
        offset = rank * jnp.uint32(n_local)
        s, sq = partials(key, params, offset, n_total)
        return (jax.lax.psum(s, PATHS_AXIS), jax.lax.psum(sq, PATHS_AXIS))

    s, sq = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(key, params, n_total)

    r = jnp.float32(option.r)
    t = jnp.float32(option.t)
    # vasicek discounts pathwise inside the leg; term discounts off its
    # rate curve (r_bar packed at slot 9); everything else scalar e^{-rT}
    if model == "vasicek":
        discount = jnp.float32(1.0)
    elif model == "term":
        discount = jnp.exp(-params[9] * t)
    else:
        discount = jnp.exp(-r * t)
    return summarize(finish_sum(s), finish_sum(sq),
                     jnp.asarray(sim.n_paths, jnp.float32),
                     discount)


def price_model_sharded(model: str,
                        option: OptionParams = DEMO_OPTION,
                        dyn=None,
                        sim: SimParams = DEMO_SIM,
                        payoff=None,
                        *,
                        mesh: Optional[Mesh] = None,
                        engine: str = "pallas",
                        antithetic: bool = False,
                        tile_rows: int = 128,
                        stream: int = 0,
                        key=None,
                        interpret: Optional[bool] = None) -> PriceResult:
    """Multi-chip Monte Carlo price under a non-GBM model family.

    ``model``: one of `SHARDED_MODELS`.  ``dyn`` defaults to the model's
    demo dynamics.  ``payoff=None`` picks the model's default contract
    (vanilla_call; call_on_max for "rainbow", whose payoffs come from
    `RAINBOW_PAYOFFS` — registry names like "vanilla_call" are rejected
    there rather than silently remapped).  The per-model stream tag matches the single-chip
    `price_<model>` entry point, so a 1-device mesh reproduces it bitwise
    and larger meshes reproduce its statistics exactly (global-path-id
    keyed counters).
    """
    if model not in SHARDED_MODELS:
        raise ValueError(f"unknown model {model!r}; "
                         f"sharded models: {SHARDED_MODELS}")
    if model == "rainbow":
        # rainbow payoffs live in their own registry, keyed by NAME
        from mc_tpu.models.rainbow import RAINBOW_PAYOFFS
        if payoff is None:
            payoff = "call_on_max"
        if payoff not in RAINBOW_PAYOFFS:
            raise KeyError(f"unknown rainbow payoff {payoff!r}; "
                           f"available: {sorted(RAINBOW_PAYOFFS)}")
        po = payoff
    else:
        po = get_payoff("vanilla_call" if payoff is None else payoff)
        po.validate(option, sim.n_steps)
    mesh = mesh if mesh is not None else make_mesh()
    kmax = 0
    if dyn is None:
        if model == "heston":
            from mc_tpu.models.heston import DEMO_HESTON as dyn
        elif model == "cev":
            from mc_tpu.models.cev import DEMO_CEV as dyn
        elif model == "merton":
            from mc_tpu.models.merton import DEMO_MERTON as dyn
        elif model == "rainbow":
            from mc_tpu.models.basket import DEMO_BASKET as dyn
        elif model == "vasicek":
            from mc_tpu.models.vasicek import DEMO_VASICEK as dyn
        elif model == "term":
            from mc_tpu.models.term import TermStructure
            dyn = TermStructure.from_knots([0.10, 0.07, 0.05],
                                           [0.15, 0.22, 0.30],
                                           sim.n_steps)
        elif model == "localvol":
            from mc_tpu.models.localvol import LocalVolSurface
            dyn = LocalVolSurface.demo(sim.n_steps)
        else:
            from mc_tpu.models.sabr import DEMO_SABR as dyn
    if model == "term" and dyn.rates.shape[0] != sim.n_steps:
        raise ValueError(
            f"term structure has {dyn.rates.shape[0]} steps, sim has "
            f"{sim.n_steps}")
    if model == "localvol":
        from mc_tpu.models.localvol import validate_surface
        dyn = validate_surface(dyn, sim.n_steps)
    if model in ("cev", "merton", "vasicek", "term",
                 "localvol") and sim.n_steps % 2:
        raise ValueError(f"{model} requires an even n_steps "
                         "(pair-consuming step loop)")
    if model == "merton":
        from mc_tpu.models.merton import poisson_kmax
        kmax = poisson_kmax(float(dyn.lam) * float(option.t) / sim.n_steps)
    if key is None:
        key = jnp.asarray(
            rng.derive_key(sim.seed, stream, _STREAM_TAGS[model]),
            jnp.uint32)
    return _model_sharded_impl(model, option.as_f32(), dyn.as_f32(), po,
                               sim.replace(seed=0), mesh, engine,
                               antithetic, tile_rows, interpret, key,
                               kmax=kmax)
