"""Multi-chip path sharding: the framework's distributed layer.

The reference is single-GPU — its only cross-"device" combine is global
memory atomics plus a host-side gather of per-block partials
(``inc/wrappers.cuh:79-85``; SURVEY.md section 2 "Distributed communication
backend: ABSENT").  The TPU equivalent is first-class here:

* paths are data-parallel across a 1-D ``jax.sharding.Mesh`` axis
  (``"paths"``) via ``shard_map`` — each chip runs the same fused Pallas
  kernel on its own contiguous global path-id range;
* the per-chip (8,128) moment accumulators are combined with
  ``jax.lax.psum`` over ICI — the NCCL tier the reference never had;
* counter-based RNG keyed by GLOBAL path id makes the result invariant to
  the mesh size: pricing on 1 chip or 256 chips consumes the same stream
  (verified bit-for-bit in tests/test_parallel.py), which is what makes
  elastic restarts and shard-count changes safe.

Works unchanged on a real v5p pod slice or on the 8-device virtual CPU
mesh used by the test suite (conftest.py sets
``--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mc_tpu import rng
from mc_tpu.config import DEMO_OPTION, DEMO_SIM, OptionParams, SimParams
from mc_tpu.oracle import PriceResult, summarize
from mc_tpu.ops import path_kernels as pk
from mc_tpu.ops._pallas import LANES, cdiv, round_up
from mc_tpu.ops.payoffs import get_payoff
from mc_tpu.ops.reduce import finish_sum

__all__ = ["make_mesh", "price_sharded", "shard_bounds"]

PATHS_AXIS = "paths"


def make_mesh(devices: Optional[Sequence] = None,
              axis: str = PATHS_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices.

    The path dimension of an MC pricer is embarrassingly parallel, so one
    flat axis is the right mesh for any slice shape — XLA lays the psum on
    ICI rings automatically.  Multi-dim meshes only matter once a second
    sharded tensor axis exists (see nmc.py for the outer x inner variant).
    """
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(devices, (axis,))


def shard_bounds(n_paths: int, n_shards: int, tile_rows: int):
    """Static per-shard geometry: local path count, rounded to whole tiles.

    Every shard runs the same static-shape program (SPMD); the last shard's
    overhang is masked inside the kernel against the global bound.
    """
    per_tile = tile_rows * LANES
    n_local = round_up(cdiv(n_paths, n_shards), per_tile)
    return n_local


@functools.partial(
    jax.jit,
    static_argnames=("payoff", "sim", "mesh", "engine", "antithetic",
                     "control_variate", "tile_rows", "rng_source", "method",
                     "interpret", "importance_shift"))
def _price_sharded_impl(option, payoff, sim, mesh, engine, antithetic,
                        control_variate, tile_rows, rng_source, method,
                        interpret, key, importance_shift=0.0):
    from mc_tpu.engines import _xla_partials  # circular-import avoidance

    n_shards = mesh.devices.size
    n_local = shard_bounds(sim.n_paths, n_shards, tile_rows)
    cfg = pk.KernelConfig(
        n_paths=n_local,
        n_steps=sim.n_steps,
        tile_rows=tile_rows,
        antithetic=antithetic,
        with_cv=control_variate,
        rng_source=rng_source,
        method=method,
        is_shift=importance_shift,
    )
    params = pk.pack_params(option, sim.n_steps)
    n_total = jnp.uint32(sim.n_paths)

    def shard_fn(key, params, n_total):
        rank = jax.lax.axis_index(PATHS_AXIS).astype(jnp.uint32)
        offset = rank * jnp.uint32(n_local)
        if engine == "pallas":
            parts = pk.simulate_partials(
                payoff, cfg, key, params, path_offset=offset,
                n_valid=n_total, interpret=interpret)
        else:
            parts = _xla_partials(payoff, cfg, key, option, offset,
                                  n_valid=n_total)
        # The ICI collective tier: one psum of n_out (8,128) slabs.
        return tuple(jax.lax.psum(p, PATHS_AXIS) for p in parts)

    # check_vma=False: pallas_call out_shapes carry no varying-axis metadata
    # yet, and correctness is pinned by the mesh-size-invariance tests.
    parts = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(key, params, n_total)

    sums = [finish_sum(x) for x in parts]
    r = jnp.asarray(option.r, sums[0].dtype)
    t = jnp.asarray(option.t, r.dtype)
    discount = jnp.exp(-r * t)
    n = jnp.asarray(sim.n_paths, sums[0].dtype)

    if not control_variate:
        return summarize(sums[0], sums[1], n, discount)
    sum_p, sum_p2, sum_x, sum_x2, sum_px = sums
    mean_p = sum_p / n
    mean_x = sum_x / n
    var_p = jnp.maximum(sum_p2 / n - mean_p * mean_p, 0.0)
    var_x = jnp.maximum(sum_x2 / n - mean_x * mean_x, 1e-30)
    cov = sum_px / n - mean_p * mean_x
    beta = cov / var_x
    if payoff.has_control:
        from mc_tpu.engines import _payoff_namespace
        ex = payoff.control_expectation(
            _payoff_namespace(option, sim.n_steps))
    else:
        ex = (jnp.asarray(option.s0, n.dtype)
              * jnp.exp((r - jnp.asarray(option.q, r.dtype)) * t))
    adj_mean = mean_p - beta * (mean_x - ex)
    adj_var = jnp.maximum(var_p - cov * cov / var_x, 0.0)
    return PriceResult(
        price=discount * adj_mean,
        stderr=jnp.sqrt(adj_var / n) * discount,
        n_paths=n,
        payoff_mean=adj_mean,
        payoff_var=adj_var,
    )


def price_sharded(option: OptionParams = DEMO_OPTION,
                  sim: SimParams = DEMO_SIM,
                  payoff="vanilla_call",
                  *,
                  mesh: Optional[Mesh] = None,
                  engine: str = "pallas",
                  method: Optional[str] = None,
                  antithetic: bool = False,
                  control_variate: bool = False,
                  tile_rows: int = 256,
                  rng_source: str = "threefry13",
                  stream: int = 0,
                  key=None,
                  importance_shift: float = 0.0,
                  interpret: Optional[bool] = None) -> PriceResult:
    """Multi-chip Monte Carlo price: paths sharded over a device mesh.

    The billion-path configuration of BASELINE.json: each chip simulates a
    contiguous global path-id range with the same fused kernel as the
    single-chip `mc_tpu.price`, partial moments meet in one `psum` over
    ICI, and the f64-grade finish happens once on the replicated result.
    """
    mesh = mesh if mesh is not None else make_mesh()
    po = get_payoff(payoff)
    if method is None:
        method = "terminal" if po.terminal_only else "euler"
    if po.n_state > 0 and method == "terminal":
        raise ValueError(f"{po.name} is path-dependent; method='terminal' invalid")
    if key is None:
        key = jnp.asarray(rng.derive_key(sim.seed, stream), jnp.uint32)
    return _price_sharded_impl(
        option.as_f32(), po, sim.replace(seed=0), mesh, engine, antithetic,
        control_variate, tile_rows, rng_source, method, interpret, key,
        float(importance_shift))
