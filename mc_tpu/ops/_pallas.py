"""Shared Pallas plumbing: interpret-mode selection and tiling helpers.

Kernels compile to Mosaic on real TPUs and fall back to the Pallas
interpreter elsewhere (CPU test meshes), controlled by ``MC_TPU_INTERPRET``:
``auto`` (default), ``1``/``true`` to force, ``0``/``false`` to forbid.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["use_interpret", "cdiv", "round_up", "LANES", "SUBLANES",
           "fold_to_sublanes", "kahan_xla_update", "xla_moment_scan",
           "fused_moment_partials"]

LANES = 128      # VPU lane count: last-dim tile unit
SUBLANES = 8     # f32 sublane count: second-to-last-dim tile unit


def use_interpret() -> bool:
    env = os.environ.get("MC_TPU_INTERPRET", "auto").lower()
    if env in ("1", "true", "yes"):
        return True
    if env in ("0", "false", "no"):
        return False
    return jax.default_backend() != "tpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def fold_to_sublanes(v, tile_rows: int):
    """(tile_rows, 128) -> (8, 128) partial sums via static strided adds.

    The VPU reduces within its native 8x128 register shape; summing groups
    of 8 sublanes keeps 8x128 partial-sum granularity without a relayout.
    This is THE summation grouping both engines share — any change here
    must hold for the Pallas kernels and the XLA duals simultaneously or
    the bit-identical-engines invariant breaks.
    """
    p8 = v[0:SUBLANES]
    for k in range(1, tile_rows // SUBLANES):
        p8 = p8 + v[k * SUBLANES:(k + 1) * SUBLANES]
    return p8


def kahan_xla_update(acc, comp, idx, p8):
    """One Kahan accumulation step on stacked functional arrays.

    ``acc``/``comp`` are (..., 8, 128) arrays indexed at ``idx``; returns
    the updated pair.  The exact op order mirrors the in-kernel ref-based
    update in path_kernels._accumulate_moments — shared so the engine
    duals cannot drift apart.
    """
    a = acc[idx]
    y = p8 - comp[idx]
    t = a + y
    return acc.at[idx].set(t), comp.at[idx].set((t - a) - y)


def xla_moment_scan(tile_fn, n_paths: int, tile_rows: int, n_out: int,
                    offset=0, bound=None):
    """Scan path tiles and Kahan-accumulate n_out (8,128) moment slabs.

    The ONE tile-iteration loop every XLA engine dual shares (GBM, Heston,
    basket, MLMC): builds global path ids and the validity mask, calls
    ``tile_fn(ids, valid) -> [v_0 .. v_{n_out-1}]`` (each (tile_rows, 128)),
    folds each to (8,128), and Kahan-accumulates across tiles in the same
    order as the Pallas kernels' in-VMEM accumulators.  Returns a tuple of
    n_out (8,128) f32 arrays.
    """
    per_tile = tile_rows * LANES
    n_tiles = cdiv(n_paths, per_tile)
    shape = (tile_rows, LANES)
    flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    offset = jnp.asarray(offset, jnp.uint32)
    bound = (offset + jnp.uint32(n_paths) if bound is None
             else jnp.asarray(bound, jnp.uint32))

    def one_tile(carry, i):
        acc, comp = carry
        ids = offset + jnp.uint32(i * per_tile) + flat
        valid = ids < bound
        for m, v in enumerate(tile_fn(ids, valid)):
            acc, comp = kahan_xla_update(acc, comp, m,
                                         fold_to_sublanes(v, tile_rows))
        return (acc, comp), None

    # `+ 0 * offset` aligns the scan carry's varying-manual-axes type with
    # the body output under shard_map; a numerical no-op otherwise.
    zeros = (jnp.zeros((n_out, SUBLANES, LANES), jnp.float32)
             + jnp.float32(0) * offset.astype(jnp.float32))
    (acc, _), _ = jax.lax.scan(
        one_tile, (zeros, zeros), jnp.arange(n_tiles, dtype=jnp.uint32))
    return tuple(acc[m] for m in range(n_out))


def fused_moment_partials(tile, cfg, key, pv, path_offset=0,
                          n_valid=None, engine="pallas", interpret=None):
    """(sum, sumsq) (8,128) Kahan slabs of a per-path payoff — the ONE
    fused-engine scaffolding every packed-params terminal pricer shares
    (round-4 rates swaption kernels; see models/hullwhite.py).

    ``tile(pv_ref, ids, valid, k0, k1, bitcast) -> (tile_rows, 128)``
    computes the masked payoff for one tile; it must read ONLY from the
    packed f32 vector ``pv`` (SMEM ref inside the kernel, plain array in
    the dual), so the SAME function body serves both engines and the
    bitwise pallas==xla contract holds by construction.
    """
    offset = jnp.asarray(path_offset, jnp.uint32)
    bound = (offset + jnp.uint32(cfg.n_paths) if n_valid is None
             else jnp.asarray(n_valid, jnp.uint32))
    if engine == "pallas":
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from mc_tpu.ops import path_kernels as pk

        def kernel(key_ref, params_ref, meta_ref, sum_ref, sq_ref,
                   comp_ref):
            i = pl.program_id(0)
            shape = (cfg.tile_rows, LANES)
            base = jnp.uint32(i * cfg.paths_per_tile)
            flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                    * LANES
                    + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
            ids = meta_ref[0] + base + flat
            valid = ids < meta_ref[1]
            pay = tile(params_ref, ids, valid, key_ref[0], key_ref[1],
                       pltpu.bitcast)
            pk._accumulate_moments((sum_ref, sq_ref), comp_ref,
                                   [pay, pay * pay], i, cfg.tile_rows)

        acc_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(cfg.n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
            out_specs=[acc_spec, acc_spec],
            out_shape=[jax.ShapeDtypeStruct((SUBLANES, LANES),
                                            jnp.float32)] * 2,
            scratch_shapes=[pltpu.VMEM((2, SUBLANES, LANES),
                                       jnp.float32)],
            interpret=interpret,
        )(jnp.asarray(key, jnp.uint32), pv, jnp.stack([offset, bound]))
    k0 = jnp.asarray(key[0], jnp.uint32)
    k1 = jnp.asarray(key[1], jnp.uint32)

    def tile_fn(ids, valid):
        pay = tile(pv, ids, valid, k0, k1,
                   jax.lax.bitcast_convert_type)
        return [pay, pay * pay]

    return xla_moment_scan(tile_fn, cfg.n_paths, cfg.tile_rows, 2,
                           offset=offset, bound=bound)
