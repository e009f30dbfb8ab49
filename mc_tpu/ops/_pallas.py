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
           "fold_to_sublanes", "kahan_xla_update", "xla_moment_scan"]

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
