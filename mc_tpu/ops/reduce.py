"""Hierarchical reductions: the TPU equivalent of ``inc/reduce.cuh``.

The reference ships four escalating shared-memory tree-sum kernels
(reduce3..reduce6, ``inc/reduce.cuh:9-227``, ported from the NVIDIA sample)
plus global-memory ``atomicAdd`` for the grid-level combine.  On TPU none of
that machinery exists or is needed:

* warp shuffle + shared-memory tree  ->  a single ``jnp.sum`` over a VMEM
  tile (the VPU reduces 8x128 registers natively);
* per-block partials (``g_odata[blockIdx.x]``)  ->  per-grid-step lane
  partials written to an ``(n_tiles, 128)`` output;
* ``atomicAdd`` across blocks  ->  *sequential* grid accumulation — the TPU
  grid is executed in order on each core, so revisiting an output block is
  race-free by construction (SURVEY.md section 2, "parallelism strategies");
* NCCL (absent in the reference)  ->  ``jax.lax.psum`` over a mesh axis
  (see mc_tpu/parallel/mesh.py).

Accuracy: payoff sums at 1e9 paths overflow f32 relative precision, so the
f32 lane partials are combined in float64 (`finish_sum`) — cheap because
only ``n_tiles * 128`` values ever touch f64.  A Kahan-compensated f32 sum
is provided as a CPU-friendly cross-check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mc_tpu.ops._pallas import (LANES, SUBLANES,
                                fold_to_sublanes as _fold8, round_up,
                                use_interpret)

__all__ = [
    "tile_partials",
    "sum_pallas",
    "sum_sumsq_pallas",
    "finish_sum",
    "kahan_sum",
    "pad_to_tiles",
]


def pad_to_tiles(x, tile_rows: int):
    """Flatten to 1-D, zero-pad, reshape to (n_tiles * tile_rows, LANES)."""
    flat = jnp.ravel(x)
    n = flat.shape[0]
    per_tile = tile_rows * LANES
    padded = round_up(max(n, 1), per_tile)
    flat = jnp.pad(flat, (0, padded - n))
    return flat.reshape(padded // LANES, LANES), padded // per_tile



def _partials_kernel_factory(tile_rows: int):
    def kernel(x_ref, out_ref, comp_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            comp_ref[:] = jnp.zeros_like(comp_ref)

        p8 = _fold8(x_ref[:], tile_rows)
        acc = out_ref[:]
        y = p8 - comp_ref[0]
        t = acc + y
        comp_ref[0] = (t - acc) - y
        out_ref[:] = t

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def tile_partials(x, tile_rows: int = 256, interpret: bool | None = None):
    """Hierarchical sum partials: the reduce3..6 analogue.

    Each grid step tree-reduces one (tile_rows, 128) VMEM tile to (8, 128)
    and Kahan-accumulates it into a single (8, 128) VMEM accumulator block —
    the sequential-grid replacement for the reference's per-block partials +
    atomicAdd combine.  Returns the (8, 128) f32 accumulator.
    """
    if interpret is None:
        interpret = use_interpret()
    x2d, n_tiles = pad_to_tiles(x, tile_rows)
    return pl.pallas_call(
        _partials_kernel_factory(tile_rows),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, SUBLANES, LANES), jnp.float32)],
        interpret=interpret,
    )(x2d)


def _df_add(ah, al, bh, bl):
    """Double-float addition: Knuth TwoSum on the high parts + renorm.

    (ah, al) + (bh, bl) -> (hi, lo) with ~2^-47 relative error — two f32
    words emulate near-f64 precision with plain vector flops.
    """
    s = ah + bh
    bb = s - ah
    err = (ah - (s - bb)) + (bh - bb)
    lo = err + al + bl
    hi = s + lo
    lo = lo - (hi - s)
    return hi, lo


def finish_sum(partials, dtype=jnp.float64):
    """Combine the (8,128) accumulator block exactly.

    With x64 enabled this is a plain f64 tree-sum.  On TPU (x64 off), a
    double-float (TwoSum-compensated) BINARY TREE over the 1024 cells
    carries ~47 bits of precision — the cells are already Kahan-exact,
    so the whole 1e9-path sum ends within ~1-2 ulp.  The tree is 10
    fully-vectorized levels; the sequential Neumaier scan it replaced
    cost ~1 ms of latency per call (1024 dependent VPU steps), which
    DOMINATED terminal-draw pricing (measured: the full 1M-path vanilla
    impl dropped 1.98 -> 0.060 ms/call).

    On the CPU backend the scan is kept: latency is irrelevant there,
    and XLA:CPU's compiler was observed to segfault nondeterministically
    compiling large vmapped programs containing the unrolled tree late
    in long-lived processes (reproduced 4/4 full-suite runs with the
    tree — both reshape and slice forms — and 0/3 with the scan).
    """
    flat = jnp.ravel(partials)
    if dtype == jnp.float64 and jax.config.jax_enable_x64:
        return jnp.sum(flat.astype(jnp.float64))

    if jax.default_backend() == "cpu":
        def body(carry, v):
            s, c = carry
            t = s + v
            c = c + jnp.where(jnp.abs(s) >= jnp.abs(v),
                              (s - t) + v, (v - t) + s)
            return (t, c), None

        (s, c), _ = jax.lax.scan(
            body, (jnp.float32(0), jnp.float32(0)),
            flat.astype(jnp.float32))
        return s + c

    n = flat.shape[0]
    pad = 1
    while pad < n:
        pad *= 2
    hi = jnp.pad(flat.astype(jnp.float32), (0, pad - n))
    lo = jnp.zeros_like(hi)
    # fold-in-half levels (contiguous slices; no strided reshapes)
    while hi.shape[0] > 1:
        half = hi.shape[0] // 2
        hi, lo = _df_add(hi[:half], lo[:half], hi[half:], lo[half:])
    return (hi + lo)[0]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def sum_pallas(x, tile_rows: int = 256, interpret: bool | None = None):
    """Full hierarchical sum of an array (f32 in, f64-combined out)."""
    return finish_sum(tile_partials(x, tile_rows=tile_rows, interpret=interpret))


def _sum_sumsq_kernel_factory(tile_rows: int):
    def kernel(x_ref, s_ref, s2_ref, comp_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s_ref[:] = jnp.zeros_like(s_ref)
            s2_ref[:] = jnp.zeros_like(s2_ref)
            comp_ref[:] = jnp.zeros_like(comp_ref)

        v = x_ref[:]
        for idx, (out_ref, p8) in enumerate(
                ((s_ref, _fold8(v, tile_rows)),
                 (s2_ref, _fold8(v * v, tile_rows)))):
            acc = out_ref[:]
            y = p8 - comp_ref[idx]
            t = acc + y
            comp_ref[idx] = (t - acc) - y
            out_ref[:] = t

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def sum_sumsq_pallas(x, tile_rows: int = 256, interpret: bool | None = None):
    """Fused (sum, sum of squares) — one pass over HBM.

    The moment pair feeds `oracle.summarize` (price + standard error); the
    reference never computed a standard error at all (SURVEY.md section 5).
    """
    if interpret is None:
        interpret = use_interpret()
    x2d, n_tiles = pad_to_tiles(x, tile_rows)
    s, s2 = pl.pallas_call(
        _sum_sumsq_kernel_factory(tile_rows),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, SUBLANES, LANES), jnp.float32)],
        interpret=interpret,
    )(x2d)
    return finish_sum(s), finish_sum(s2)


@jax.jit
def kahan_sum(x):
    """Kahan-compensated sequential f32 sum (ground truth for tests).

    Plays the role of the reference's CPU ``sum_random_array`` oracle
    (``inc/testing.cuh:161-174``) that reduce3..6 are checked against.
    """
    flat = jnp.ravel(x)

    def body(carry, v):
        total, comp = carry
        y = v - comp
        t = total + y
        comp = (t - total) - y
        return (t, comp), None

    (total, _), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)), flat)
    return total
