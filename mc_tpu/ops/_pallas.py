"""Shared Pallas plumbing: interpret-mode selection and tiling helpers.

Kernels compile to Mosaic on real TPUs and fall back to the Pallas
interpreter elsewhere (CPU test meshes), controlled by ``MC_TPU_INTERPRET``:
``auto`` (default), ``1``/``true`` to force, ``0``/``false`` to forbid.
"""

from __future__ import annotations

import os

import jax

__all__ = ["use_interpret", "cdiv", "round_up", "LANES", "SUBLANES",
           "fold_to_sublanes", "kahan_xla_update"]

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
