"""Shared Pallas plumbing: interpret-mode selection and tiling helpers.

Kernels compile to Mosaic on real TPUs and fall back to the Pallas
interpreter elsewhere (CPU test meshes), controlled by ``MC_TPU_INTERPRET``:
``auto`` (default), ``1``/``true`` to force, ``0``/``false`` to forbid.
"""

from __future__ import annotations

import os

import jax

__all__ = ["use_interpret", "cdiv", "round_up", "LANES", "SUBLANES"]

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
