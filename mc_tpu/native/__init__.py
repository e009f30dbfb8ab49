"""Native (C++) host runtime: see src/mc_native.cpp and lib.py."""

from mc_tpu.native import lib

__all__ = ["lib"]
