#!/usr/bin/env python
"""Benchmark harness: paths/sec/chip on the reference's headline workload.

The reference publishes no numbers (BASELINE.md) — its demo config is the
1M-path European call under GBM validated against Black-Scholes
(hello.cu:5-19, scaled to 1M per BASELINE.json).  This harness measures the
fused Pallas pricing kernel on the current default backend with
block_until_ready timing, checks |price - BS| <= 3 stderr, and prints ONE
JSON line.

vs_baseline: ratio against an estimated 1e9 paths/sec for the reference's
CUDA vanilla pricer on an A100 (the reference ships no timing code at all;
this estimate — RNG setup + one curand normal + exp + tree reduce per path,
HBM/latency bound — is recorded here so the denominator is explicit).
BASELINE.json's target is >= 2x that, i.e. vs_baseline >= 2.0.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from mc_tpu import SimParams, price
from mc_tpu.oracle import bs_call

REFERENCE_A100_PATHS_PER_SEC = 1.0e9  # documented estimate, see module docstring

N_PATHS = 1_000_000
REPS = 20


def measure(fn):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sim = SimParams(n_paths=N_PATHS, n_steps=100)
    run = lambda: price(sim=sim, engine="pallas").price.block_until_ready()
    dt = measure(run)
    paths_per_sec = N_PATHS / dt

    res = price(sim=sim, engine="pallas")
    bs = float(bs_call(100.0, 100.0, 1.0, 0.1, 0.2))
    err_se = abs(float(res.price) - bs) / float(res.stderr)
    ok = err_se <= 3.0

    print(json.dumps({
        "metric": "paths/sec/chip, 1M-path Euro call",
        "value": round(paths_per_sec, 1),
        "unit": "paths/sec",
        "vs_baseline": round(paths_per_sec / REFERENCE_A100_PATHS_PER_SEC, 4),
        "extra": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "price": float(res.price),
            "black_scholes": bs,
            "abs_err_in_stderr": round(err_se, 3),
            "accuracy_ok_3se": bool(ok),
            "wall_ms": round(dt * 1e3, 3),
        },
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
