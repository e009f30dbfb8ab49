#!/usr/bin/env python
"""Benchmark harness: paths/sec/chip on the reference's headline workload.

The reference publishes no numbers (BASELINE.md) — its demo config is the
1M-path European call under GBM validated against Black-Scholes
(hello.cu:5-19, scaled to 1M per BASELINE.json).

Methodology: the remote-TPU tunnel used in this environment costs ~30 ms
per host<->device round trip and its block_until_ready does not synchronize,
so naive wall timing measures only fetch latency.  Device throughput is
measured by running the SAME jitted program with K kernel invocations
folded into one scalar (lax.map over K keys + sum -> one fetch) and
differencing T(K) - T(1): fixed program/fetch overhead cancels and what
remains is K-1 kernel executions.  Linearity of this estimate in both
n_paths and K was verified (tests/test_bench_method on CPU; measured on
the v5e chip).

vs_baseline: ratio against an estimated 1e9 paths/sec for the reference's
CUDA vanilla pricer on an A100 (the reference ships no timing code; the
estimate — curand setup + one normal + exp + tree reduce per path — is
recorded so the denominator is explicit).  BASELINE.json's target is
>= 2x that, i.e. vs_baseline >= 2.0.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

from mc_tpu import OptionParams, SimParams, price, rng
from mc_tpu.oracle import bs_call
from mc_tpu.ops import path_kernels as pk
from mc_tpu.ops.payoffs import get_payoff

REFERENCE_A100_PATHS_PER_SEC = 1.0e9  # documented estimate, see docstring

N_PATHS = 1_000_000
N_STEPS = 100
K_REPS = 16
OPT = OptionParams().as_f32()


@functools.partial(jax.jit, static_argnames=("payoff", "cfg"))
def _multi(payoff, cfg, keys):
    """K kernel executions folded to one scalar => one device fetch."""
    params = pk.pack_params(OPT, cfg.n_steps)
    return jnp.sum(jax.lax.map(
        lambda key: pk.simulate_partials(payoff, cfg, key, params)[0].sum(),
        keys))


def _keys(n):
    import numpy as np
    return jnp.asarray(np.stack([rng.derive_key(s, 0) for s in range(n)]),
                       jnp.uint32)


def kernel_seconds(payoff_name="vanilla_call", method="terminal",
                   n_paths=N_PATHS, n_steps=N_STEPS, k=K_REPS, reps=4,
                   rng_source="threefry"):
    """Per-kernel device seconds via the T(K)-T(1) differential.

    K adapts upward until the differential signal is >> the ~ms-level
    per-fetch jitter, so small kernels aren't over-credited.
    """
    payoff = get_payoff(payoff_name)
    cfg = pk.KernelConfig(n_paths=n_paths, n_steps=n_steps, method=method,
                          rng_source=rng_source)

    def best_of(keys):
        float(_multi(payoff, cfg, keys))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(_multi(payoff, cfg, keys))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(_keys(1))
    while True:
        dt = max((best_of(_keys(k)) - t1) / (k - 1), 1e-9)
        if dt * (k - 1) > 10e-3 or k >= 512:  # >=10 ms of signal
            return dt
        k *= 4


def main():
    # Headline: 1M-path European call (exact terminal draw).
    dt = kernel_seconds()
    paths_per_sec = N_PATHS / dt

    # Secondary: bullet path-steps/sec (the step-loop workload).
    dt_bullet = kernel_seconds("bullet_call", "euler")
    bullet_ps = N_PATHS * N_STEPS / dt_bullet

    # Accuracy gate: |price - BS| <= 3 stderr at the same config.
    res = price(sim=SimParams(n_paths=N_PATHS, n_steps=N_STEPS),
                engine="pallas")
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
            "kernel_ms_1M_call": round(dt * 1e3, 4),
            "bullet_path_steps_per_sec": round(bullet_ps, 1),
            "price": float(res.price),
            "black_scholes": bs,
            "abs_err_in_stderr": round(err_se, 3),
            "accuracy_ok_3se": bool(ok),
        },
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
