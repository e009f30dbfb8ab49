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
import traceback

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
# Set by _init_params() AFTER the backend is probed/decided: building the
# f32 params is the first device touch, and doing it at import time is how
# the round-3 bench died with a traceback instead of a JSON line when the
# TPU tunnel was down (BENCH_r03.json rc=1).
OPT = None


def _init_params():
    global OPT
    if OPT is None:
        OPT = OptionParams().as_f32()


@functools.partial(jax.jit, static_argnames=("payoff", "cfg"))
def _multi(payoff, cfg, keys):
    """K kernel executions folded to one scalar => one device fetch."""
    params = pk.pack_params(OPT, cfg.n_steps)
    return jnp.sum(jax.lax.map(
        lambda key: pk.simulate_partials(payoff, cfg, key, params)[0].sum(),
        keys))


# Minimum T(K)-T(1) differential span per measurement.  The tunnel's
# per-call overhead jitter is ~1 ms; at the old 10 ms floor that put a
# 10-30% noise floor on the fast family rows (localvol 0.285,
# merton 0.21 rel_spread in the r05 interactive run despite 7 adaptive
# reps).  30 ms of signal cuts the per-measurement noise ~3x at the
# source, so the adaptive-rep loop converges instead of capping.
_MIN_SIGNAL_S = 30e-3
# Chain-length cap for the auto-growing K.  The old 512 exited the
# ~28us headline kernels at only ~14ms of signal (below the floor:
# headline rel_spread 0.121 at the 15-rep cap even after the 30ms fix
# landed for the slower family rows).  lax.map is a scan, so compile
# time is O(1) in K — 2048 chains cost nothing but the 57ms they run.
_MAX_CHAIN = 2048


def _keys(n):
    import numpy as np
    return jnp.asarray(np.stack([rng.derive_key(s, 0) for s in range(n)]),
                       jnp.uint32)


def kernel_seconds(payoff_name="vanilla_call", method="terminal",
                   n_paths=N_PATHS, n_steps=N_STEPS, k=K_REPS, reps=4,
                   rng_source="threefry13"):
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
        if dt * (k - 1) > _MIN_SIGNAL_S or k >= _MAX_CHAIN:
            return dt
        k *= 4


@functools.partial(jax.jit, static_argnames=("payoff", "cfg"))
def _multi_pair(payoff, cfg, n_total, keys):
    """K paired-terminal kernel executions folded to one scalar."""
    params = pk.pack_params(OPT, cfg.n_steps)
    return jnp.sum(jax.lax.map(
        lambda key: pk.terminal_pair_partials(
            payoff, cfg, key, params, n_total)[0].sum(),
        keys))


def terminal_pair_seconds(n_paths=N_PATHS, n_steps=N_STEPS, k=K_REPS,
                          reps=4, rng_source="threefry13"):
    """Per-kernel device seconds of the paired terminal kernel
    (method="terminal_pair": both Box-Muller halves become paths)."""
    payoff = get_payoff("vanilla_call")
    cfg = pk.KernelConfig(n_paths=(n_paths + 1) // 2, n_steps=n_steps,
                          tile_rows=128, rng_source=rng_source)
    n_total = jnp.uint32(n_paths)

    def best_of(keys):
        float(_multi_pair(payoff, cfg, n_total, keys))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(_multi_pair(payoff, cfg, n_total, keys))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(_keys(1))
    while True:
        dt = max((best_of(_keys(k)) - t1) / (k - 1), 1e-9)
        if dt * (k - 1) > _MIN_SIGNAL_S or k >= _MAX_CHAIN:
            return dt
        k *= 4


def _median(samples):
    m = len(samples)
    return samples[m // 2] if m % 2 else 0.5 * (samples[m // 2 - 1]
                                                + samples[m // 2])


def _central_spread(samples, window=5):
    """(max - min)/median over the central `window` of the SORTED
    samples — the median's own neighborhood.  Equal to the plain
    (max-min)/median when len(samples) <= window, so the round-4
    numbers stay comparable; with more reps it measures the spread the
    median is actually drawn from instead of rewarding outliers."""
    k = len(samples)
    lo = max(0, (k - window) // 2)
    w = samples[lo:lo + window]
    med = _median(samples)
    return (w[-1] - w[0]) / med if med > 0 else 0.0


def median_of(fn, m=5):
    """Repeat a full measurement m times; return (median, rel_spread).

    BASELINE.md documents 18-25e9 paths/s run-to-run spread on the
    headline through the tunnel — a single draw is noise, the median of
    m independent T(K)-T(1) measurements is signal.  rel_spread =
    (max - min) / median over the m samples.
    """
    samples = sorted(fn() for _ in range(m))
    return _median(samples), _central_spread(samples)


def median_until(fn, target=0.08, m0=5, mmax=15):
    """Adaptive-rep median (VERDICT r04 item 6): keep adding independent
    measurements until the central spread is <= `target` or `mmax` reps
    — returns (median, rel_spread, reps).  classic (17.7%) and
    terminal_pair_hw (15.9%) were unreadable round-over-round at a
    fixed 5; rows that stay above target at the cap are explicitly
    capped (the recorded spread says so)."""
    samples = sorted(fn() for _ in range(m0))
    while _central_spread(samples) > target and len(samples) < mmax:
        samples = sorted(samples + [fn()])
    return _median(samples), _central_spread(samples), len(samples)


def _trivial_fetch_overhead(reps=5):
    """Seconds of fixed per-call overhead (dispatch + tunnel fetch)."""
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(jnp.float32(0)))
        best = min(best, time.perf_counter() - t0)
    return best


def heston_kernel_seconds(n_paths=N_PATHS, n_steps=N_STEPS, k=8, reps=4,
                          scheme="euler", rng_source="threefry13"):
    """Per-kernel device seconds of the fused Heston step kernel."""
    from mc_tpu.models.heston import (DEMO_HESTON, _heston_partials_pallas,
                                      _pack_heston)
    payoff = get_payoff("vanilla_call")
    cfg = pk.KernelConfig(n_paths=n_paths, n_steps=n_steps, tile_rows=128,
                          rng_source=rng_source)
    params = _pack_heston(OPT, DEMO_HESTON.as_f32(), n_steps)

    @jax.jit
    def multi(keys):
        return jnp.sum(jax.lax.map(
            lambda key: _heston_partials_pallas(
                payoff, cfg, key, params, 0, None, False,
                scheme=scheme)[0].sum(),
            keys))

    def best_of(keys):
        float(multi(keys))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(multi(keys))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(_keys(1))
    while True:
        dt = max((best_of(_keys(k)) - t1) / (k - 1), 1e-9)
        if dt * (k - 1) > _MIN_SIGNAL_S or k >= _MAX_CHAIN:
            return dt
        k *= 4


def bates_kernel_seconds(n_paths=N_PATHS, n_steps=N_STEPS, k=8, reps=4,
                         scheme="euler", rng_source="threefry13"):
    """Per-kernel device seconds of the fused Bates SVJ step kernel."""
    from mc_tpu.models.bates import (DEMO_BATES, _bates_partials,
                                     _pack_bates)
    from mc_tpu.models.merton import poisson_kmax
    payoff = get_payoff("vanilla_call")
    cfg = pk.KernelConfig(n_paths=n_paths, n_steps=n_steps, tile_rows=128,
                          rng_source=rng_source)
    params = _pack_bates(OPT, DEMO_BATES.as_f32(), n_steps)
    kmax = poisson_kmax(float(DEMO_BATES.lam) * float(OPT.t) / n_steps)

    @jax.jit
    def multi(keys):
        return jnp.sum(jax.lax.map(
            lambda key: _bates_partials(
                payoff, cfg, kmax, key, params, engine="pallas",
                interpret=False, scheme=scheme)[0].sum(),
            keys))

    def best_of(keys):
        float(multi(keys))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(multi(keys))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(_keys(1))
    while True:
        dt = max((best_of(_keys(k)) - t1) / (k - 1), 1e-9)
        if dt * (k - 1) > _MIN_SIGNAL_S or k >= _MAX_CHAIN:
            return dt
        k *= 4


def _model_kernel_seconds(price_scalar_fn, k=8, reps=4):
    """T(K)-T(1) differential of a model-family pricing kernel.

    ``price_scalar_fn(key) -> scalar`` must be jit-safe (everything static
    except the key).
    """
    @jax.jit
    def multi(keys):
        return jnp.sum(jax.lax.map(price_scalar_fn, keys))

    def best_of(keys):
        float(multi(keys))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(multi(keys))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(_keys(1))
    while True:
        dt = max((best_of(_keys(k)) - t1) / (k - 1), 1e-9)
        if dt * (k - 1) > _MIN_SIGNAL_S or k >= _MAX_CHAIN:
            return dt
        k *= 4


def merton_kernel_seconds(n_paths=N_PATHS, n_steps=N_STEPS,
                          rng_source="threefry13"):
    """Fused Merton jump-diffusion step kernel (3 threefry + Poisson scan
    per step pair)."""
    from mc_tpu import SimParams
    from mc_tpu.models.merton import DEMO_MERTON, _price_merton_impl, \
        poisson_kmax
    from mc_tpu.ops.payoffs import get_payoff
    sim = SimParams(n_paths=n_paths, n_steps=n_steps)
    kmax = poisson_kmax(float(DEMO_MERTON.lam) * float(OPT.t) / n_steps)
    po = get_payoff("vanilla_call")

    def one(key):
        return _price_merton_impl(OPT, DEMO_MERTON.as_f32(), po, sim,
                                  "euler", kmax, "pallas", False, 128,
                                  False, key,
                                  rng_source=rng_source).price

    return _model_kernel_seconds(one)


def sabr_kernel_seconds(n_paths=N_PATHS, n_steps=N_STEPS,
                        rng_source="threefry13"):
    """Fused SABR two-factor step kernel (1 threefry per step)."""
    from mc_tpu import SimParams
    from mc_tpu.models.sabr import DEMO_SABR, _price_sabr_impl
    from mc_tpu.ops.payoffs import get_payoff
    sim = SimParams(n_paths=n_paths, n_steps=n_steps)
    po = get_payoff("vanilla_call")

    def one(key):
        return _price_sabr_impl(OPT, DEMO_SABR.as_f32(), po, sim, "pallas",
                                False, 128, False, key,
                                rng_source=rng_source).price

    return _model_kernel_seconds(one)


def vasicek_kernel_seconds(n_paths=N_PATHS, n_steps=N_STEPS,
                           rng_source="threefry13"):
    """Fused Black-Scholes-Vasicek kernel (exact OU triple, 3 pairs per
    step pair, pathwise discount)."""
    from mc_tpu import SimParams
    from mc_tpu.models.vasicek import DEMO_VASICEK, _price_vasicek_impl
    from mc_tpu.ops.payoffs import get_payoff
    sim = SimParams(n_paths=n_paths, n_steps=n_steps)
    po = get_payoff("vanilla_call")

    def one(key):
        return _price_vasicek_impl(OPT, DEMO_VASICEK.as_f32(), po, sim,
                                   "pallas", False, 128, False, key,
                                   rng_source=rng_source).price

    return _model_kernel_seconds(one)


def rainbow_kernel_seconds(n_paths=N_PATHS, d=4):
    """Correlated terminal-draw rainbow kernel (call-on-max, d assets)."""
    from mc_tpu import SimParams
    from mc_tpu.models.basket import _demo_basket
    from mc_tpu.models.rainbow import _price_rainbow_impl
    sim = SimParams(n_paths=n_paths, n_steps=1)
    dyn = _demo_basket(d=d).as_f32()

    def one(key):
        return _price_rainbow_impl(OPT, dyn, "call_on_max", sim, d,
                                   "pallas", False, 128, False, key).price

    return _model_kernel_seconds(one)


def fx_kernel_seconds(n_paths=N_PATHS):
    """Cross-currency exact-terminal kernel (quanto call: one Box-Muller
    pair per path, in-register rho mixing)."""
    from mc_tpu import SimParams
    from mc_tpu.models.fx import DEMO_FX, _price_fx_impl
    sim = SimParams(n_paths=n_paths, n_steps=1)
    fx = DEMO_FX.as_f32()

    def one(key):
        return _price_fx_impl(OPT, fx, "quanto_call", sim, "pallas", 128,
                              False, key).price

    return _model_kernel_seconds(one)


def localvol_kernel_seconds(n_paths=N_PATHS, n_steps=N_STEPS,
                            n_knots=9, rng_source="threefry13"):
    """Local-vol surface kernel (K-1 clamped-ramp FMAs per step)."""
    from mc_tpu import SimParams
    from mc_tpu.models.localvol import (LocalVolSurface,
                                        _price_localvol_impl)
    from mc_tpu.ops.payoffs import get_payoff
    sim = SimParams(n_paths=n_paths, n_steps=n_steps)
    surf = LocalVolSurface.demo(n_steps).as_f32()
    po = get_payoff("vanilla_call")

    def one(key):
        return _price_localvol_impl(OPT, surf, po, sim, n_knots,
                                    "pallas", False, 128, False, key,
                                    rng_source=rng_source).price

    return _model_kernel_seconds(one)


def hw_swaption_kernel_seconds(n_paths=N_PATHS):
    """Curve-fitted Hull-White European swaption kernel: ONE exact
    (x, int x) expiry draw, curve-reconstructed coupon bonds, pathwise
    curve discounting (models/hullwhite.py)."""
    from mc_tpu.models.hullwhite import (DEMO_CURVE, DEMO_HW,
                                         _hw_european_impl, _hw_tables)
    from mc_tpu.models.swaption import DEMO_SWAPTION
    spec = DEMO_SWAPTION.validate()
    p0, c, bmat, corr = _hw_tables(spec, DEMO_HW, DEMO_CURVE)
    a = jnp.float32(DEMO_HW.a)
    s = jnp.float32(DEMO_HW.sigma_r)
    p00, c0 = jnp.float32(p0[0]), jnp.float32(c[0])

    def one(key):
        return _hw_european_impl(spec, a, s, n_paths, key, p00, c0,
                                 (p0, bmat, corr)).price

    return _model_kernel_seconds(one)


def g2_swaption_kernel_seconds(n_paths=N_PATHS):
    """G2++ European swaption kernel: ONE exact (x, y, int(x+y)) draw
    through the 3x3 Cholesky, two-factor bond reconstruction
    (models/g2pp.py)."""
    from mc_tpu.models.g2pp import (DEMO_CURVE, DEMO_G2,
                                    _g2_european_impl, _g2_tables)
    from mc_tpu.models.swaption import DEMO_SWAPTION
    spec = DEMO_SWAPTION.validate()
    consts = _g2_tables(spec, DEMO_G2, DEMO_CURVE)

    def one(key):
        return _g2_european_impl(spec, DEMO_G2, n_paths, key,
                                 consts).price

    return _model_kernel_seconds(one)


def hw_swaption_fused_kernel_seconds(n_paths=N_PATHS, engine="pallas"):
    """Round-4 fused European swaption engines (one Mosaic kernel or its
    bitwise XLA dual) — measured against the classic single-fusion
    default so the Pallas-or-not decision for the rates stack is data
    (VERDICT r03 item 4)."""
    from mc_tpu.models.hullwhite import (DEMO_CURVE, DEMO_HW,
                                         _hw_european_fused_impl,
                                         _hw_tables, _pack_hw_swpt)
    from mc_tpu.models.swaption import DEMO_SWAPTION
    spec = DEMO_SWAPTION.validate()
    p0, c, bmat, corr = _hw_tables(spec, DEMO_HW, DEMO_CURVE)
    pv = _pack_hw_swpt(jnp.float32(DEMO_HW.a),
                       jnp.float32(DEMO_HW.sigma_r), spec, p0, c, bmat,
                       corr)

    def one(key):
        return _hw_european_fused_impl(spec.n_payments, n_paths, engine,
                                       128, False, key, pv).price

    return _model_kernel_seconds(one)


def va_swaption_fused_kernel_seconds(n_paths=N_PATHS, engine="pallas"):
    """Fused Vasicek European swaption engines (see the HW twin)."""
    from mc_tpu.models.swaption import (DEMO_SWAPTION, _pack_va_swpt,
                                        _va_european_fused_impl)
    from mc_tpu.models.vasicek import DEMO_VASICEK
    spec = DEMO_SWAPTION.validate()
    d32 = DEMO_VASICEK.as_f32()
    pv = _pack_va_swpt(spec, jnp.float32(d32.a), jnp.float32(d32.b),
                       jnp.float32(d32.sigma_r), jnp.float32(0.05))

    def one(key):
        return _va_european_fused_impl(spec.n_payments, n_paths, engine,
                                       128, False, key, pv).price

    return _model_kernel_seconds(one)


def g2_swaption_fused_kernel_seconds(n_paths=N_PATHS, engine="pallas"):
    """Fused two-factor European swaption engines (see the HW twin)."""
    from mc_tpu.models.g2pp import (DEMO_CURVE, DEMO_G2,
                                    _g2_european_fused_impl, _g2_tables,
                                    _pack_g2_swpt)
    from mc_tpu.models.swaption import DEMO_SWAPTION
    spec = DEMO_SWAPTION.validate()
    consts = _g2_tables(spec, DEMO_G2, DEMO_CURVE)
    pv = _pack_g2_swpt(spec, DEMO_G2, consts)

    def one(key):
        return _g2_european_fused_impl(spec.n_payments, n_paths, engine,
                                       128, False, key, pv).price

    return _model_kernel_seconds(one)


def qmc_kernel_seconds(n_steps=1, k=8, reps=4):
    """Per-lattice-pass device seconds (terminal QMC, n ~ 1M points).

    Unit = one full rank-1 lattice evaluation (one random shift); the
    differential folds k independent shifts into one jitted scalar.
    """
    import numpy as np

    from mc_tpu import qmc as q
    payoff = get_payoff("vanilla_call")
    n = q.prev_prime(1 << 20)
    zvec = jnp.asarray(q.lattice_vector(n, 1).astype(np.int32))
    cfg = pk.KernelConfig(n_paths=n, n_steps=n_steps, tile_rows=256,
                          method="terminal")
    params = pk.pack_params(OPT, n_steps)

    @jax.jit
    def multi(shifts):  # (k, 1) uniforms
        return jnp.sum(jax.lax.map(
            lambda s: q._pallas_qmc_shift_sum(payoff, cfg, params, zvec,
                                              s, n, False),
            shifts))

    rng_np = np.random.default_rng(0)

    def best_of(kk):
        shifts = jnp.asarray(rng_np.random((kk, 1), np.float32))
        float(multi(shifts))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(multi(shifts))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(1)
    while True:
        dt = max((best_of(k) - t1) / (k - 1), 1e-9)
        if dt * (k - 1) > _MIN_SIGNAL_S or k >= _MAX_CHAIN:
            return dt, n
        k *= 4


def nmc_demo_seconds(reps=2, rng_source="threefry13"):
    """Device seconds of the reference's FULL NMC demo workload:
    100k outer paths x 100 steps x 1000 inner paths (hello.cu:14-19,38-40)
    through the fused strategy at the auto tile height.
    rng_source="hw" times the opt-in hardware-PRNG inner sweep.

    A multi-second kernel needs no T(K)-T(1) folding — one run dwarfs the
    fixed dispatch/fetch overhead, which is still subtracted.
    """
    from mc_tpu.nmc import nmc_auto_tile_rows
    from mc_tpu.ops import nmc_kernels as nk
    n_paths, n_steps, n_inner = 100_000, 100, 1_000
    cfg = nk.NMCConfig(n_paths=n_paths, n_steps=n_steps, n_inner=n_inner,
                       tile_rows=nmc_auto_tile_rows(n_steps),
                       rng_source=rng_source)
    params = pk.pack_params(OPT, n_steps)
    ko = jnp.asarray(rng.derive_key(1234, 0), jnp.uint32)
    ki = jnp.asarray(rng.derive_key(1234, 1), jnp.uint32)

    @jax.jit
    def run():
        surf, osum, osq = nk.nmc_fused_kernel(get_payoff("bullet_call"),
                                              cfg, ko, ki, params,
                                              interpret=False)
        return jnp.sum(surf) + jnp.sum(osum)

    float(run())  # compile
    over = _trivial_fetch_overhead()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    # exact inner work: sum_j n_inner*(n_steps-j-1) per outer path
    inner_steps = n_paths * n_inner * n_steps * (n_steps - 1) // 2
    return max(best - over, 1e-9), inner_steps


def book_kernel_seconds(n_contracts=64, n_paths=1 << 20, n_steps=N_STEPS,
                        k=4, reps=4):
    """Device seconds for a B-contract book through the batched kernel
    (shared-RNG normal buffer), by the standard T(K)-T(1) differential."""
    import numpy as np

    from mc_tpu import OptionParams, SimParams
    from mc_tpu.engines import _book_pallas
    rng_np = np.random.default_rng(7)
    b = n_contracts
    opts = OptionParams(
        s0=np.full(b, 100.0, np.float32), t=np.full(b, 1.0, np.float32),
        k=rng_np.uniform(80, 120, b).astype(np.float32),
        r=np.full(b, 0.1, np.float32),
        sigma=rng_np.uniform(0.1, 0.4, b).astype(np.float32),
        barrier=np.full(b, 120.0, np.float32),
        p1=np.full(b, 10.0, np.float32), p2=np.full(b, 50.0, np.float32),
        q=np.zeros(b, np.float32))
    opts32 = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                    opts)
    sim = SimParams(n_paths=n_paths, n_steps=n_steps)
    key = jnp.asarray(rng.derive_key(1234, 0), jnp.uint32)
    payoff = get_payoff("bullet_call")
    tr = pk.book_tile_rows(256, n_steps, "euler")

    @jax.jit
    def multi(keys):
        return jnp.sum(jax.lax.map(
            lambda kk: jnp.sum(_book_pallas(
                payoff, opts32, sim.replace(seed=0), "euler", False, False,
                tr, kk).price),
            keys))

    def best_of(keys):
        float(multi(keys))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(multi(keys))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = max((best_of(_keys(k)) - best_of(_keys(1))) / (k - 1), 1e-9)
    return dt, b * n_paths * n_steps


def billion_path_run(payoff="vanilla_call", n_steps=N_STEPS):
    """End-to-end wall seconds (incl. tunnel overhead) of a 1B-path price."""
    sim = SimParams(n_paths=1_000_000_000, n_steps=n_steps)
    method = "terminal" if payoff == "vanilla_call" else "euler"
    res = price(sim=sim, payoff=payoff, method=method, engine="pallas")
    float(res.price)  # compile + first run
    t0 = time.perf_counter()
    res = price(sim=sim, payoff=payoff, method=method, engine="pallas")
    p, se = float(res.price), float(res.stderr)
    wall = time.perf_counter() - t0
    return {"price": p, "stderr": se, "e2e_seconds": round(wall, 3)}


def accuracy_gate(engine="pallas"):
    """|price - BS| <= 3 stderr at the headline config.  Runs on any
    backend (use engine="xla" on CPU — bitwise-identical dual)."""
    res = price(sim=SimParams(n_paths=N_PATHS, n_steps=N_STEPS),
                engine=engine)
    bs = float(bs_call(100.0, 100.0, 1.0, 0.1, 0.2))
    err_se = abs(float(res.price) - bs) / float(res.stderr)
    return {
        "price": float(res.price),
        "black_scholes": bs,
        "abs_err_in_stderr": round(err_se, 3),
        "accuracy_ok_3se": bool(err_se <= 3.0),
    }


def _no_chip_result(probe, pinned_cpu=False):
    """Scoreboard line when no TPU is reachable: valid JSON with an
    explicit marker + the CPU-runnable accuracy gate — never a traceback
    (round-3 lesson: BENCH_r03.json was a stack trace and the round's
    perf story went unrecorded)."""
    from mc_tpu.utils.platform import apply_platform
    apply_platform("cpu")
    _init_params()
    extra = {"backend_probe": probe, "backend": jax.default_backend(),
             "device": str(jax.devices()[0])}
    try:
        extra.update(accuracy_gate(engine="xla"))
    except Exception as e:  # even the gate must not kill the JSON line
        extra["accuracy_gate_error"] = repr(e)[:300]
        extra["accuracy_ok_3se"] = False
    print(json.dumps({
        "metric": "paths/sec/chip, 1M-path Euro call",
        "value": 0.0,
        "unit": "paths/sec",
        "vs_baseline": 0.0,
        "error": "cpu-pinned" if pinned_cpu else "tpu-unavailable",
        "extra": extra,
    }))
    if not extra.get("accuracy_ok_3se", False):
        return 1          # accuracy regression (distinct from "no chip")
    return 0 if pinned_cpu else 2   # 2 = no chip, CPU gate green


def _full_bench():
    """The full device measurement suite.  Every row is individually
    guarded: a mid-run tunnel hiccup downgrades one row to an entry in
    extra.row_errors instead of killing the scoreboard."""
    _init_params()
    errors = {}

    def guard(name, fn):
        try:
            return fn()
        except Exception as e:
            errors[name] = repr(e)[:300]
            return None

    extra = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "headline_reps_adaptive": "5-15 to rel_spread<=0.08 "
                                  "(families 3-7 to 0.10)",
    }

    # Headline: the paired terminal kernel (price(method="terminal_pair"),
    # the production fast path — both Box-Muller halves become paths).
    # Adaptive reps (VERDICT r04 item 6): each headline row repeats
    # until the central spread is <= 8% or 15 reps — the tunnel's
    # run-to-run spread (documented 18-25e9 paths/s, BASELINE.md) makes
    # single draws noise; spread + reps are recorded so round-over-round
    # deltas in BENCH_r*.json can be read against them.
    pair = guard("terminal_pair", lambda: median_until(terminal_pair_seconds))
    # Stateful-hw-PRNG variant — the apples-to-apples analogue of the
    # reference's per-thread curandState draw (trajectories.cuh:74-75,
    # SURVEY C3 mode (a)); threefry13 stays the reproducible default.
    pair_hw = guard("terminal_pair_hw",
                    lambda: median_until(
                        lambda: terminal_pair_seconds(rng_source="hw")))
    classic = guard("classic_terminal", lambda: median_until(kernel_seconds))
    if pair is not None:
        extra["kernel_ms_1M_call"] = round(pair[0] * 1e3, 4)
        extra["headline_rel_spread"] = round(pair[1], 4)
        extra["headline_reps"] = pair[2]
        extra["terminal_pair_paths_per_sec"] = round(N_PATHS / pair[0], 1)
    if pair_hw is not None:
        extra["terminal_pair_hw_paths_per_sec"] = round(
            N_PATHS / pair_hw[0], 1)
        extra["terminal_pair_hw_rel_spread"] = round(pair_hw[1], 4)
        extra["terminal_pair_hw_reps"] = pair_hw[2]
    if classic is not None:
        extra["kernel_ms_1M_call_classic"] = round(classic[0] * 1e3, 4)
        extra["classic_terminal_paths_per_sec"] = round(
            N_PATHS / classic[0], 1)
        extra["classic_rel_spread"] = round(classic[1], 4)
        extra["classic_reps"] = classic[2]

    # Step-loop workload at all three RNG sources (trajectories.cuh:144-148
    # analogue): BigCrush-minimal 13-round threefry (the default),
    # 20-round safety-margin stream, hardware PRNG.
    b13 = guard("bullet_threefry13",
                lambda: median_until(
                    lambda: kernel_seconds("bullet_call", "euler")))
    if b13 is not None:
        extra["bullet_path_steps_per_sec"] = round(
            N_PATHS * N_STEPS / b13[0], 1)
        extra["bullet_rel_spread"] = round(b13[1], 4)
        extra["bullet_reps"] = b13[2]
    b20 = guard("bullet_threefry20",
                lambda: kernel_seconds("bullet_call", "euler",
                                       rng_source="threefry"))
    if b20 is not None:
        extra["bullet_path_steps_per_sec_threefry20"] = round(
            N_PATHS * N_STEPS / b20, 1)
    bhw = guard("bullet_hw",
                lambda: median_until(
                    lambda: kernel_seconds("bullet_call", "euler",
                                           rng_source="hw")))
    if bhw is not None:
        extra["bullet_path_steps_per_sec_hw"] = round(
            N_PATHS * N_STEPS / bhw[0], 1)
        extra["bullet_hw_rel_spread"] = round(bhw[1], 4)
        extra["bullet_hw_reps"] = bhw[2]

    # Model-family + technique kernels: threefry13 default AND the
    # hw-PRNG variant of each (VERDICT r04 item 4 — the op-count lever
    # plumbed through the family kernels).  3-7 adaptive reps per row.
    family_dt = {}
    for name, fn in (("heston", heston_kernel_seconds),
                     ("heston_qe",
                      lambda **kw: heston_kernel_seconds(scheme="qe", **kw)),
                     ("merton", merton_kernel_seconds),
                     ("bates", bates_kernel_seconds),
                     ("sabr", sabr_kernel_seconds),
                     ("vasicek", vasicek_kernel_seconds),
                     ("localvol", localvol_kernel_seconds)):
        for src in ("threefry13", "hw"):
            row = name if src == "threefry13" else f"{name}_hw"
            r = guard(row, lambda f=fn, s=src: median_until(
                lambda: f(rng_source=s), target=0.10, m0=3, mmax=7))
            if r is not None:
                family_dt[row] = r[0]
                extra[f"{row}_path_steps_per_sec"] = round(
                    N_PATHS * N_STEPS / r[0], 1)
                extra[f"{row}_rel_spread"] = round(r[1], 4)
                extra[f"{row}_reps"] = r[2]
    # Terminal-draw + rates rows: adaptive 3-7 reps like the family
    # rows (round-5 follow-through on VERDICT r04 item 6 — rainbow
    # swung 10.8->9.0e9 between rounds with no recorded spread to
    # read the delta against).
    for name, fn, key_name in (
            ("rainbow", rainbow_kernel_seconds, "rainbow4_paths_per_sec"),
            ("fx", fx_kernel_seconds, "fx_paths_per_sec"),
            ("hw_swaption", hw_swaption_kernel_seconds,
             "hw_swaption_paths_per_sec"),
            ("g2_swaption", g2_swaption_kernel_seconds,
             "g2_swaption_paths_per_sec")):
        r = guard(name, lambda f=fn: median_until(f, target=0.10,
                                                  m0=3, mmax=7))
        if r is not None:
            extra[key_name] = round(N_PATHS / r[0], 1)
            extra[key_name.replace("_paths_per_sec", "_rel_spread")] = \
                round(r[1], 4)
            extra[key_name.replace("_paths_per_sec", "_reps")] = r[2]
    q = guard("qmc", lambda: median_until(lambda: qmc_kernel_seconds()[0],
                                          target=0.10, m0=3, mmax=7))
    if q is not None:
        from mc_tpu.qmc import prev_prime
        extra["qmc_paths_per_sec"] = round(prev_prime(1 << 20) / q[0], 1)
        extra["qmc_rel_spread"] = round(q[1], 4)
        extra["qmc_reps"] = q[2]
    # Fused-engine twins (round 4): classic vs Mosaic vs bitwise-XLA
    # dual on the SAME workload — the Pallas-or-not decision data.
    for name, fn in (
            ("hw_swaption_fused", hw_swaption_fused_kernel_seconds),
            ("g2_swaption_fused", g2_swaption_fused_kernel_seconds),
            ("va_swaption_fused", va_swaption_fused_kernel_seconds)):
        for eng in ("pallas", "xla"):
            dt = guard(f"{name}_{eng}", lambda f=fn, e=eng: f(engine=e))
            if dt is not None:
                extra[f"{name}_{eng}_paths_per_sec"] = round(
                    N_PATHS / dt, 1)

    # Reference demo NMC workload (hello.cu defaults, ~5e11 inner steps).
    nmc = guard("nmc_demo", nmc_demo_seconds)
    if nmc is not None:
        extra["nmc_demo_seconds_device"] = round(nmc[0], 3)
        extra["nmc_demo_inner_path_steps_per_sec"] = round(
            nmc[1] / nmc[0], 1)
    nmc_hw = guard("nmc_demo_hw", lambda: nmc_demo_seconds(rng_source="hw"))
    if nmc_hw is not None:
        extra["nmc_demo_hw_seconds_device"] = round(nmc_hw[0], 3)
        extra["nmc_demo_hw_inner_path_steps_per_sec"] = round(
            nmc_hw[1] / nmc_hw[0], 1)

    # 64-contract book through the batched shared-RNG kernel.
    book = guard("book64", book_kernel_seconds)
    if book is not None:
        extra["book64_path_steps_per_sec"] = round(book[1] / book[0], 1)

    # Roofline: measured primitive ceilings -> peak-fraction estimate,
    # for the bullet step AND every model family (VERDICT r04 item 5 —
    # per-family op models composed from the same measured primitives,
    # so "bates is N steps/s" becomes "bates is at X of its ceiling").
    prim = guard("roofline_primitives", roofline_primitives)
    roof = guard("roofline", lambda: roofline(prim)) if prim else None
    if roof is not None:
        extra["roofline"] = roof
    if prim is not None and family_dt:
        ops_models = _family_op_models()
        fam_roof = {}
        for row, dt in family_dt.items():
            fam = row[:-3] if row.endswith("_hw") else row
            ops = dict(ops_models[fam])
            if row.endswith("_hw"):
                ops["tf"] = 0.0  # hw PRNG replaces the threefry pairs
            t_step = dt / (N_PATHS * N_STEPS)
            r = family_roofline_ns(ops, prim)
            fam_roof[row] = {
                "step_ns": round(t_step * 1e9, 3),
                "serial_roofline_ns": round(r * 1e9, 3),
                "achieved_over_serial_roofline": round(r / t_step, 3),
            }
        extra["family_roofline"] = fam_roof

    # Billion-path end-to-end runs (BASELINE config 5, single chip).
    b_call = guard("e2e_1b_call", lambda: billion_path_run("vanilla_call"))
    if b_call is not None:
        extra["e2e_1b_call"] = b_call
    b_bullet = guard("e2e_1b_bullet",
                     lambda: billion_path_run("bullet_call"))
    if b_bullet is not None:
        extra["e2e_1b_bullet"] = b_bullet

    # Accuracy gate: |price - BS| <= 3 stderr at the same config.
    gate = guard("accuracy_gate", accuracy_gate)
    if gate is not None:
        extra.update(gate)
    else:
        extra["accuracy_ok_3se"] = False

    if errors:
        extra["row_errors"] = errors

    # Headline = best of the two paired-terminal variants (hw PRNG is the
    # reference-curandState analogue; threefry13 the reproducible
    # default) — falls back classic -> 0.0 so the line stays parseable
    # even if the paired kernel rows failed mid-run.
    best_pair = min((x[0] for x in (pair, pair_hw) if x is not None),
                    default=None)
    if best_pair is not None:
        paths_per_sec = N_PATHS / best_pair
        extra["headline_variant"] = (
            "terminal_pair_hw" if pair_hw is not None
            and (pair is None or pair_hw[0] < pair[0]) else "terminal_pair")
    elif classic is not None:
        paths_per_sec = N_PATHS / classic[0]
        extra["headline_fallback"] = "classic_terminal"
    else:
        paths_per_sec = 0.0
        extra["headline_fallback"] = "none-measured"

    print(_scoreboard_line(paths_per_sec, extra))
    # rc contract: a green accuracy gate does NOT excuse an empty
    # scoreboard — "nothing measurable" is a perf regression (rc 1).
    ok = (extra.get("accuracy_ok_3se", False)
          and extra.get("headline_fallback") != "none-measured")
    return 0 if ok else 1


# Keys kept on the driver-captured stdout line, in DROP order (least
# important first — trimmed from the front if the line would exceed the
# cap).  Everything else lives in the full scoreboard file.
_SLIM_KEYS = [
    "localvol_path_steps_per_sec", "vasicek_path_steps_per_sec",
    "sabr_path_steps_per_sec", "qmc_paths_per_sec",
    "book64_path_steps_per_sec",
    "nmc_demo_inner_path_steps_per_sec",
    "merton_hw_path_steps_per_sec", "bates_hw_path_steps_per_sec",
    "heston_hw_path_steps_per_sec",
    "merton_path_steps_per_sec", "bates_path_steps_per_sec",
    "heston_qe_path_steps_per_sec", "heston_path_steps_per_sec",
    "bullet_path_steps_per_sec_hw", "bullet_path_steps_per_sec",
    "classic_terminal_paths_per_sec",
    "terminal_pair_hw_rel_spread", "terminal_pair_hw_paths_per_sec",
    "headline_reps", "headline_rel_spread",
    "terminal_pair_paths_per_sec", "headline_variant",
    "headline_fallback", "accuracy_ok_3se", "backend", "device",
]
_SLIM_LINE_CAP = 1800  # chars; the driver's tail capture is ~2000
_FULL_SCOREBOARD_PATH = "docs/bench_r05_full.json"


def _scoreboard_line(paths_per_sec, extra):
    """One driver-parseable stdout line <= ~1800 chars (VERDICT r04
    item 1 — BENCH_r04's line outgrew the driver's tail capture and the
    headline was lost).  The FULL scoreboard goes to
    docs/bench_r05_full.json; the line carries the headline, the
    accuracy gate, the most important per-row medians, and the pointer."""
    import os
    head = {
        "metric": "paths/sec/chip, 1M-path Euro call",
        "value": round(paths_per_sec, 1),
        "unit": "paths/sec",
        "vs_baseline": round(paths_per_sec / REFERENCE_A100_PATHS_PER_SEC,
                             4),
    }
    full = dict(head)
    full["extra"] = extra
    # Env override so the test suite's contract gates never clobber the
    # round's committed live-chip artifact (they pin it to a tmp path).
    path = os.environ.get("MC_TPU_BENCH_FULL_OUT", _FULL_SCOREBOARD_PATH)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(full, f, indent=1)
            f.write("\n")
    except OSError as e:
        path = f"unwritable: {e!r:.120}"
    slim_extra = {k: extra[k] for k in _SLIM_KEYS if k in extra}
    if "row_errors" in extra:
        slim_extra["row_error_count"] = len(extra["row_errors"])
    fr = extra.get("family_roofline")
    if fr:
        worst = min(fr, key=lambda r:
                    fr[r]["achieved_over_serial_roofline"])
        slim_extra["family_roofline_min"] = {
            worst: fr[worst]["achieved_over_serial_roofline"]}
    slim_extra["full_scoreboard"] = path
    drop = list(_SLIM_KEYS)
    while True:
        head["extra"] = slim_extra
        line = json.dumps(head)
        if len(line) <= _SLIM_LINE_CAP or not drop:
            return line
        slim_extra.pop(drop.pop(0), None)


def main(argv=None):
    """Scoreboard contract (round-4 hardening, VERDICT r03 item 1):

    * stdout is ALWAYS exactly one valid JSON line;
    * no device work happens before the backend is probed in a bounded
      subprocess (2-3 retries), so a down tunnel can never hang or
      traceback the harness;
    * rc 0 = measured + accuracy green;  rc 1 = accuracy/perf regression
      (or nothing measurable);  rc 2 = no chip (JSON carries
      error=tpu-unavailable and the CPU accuracy gate);  rc 3 is reserved
      by the platform watchdog (utils/platform.py).
    """
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", choices=("tpu", "cpu"), default=None,
                    help="pin the backend (default: probe the image "
                         "default — the TPU tunnel — and fall back)")
    ap.add_argument("--probe-timeout", type=float, default=240.0,
                    help="per-attempt bound (s) on the backend probe")
    ap.add_argument("--probe-retries", type=int, default=3)
    args = ap.parse_args(argv)

    from mc_tpu.utils.platform import probe_backend, resolve_platform
    plat = resolve_platform(args.platform)
    if plat == "cpu":
        return _no_chip_result({"ok": False, "error": None,
                                "note": "platform pinned to cpu"},
                               pinned_cpu=True)

    probe = probe_backend(timeout_s=args.probe_timeout,
                          retries=args.probe_retries)
    if not probe["ok"]:
        return _no_chip_result(probe)

    # The parent's own backend init is ALSO bounded: a tunnel that
    # wedges between the successful probe and this process's first
    # device touch must still end in one JSON line (rc 2), never a
    # silent hang.  The watchdog cannot run the CPU accuracy gate (the
    # wedged init holds the process), so the fallback line carries the
    # probe info only.
    import threading
    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(args.probe_timeout * 2):
            print(json.dumps({
                "metric": "paths/sec/chip, 1M-path Euro call",
                "value": 0.0, "unit": "paths/sec", "vs_baseline": 0.0,
                "error": "tpu-unavailable",
                "extra": {"backend_probe": probe,
                          "note": "backend wedged after a successful "
                                  "probe; watchdog fired"},
            }), flush=True)
            import os
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        jax.devices()  # bounded first touch
    finally:
        init_done.set()

    try:
        return _full_bench()
    except Exception:
        # Belt and braces: _full_bench guards every row, but if the
        # scoreboard assembly itself dies the driver still gets JSON.
        print(json.dumps({
            "metric": "paths/sec/chip, 1M-path Euro call",
            "value": 0.0, "unit": "paths/sec", "vs_baseline": 0.0,
            "error": "bench-exception",
            "extra": {"traceback":
                      traceback.format_exc(limit=20)[-2000:]},
        }))
        return 1




# ---------------------------------------------------------------------------
# Roofline microbenchmarks (round 3): measured VPU ceilings for the
# primitives the bullet step is built from, composed into a roofline
# prediction so the achieved throughput has a denominator.  Every
# measurement is the same T(K)-T(1) differential as the kernels above.
# ---------------------------------------------------------------------------

_ROOF_SHAPE = (512, 128)     # one VMEM-resident f32 tile
_ROOF_ITERS = 512            # chained iterations inside one jitted program


def _chain_seconds(body, iters=_ROOF_ITERS, k=8, reps=4):
    """Seconds per chained iteration of ``body(x) -> x`` over a
    (512, 128) f32 tile; serial dependency between iterations, full
    data parallelism within the tile (how real kernels run)."""
    import numpy as np

    @jax.jit
    def multi(seeds):  # fold K chains into one scalar
        def one(s):
            x = jnp.full(_ROOF_SHAPE, 0.5, jnp.float32) + s
            # 4x-unrolled body amortizes the fori_loop overhead that
            # would otherwise make cheap primitives look slow
            x = jax.lax.fori_loop(
                0, iters, lambda i, x: body(body(body(body(x)))), x)
            return jnp.sum(x)
        return jnp.sum(jax.lax.map(one, seeds))

    def best_of(kk):
        seeds = jnp.arange(kk, dtype=jnp.float32) * 1e-6
        float(multi(seeds))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(multi(seeds))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(1)
    while True:
        dt = max((best_of(k) - t1) / (k - 1), 1e-12)
        if dt * (k - 1) > _MIN_SIGNAL_S or k >= _MAX_CHAIN:
            return dt / (4 * iters)
        k *= 4


def roofline_primitives():
    """Measured per-element seconds of the VPU primitives every step
    kernel is composed from — the shared numerator of the bullet AND
    model-family rooflines.  Serialized (dependent-chain) rates, so the
    composed rooflines are conservative throughput bounds."""
    from mc_tpu import rng as mc_rng
    n_elems = _ROOF_SHAPE[0] * _ROOF_SHAPE[1]

    def med(body):  # tunnel noise: median of 3 full chain measurements
        return median_of(lambda: _chain_seconds(body), 3)[0] / n_elems

    t_fma = med(lambda x: x * 1.000001 + 1e-7)

    t_exp = med(lambda x: jnp.exp(x) * 0.367879 + 1e-7)  # keep x ~ 1

    t_sqrt = med(lambda x: jnp.sqrt(x) * 0.7071 + 0.25)  # fixed point ~ .95

    t_log = med(lambda x: jnp.log(x + 2.0))  # fixed point x* ~ 1.146

    # Box-Muller pair core: both normals from two uniforms-in-(0,1)
    def bm(x):
        u1 = x * 0.5 + 0.25
        u2 = x * 0.25 + 0.125
        rad = jnp.sqrt(-2.0 * jnp.log(u1))
        ang = jnp.float32(2.0 * 3.14159265) * u2
        z0 = rad * jnp.cos(ang)
        z1 = rad * jnp.sin(ang)
        return z0 * 1e-7 + z1 * 1e-7 + 0.5
    t_bm_pair = med(bm)

    # threefry13 pair: serialized by feeding bits back into the counter
    def tf(x):
        c = jax.lax.bitcast_convert_type(x, jnp.uint32)
        b0, b1 = mc_rng.threefry2x32(jnp.uint32(0x1234), jnp.uint32(0x5678),
                                     c, c, rounds=13)
        y = jax.lax.bitcast_convert_type(
            (b0 >> jnp.uint32(9)) | jnp.uint32(0x3F800000), jnp.float32)
        return y  # in [1, 2): keeps the chain numerically stable
    t_tf_pair = med(tf)

    return {"fma": t_fma, "exp": t_exp, "sqrt": t_sqrt, "log": t_log,
            "bm_pair": t_bm_pair, "tf_pair": t_tf_pair}


# Per-path-step op counts of every fused family kernel (VERDICT r04
# item 5), read off the single scheme definitions the kernels trace:
#   heston   models/heston.py   heston_euler_step + s=s0*exp(w) carry
#   heston_qe               heston_qe_step (martingale-corrected)
#   merton   models/merton.py  _merton_leg (3 tf per step PAIR, Poisson
#                              inverse-CDF scan of depth kmax)
#   bates    models/bates.py   _bates_euler_leg = heston substep + jump
#   sabr     models/sabr.py    sabr_step (2 exp; terminal exp amortized)
#   vasicek  models/vasicek.py _vasicek_leg (3 pairs per step PAIR,
#                              9-fma Cholesky apply + exp)
#   localvol models/localvol.py _localvol_leg (1 pair per step PAIR,
#                              (K-1)-ramp sigma lookup ~ 3 ops each)
# `fma` buckets every add/mul/fma/cmp/select at t_fma.  kmax entries are
# per-step Poisson-scan depth at the bench config (lam*T/N_STEPS).
_POISSON_OPS_PER_K = 4.0  # pdf recurrence + cdf add + cmp + select


def _family_op_models():
    from mc_tpu.models.bates import DEMO_BATES
    from mc_tpu.models.merton import DEMO_MERTON, poisson_kmax
    k_mer = poisson_kmax(float(DEMO_MERTON.lam) * 1.0 / N_STEPS)
    k_bat = poisson_kmax(float(DEMO_BATES.lam) * 1.0 / N_STEPS)
    return {
        "bullet": dict(tf=0.5, bm=0.5, exp=1, sqrt=0, log=0, fma=4),
        "heston": dict(tf=1, bm=1, exp=1, sqrt=1, log=0, fma=13),
        "heston_qe": dict(tf=1.5, bm=1, exp=1, sqrt=3, log=4, fma=35),
        "merton": dict(tf=1.5, bm=1, exp=1, sqrt=1, log=0,
                       fma=6 + _POISSON_OPS_PER_K * k_mer),
        "bates": dict(tf=3, bm=2, exp=1, sqrt=2, log=0,
                      fma=16 + _POISSON_OPS_PER_K * k_bat),
        "sabr": dict(tf=1, bm=1, exp=2, sqrt=0, log=0, fma=10),
        "vasicek": dict(tf=1.5, bm=1.5, exp=1, sqrt=0, log=0, fma=12),
        "localvol": dict(tf=0.5, bm=0.5, exp=1, sqrt=0, log=0,
                         fma=5 + 3 * 8),  # n_knots=9 -> 8 ramps
    }


def family_roofline_ns(ops, prim):
    """Serial-roofline seconds/step of one family from measured
    primitive times (conservative: serialized rates, see roofline)."""
    return (ops["tf"] * prim["tf_pair"] + ops["bm"] * prim["bm_pair"]
            + ops["exp"] * prim["exp"] + ops["sqrt"] * prim["sqrt"]
            + ops["log"] * prim["log"] + ops["fma"] * prim["fma"])


def roofline(prim=None):
    """Measured per-element primitive times + the bullet-step roofline.

    Per path-step the euler bullet kernel costs (pair-amortized):
    1/2 threefry13 pair + 1/2 Box-Muller pair (log, sqrt, cos+sin on two
    uniforms) + 1 exp + ~4 fma/cmp ops.
    """
    if prim is None:
        prim = roofline_primitives()

    # measured bullet step time (threefry13 default config)
    dt_bullet = kernel_seconds("bullet_call", "euler")
    t_step = dt_bullet / (N_PATHS * N_STEPS)

    # The composed roofline uses SERIALIZED primitive rates, so it is a
    # conservative (lower) throughput bound: achieved/serial > 1 measures
    # how much multi-issue ILP the fused kernel extracts beyond what the
    # dependent-chain microbenches can.  >= 1 here means the kernel is at
    # the practical VPU ceiling and remaining headroom is OP COUNT (e.g.
    # cheaper RNG), not scheduling — see BASELINE.md "Roofline".
    roof = family_roofline_ns(_family_op_models()["bullet"], prim)
    return {
        "fma_gops": round(1e-9 / prim["fma"], 1),
        "exp_gops": round(1e-9 / prim["exp"], 1),
        "sqrt_gops": round(1e-9 / prim["sqrt"], 1),
        "log_gops": round(1e-9 / prim["log"], 1),
        "boxmuller_pairs_gps": round(1e-9 / prim["bm_pair"], 2),
        "threefry13_pairs_gps": round(1e-9 / prim["tf_pair"], 2),
        "bullet_step_ns": round(t_step * 1e9, 4),
        "serial_roofline_step_ns": round(roof * 1e9, 4),
        "achieved_over_serial_roofline": round(roof / t_step, 3),
    }

if __name__ == "__main__":
    sys.exit(main())  # rc: 0 ok / 1 regression / 2 no chip / 3 watchdog
