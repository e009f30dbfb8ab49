"""Compiled-Mosaic parity gate: every Pallas kernel family on the real chip.

The framework's load-bearing correctness claim (mc_tpu/rng.py) is that the
compiled Mosaic kernel, the Pallas interpreter, and the plain-XLA dual of
each engine produce BITWISE-identical results (same threefry streams, same
(8,128) fold + Kahan summation order).  The main test suite proves
interpret == XLA on the CPU mesh; this suite closes the remaining gap —
compiled == interpret == XLA on the TPU device itself — for every kernel
family, so a Mosaic lowering regression cannot pass CI silently.

This is the TPU analogue of the reference's shared-random-array CPU<->GPU
fixture (/root/reference/inc/testing.cuh:17-42): one stream of randomness,
multiple independent execution paths, exact agreement required.

Workloads are deliberately tiny (the value is the compile + bitwise check,
not the statistics); each distinct case still pays a real Mosaic compile
(~20-40 s cold) so the matrix is one representative config per family.
"""

import numpy as np
import pytest

from mc_tpu import OptionParams, SimParams

OPT = OptionParams(p1=1.0, p2=6.0)   # live bullet window at 8 steps
SIM = SimParams(n_paths=8192, n_steps=8)


def _tri(fn, **kw):
    """(compiled, interpreted, xla-dual) of one pricing call."""
    c = fn(engine="pallas", interpret=False, **kw)
    i = fn(engine="pallas", interpret=True, **kw)
    x = fn(engine="xla", **kw)
    return c, i, x


def _assert_tri(c, i, x):
    pc, pi, px = (np.asarray(r.price) for r in (c, i, x))
    sc, si, sx = (np.asarray(r.stderr) for r in (c, i, x))
    np.testing.assert_array_equal(pc, pi, err_msg="compiled != interpret")
    np.testing.assert_array_equal(pc, px, err_msg="compiled != xla dual")
    np.testing.assert_array_equal(sc, si, err_msg="stderr c != i")
    np.testing.assert_array_equal(sc, sx, err_msg="stderr c != x")
    assert np.all(np.asarray(sc) > 0)


# --- core path-kernel family (trajectories.cuh:54-271 analogues) ---------

def test_terminal_vanilla():
    from mc_tpu import price
    _assert_tri(*_tri(price, option=OPT, sim=SIM, payoff="vanilla_call",
                      method="terminal", tile_rows=8))


def test_euler_bullet():
    from mc_tpu import price
    _assert_tri(*_tri(price, option=OPT, sim=SIM, payoff="bullet_call",
                      method="euler", tile_rows=8))


def test_euler_bullet_threefry13():
    from mc_tpu import price
    _assert_tri(*_tri(price, option=OPT, sim=SIM, payoff="bullet_call",
                      method="euler", tile_rows=8, rng_source="threefry13"))


def test_antithetic():
    from mc_tpu import price
    _assert_tri(*_tri(price, option=OPT, sim=SIM, payoff="asian_call",
                      method="euler", tile_rows=8, antithetic=True))


def test_cliquet_payoff():
    """3-state payoff (count, reset ref, acc) with modular resets."""
    from mc_tpu import price
    _assert_tri(*_tri(price, option=OptionParams(k=2.0, p1=-0.02, p2=0.04),
                      sim=SIM, payoff="cliquet", method="euler",
                      tile_rows=8))


def test_barrier_bridge_payoff():
    """Bridge-corrected knock-out (2-state payoff, log/exp in update)."""
    from mc_tpu import price
    _assert_tri(*_tri(price, option=OptionParams(barrier=120.0), sim=SIM,
                      payoff="up_out_call_bb", method="euler", tile_rows=8))


def test_control_variate():
    from mc_tpu import price
    _assert_tri(*_tri(price, option=OPT, sim=SIM, payoff="vanilla_call",
                      method="euler", tile_rows=8, control_variate=True))


def test_importance_shift():
    from mc_tpu import price
    _assert_tri(*_tri(price, option=OptionParams(k=150.0), sim=SIM,
                      payoff="vanilla_call", method="terminal", tile_rows=8,
                      importance_shift=1.0))


def test_ladder():
    from mc_tpu import price_ladder
    strikes = (90.0, 100.0, 110.0)
    _assert_tri(*_tri(lambda **kw: price_ladder(strikes, **kw),
                      option=OPT, sim=SIM, payoff="vanilla_call",
                      method="euler", tile_rows=8))


def test_trajectories_grids():
    """Materialized state grids (trajectories.cuh:273-351 analogue) —
    compiled vs interpret only (the grid writer has no XLA dual)."""
    from mc_tpu import simulate_trajectories
    c = simulate_trajectories(OPT, SIM, "bullet_call", tile_rows=8,
                              interpret=False)
    i = simulate_trajectories(OPT, SIM, "bullet_call", tile_rows=8,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(c.s), np.asarray(i.s))
    np.testing.assert_array_equal(np.asarray(c.state), np.asarray(i.state))
    np.testing.assert_array_equal(np.asarray(c.pay_sum),
                                  np.asarray(i.pay_sum))


# --- nested MC family (nmc.cuh analogues) --------------------------------

@pytest.mark.parametrize("strategy", ["fused", "grid"])
def test_nmc(strategy):
    from mc_tpu.nmc import price_nmc
    sim = SimParams(n_paths=2048, n_steps=4, n_paths_inner=8)
    c, i, x = _tri(price_nmc, option=OPT, sim=sim, payoff="bullet_call",
                   strategy=strategy, tile_rows=8)
    _assert_tri(c.outer, i.outer, x.outer)
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(i.surface))
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(x.surface))


# --- QMC family ----------------------------------------------------------

def test_qmc_lattice():
    from mc_tpu.qmc import price_qmc
    sim = SimParams(n_paths=2053, n_steps=8)
    _assert_tri(*_tri(price_qmc, sim=sim, method="euler", n_shifts=4,
                      tile_rows=8))


def test_qmc_bridge():
    from mc_tpu.qmc import price_qmc
    sim = SimParams(n_paths=2053, n_steps=8)
    _assert_tri(*_tri(price_qmc, sim=sim, method="euler", n_shifts=4,
                      tile_rows=8, bridge=True))


# --- model families ------------------------------------------------------

def test_heston():
    from mc_tpu.models.heston import price_heston
    _assert_tri(*_tri(price_heston, option=OPT, sim=SIM, tile_rows=8))


def test_heston_qe():
    from mc_tpu.models.heston import price_heston
    _assert_tri(*_tri(price_heston, option=OPT, sim=SIM, tile_rows=8,
                      scheme="qe"))


def test_bates():
    """SVJ: Heston substep + branch-free Poisson inverse CDF jumps."""
    from mc_tpu.models.bates import price_bates
    _assert_tri(*_tri(price_bates, option=OPT, sim=SIM, tile_rows=8))


def test_bates_qe():
    from mc_tpu.models.bates import price_bates
    _assert_tri(*_tri(price_bates, option=OPT, sim=SIM, tile_rows=8,
                      scheme="qe"))


def test_cev():
    from mc_tpu.models.cev import price_cev
    _assert_tri(*_tri(price_cev, option=OPT, sim=SIM, tile_rows=8))


def test_basket():
    from mc_tpu.models.basket import price_basket
    _assert_tri(*_tri(price_basket, option=OPT, sim=SIM, tile_rows=8))


def test_merton():
    from mc_tpu.models.merton import price_merton
    _assert_tri(*_tri(price_merton, option=OPT, sim=SIM, tile_rows=8))


def test_sabr():
    from mc_tpu.models.sabr import price_sabr
    _assert_tri(*_tri(price_sabr, option=OPT, sim=SIM, tile_rows=8))


def test_rainbow():
    """Two-asset call-on-max: correlated terminal draws + max fold."""
    from mc_tpu.models.rainbow import price_rainbow
    _assert_tri(*_tri(price_rainbow, option=OPT, sim=SIM,
                      payoff="call_on_max", tile_rows=8))


def test_term_structure():
    """Per-step curve lookups: dynamic SMEM scalar loads in the loop."""
    from mc_tpu.models.term import TermStructure, price_term
    term = TermStructure.from_knots([0.10, 0.05], [0.15, 0.30],
                                    SIM.n_steps)
    _assert_tri(*_tri(price_term, option=OPT, term=term, sim=SIM,
                      tile_rows=8))


def test_localvol():
    """Clamped-ramp surface interpolation inside the step loop."""
    from mc_tpu.models.localvol import LocalVolSurface, price_localvol
    surf = LocalVolSurface.demo(SIM.n_steps)
    _assert_tri(*_tri(price_localvol, option=OPT, surf=surf, sim=SIM,
                      tile_rows=8))


def test_vasicek():
    """Stochastic rates: exact OU triple + pathwise discount."""
    from mc_tpu.models.vasicek import price_vasicek
    _assert_tri(*_tri(price_vasicek, option=OPT, sim=SIM,
                      payoff="vanilla_call", tile_rows=8))


def test_localvol_american_compiled_vs_interpret():
    """Local-vol trajectory kernel + S-basis LSMC on the real chip."""
    from mc_tpu.lsmc import price_american_localvol
    from mc_tpu.models.localvol import LocalVolSurface
    sim = SimParams(n_paths=4096, n_steps=8)
    surf = LocalVolSurface.from_function(
        lambda x, t: 0.2 + 0.1 * x * x, 8)
    c = price_american_localvol(surf=surf, sim=sim, interpret=False)
    i = price_american_localvol(surf=surf, sim=sim, interpret=True)
    np.testing.assert_array_equal(np.asarray(c.price), np.asarray(i.price))
    np.testing.assert_array_equal(np.asarray(c.stderr),
                                  np.asarray(i.stderr))


def test_vasicek_american_compiled_vs_interpret():
    """Vasicek trajectory kernel + (S, r)-basis LSMC with pathwise
    discounting on the real chip."""
    from mc_tpu.lsmc import price_american_vasicek
    sim = SimParams(n_paths=4096, n_steps=8)
    c = price_american_vasicek(sim=sim, interpret=False)
    i = price_american_vasicek(sim=sim, interpret=True)
    np.testing.assert_array_equal(np.asarray(c.price), np.asarray(i.price))
    np.testing.assert_array_equal(np.asarray(c.stderr),
                                  np.asarray(i.stderr))


def test_nmc_localvol():
    """Smile NMC: surface lookups in both outer and inner kernels."""
    from mc_tpu.models.localvol import LocalVolSurface
    from mc_tpu.nmc_localvol import price_nmc_localvol
    sim = SimParams(n_paths=2048, n_steps=4, n_paths_inner=8)
    surf = LocalVolSurface.demo(4)
    c, i, x = _tri(price_nmc_localvol, surf=surf, sim=sim, tile_rows=8)
    _assert_tri(c.outer, i.outer, x.outer)
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(i.surface))
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(x.surface))


def test_nmc_vasicek():
    """Stochastic-discounting NMC: (S, x, y, state) grids + inner legs."""
    from mc_tpu.nmc_vasicek import price_nmc_vasicek
    sim = SimParams(n_paths=2048, n_steps=4, n_paths_inner=8)
    c, i, x = _tri(price_nmc_vasicek, sim=sim, tile_rows=8)
    _assert_tri(c.outer, i.outer, x.outer)
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(i.surface))
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(x.surface))


# --- LSMC (pallas trajectory backend; no full XLA dual) ------------------

def test_lsmc_compiled_vs_interpret():
    from mc_tpu.lsmc import price_american
    sim = SimParams(n_paths=8192, n_steps=8)
    c = price_american(sim=sim, tile_rows=8, interpret=False)
    i = price_american(sim=sim, tile_rows=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(c.price), np.asarray(i.price))
    np.testing.assert_array_equal(np.asarray(c.stderr),
                                  np.asarray(i.stderr))


def test_portfolio_book_kernel():
    """Batched-book kernel: one launch, per-contract bitwise equality."""
    from mc_tpu import OptionParams as OP
    from mc_tpu.engines import price_portfolio
    book = OP(s0=np.array([100.0, 95.0, 110.0, 100.0], np.float32),
              k=np.array([100.0, 100.0, 105.0, 90.0], np.float32),
              sigma=np.array([0.2, 0.3, 0.15, 0.25], np.float32),
              p1=np.full(4, 1.0, np.float32),
              p2=np.full(4, 6.0, np.float32))
    kw = dict(payoff="bullet_call", method="euler", tile_rows=8)
    c = price_portfolio(book, SIM, engine="pallas", **kw)
    x = price_portfolio(book, SIM, engine="xla", **kw)
    np.testing.assert_array_equal(np.asarray(c.price), np.asarray(x.price))
    np.testing.assert_array_equal(np.asarray(c.stderr),
                                  np.asarray(x.stderr))


def test_heston_american_compiled_vs_interpret():
    """Heston trajectory kernel + (S,v)-basis LSMC on the real chip."""
    from mc_tpu.lsmc import price_american_heston
    sim = SimParams(n_paths=8192, n_steps=8)
    c = price_american_heston(sim=sim, tile_rows=8, interpret=False)
    i = price_american_heston(sim=sim, tile_rows=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(c.price), np.asarray(i.price))
    np.testing.assert_array_equal(np.asarray(c.stderr),
                                  np.asarray(i.stderr))


def test_qmc_sobol():
    from mc_tpu.qmc import price_qmc
    sim = SimParams(n_paths=2048, n_steps=8)
    _assert_tri(*_tri(price_qmc, sim=sim, method="euler", n_shifts=4,
                      tile_rows=8, family="sobol"))


def test_qmc_sobol_bridge():
    from mc_tpu.qmc import price_qmc
    sim = SimParams(n_paths=2048, n_steps=8)
    _assert_tri(*_tri(price_qmc, sim=sim, method="euler", n_shifts=4,
                      tile_rows=8, family="sobol", bridge=True))


def test_nmc_heston():
    from mc_tpu.nmc_heston import price_nmc_heston
    sim = SimParams(n_paths=2048, n_steps=4, n_paths_inner=8)
    c, i, x = _tri(price_nmc_heston, sim=sim, tile_rows=8)
    _assert_tri(c.outer, i.outer, x.outer)
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(i.surface))
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(x.surface))


def test_pathwise_greek_kernel():
    """Fused pathwise-greek kernel: compiled == interpret (the interpret
    flag is a jit-static arg of the impl, so both really run)."""
    import jax.numpy as jnp

    from mc_tpu import rng
    from mc_tpu.greeks import _pathwise_kernel_moments
    from mc_tpu.ops.payoffs import get_payoff
    sim = SimParams(n_paths=8192, n_steps=8)
    po = get_payoff("asian_call")
    key = jnp.asarray(rng.derive_key(sim.seed, 0), jnp.uint32)
    c = _pathwise_kernel_moments(OptionParams().as_f32(), po,
                                 sim.replace(seed=0), "euler", 8, False,
                                 key)
    i = _pathwise_kernel_moments(OptionParams().as_f32(), po,
                                 sim.replace(seed=0), "euler", 8, True,
                                 key)
    for name in ("price", "delta", "vega", "rho", "epsilon"):
        np.testing.assert_array_equal(np.asarray(c[name].price),
                                      np.asarray(i[name].price),
                                      err_msg=name)


def test_nmc_merton():
    from mc_tpu.nmc_merton import price_nmc_merton
    sim = SimParams(n_paths=2048, n_steps=4, n_paths_inner=8)
    c, i, x = _tri(price_nmc_merton, sim=sim, tile_rows=8)
    _assert_tri(c.outer, i.outer, x.outer)
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(i.surface))
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(x.surface))


def test_merton_american_compiled_vs_interpret():
    """Merton trajectory kernel + LSMC on the real chip."""
    from mc_tpu.lsmc import price_american_merton
    sim = SimParams(n_paths=8192, n_steps=8)
    c = price_american_merton(sim=sim, tile_rows=8, interpret=False)
    i = price_american_merton(sim=sim, tile_rows=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(c.price), np.asarray(i.price))
    np.testing.assert_array_equal(np.asarray(c.stderr),
                                  np.asarray(i.stderr))


def test_basket_american_compiled_vs_interpret():
    from mc_tpu.lsmc import price_american_basket
    sim = SimParams(n_paths=8192, n_steps=8)
    c = price_american_basket(sim=sim, tile_rows=8, interpret=False)
    i = price_american_basket(sim=sim, tile_rows=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(c.price), np.asarray(i.price))


def test_nmc_cev():
    """Generic-engine new family (CEV): XLA-materialized grids feeding
    the compiled Pallas inner kernel, all three routes bitwise."""
    from mc_tpu.nmc_cev import price_nmc_cev
    sim = SimParams(n_paths=2048, n_steps=4, n_paths_inner=8)
    c, i, x = _tri(price_nmc_cev, sim=sim, tile_rows=8)
    _assert_tri(c.outer, i.outer, x.outer)
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(i.surface))
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(x.surface))


def test_nmc_basket():
    """Multi-asset NMC: d per-asset grids feeding the compiled Pallas
    inner kernel (Cholesky mixing in-register), all routes bitwise."""
    from mc_tpu.nmc_basket import price_nmc_basket
    sim = SimParams(n_paths=2048, n_steps=4, n_paths_inner=8)
    c, i, x = _tri(price_nmc_basket, sim=sim, tile_rows=8)
    _assert_tri(c.outer, i.outer, x.outer)
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(i.surface))
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(x.surface))


def test_qmc_heston():
    """Model-family QMC: Sobol points driving the Heston leg in the
    compiled kernel, all three routes bitwise."""
    from mc_tpu.qmc import price_qmc_model
    sim = SimParams(n_paths=1 << 12, n_steps=8)

    def fn(engine, interpret=None, **kw):
        return price_qmc_model("heston", sim=sim, n_shifts=4,
                               engine=engine, interpret=interpret,
                               tile_rows=8)

    _assert_tri(*_tri(fn))


def test_nmc_sabr():
    """SABR NMC on the generic engine: (F, sigma) grids + compiled
    Pallas inner legs, all routes bitwise."""
    from mc_tpu.nmc_sabr import price_nmc_sabr
    sim = SimParams(n_paths=2048, n_steps=4, n_paths_inner=8)
    c, i, x = _tri(price_nmc_sabr, sim=sim, tile_rows=8)
    _assert_tri(c.outer, i.outer, x.outer)
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(i.surface))
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(x.surface))


def test_divs():
    """Discrete-cash-dividend kernel: per-step SMEM amounts, all three
    routes bitwise."""
    from mc_tpu.models.dividends import div_schedule, price_divs
    sim = SimParams(n_paths=4096, n_steps=10)
    divs = div_schedule(10, [4], [5.0])
    _assert_tri(*_tri(price_divs, divs=divs, sim=sim, tile_rows=8))


def test_terminal_pair():
    """Paired terminal kernel (both Box-Muller halves -> two paths per
    element): all three routes bitwise."""
    from mc_tpu import price
    sim = SimParams(n_paths=100_000, n_steps=10)
    _assert_tri(*_tri(price, option=OPT, sim=sim,
                      method="terminal_pair", tile_rows=8))


def test_terminal_pair_hw():
    """Hardware-PRNG paired terminal kernel (reference-curandState
    analogue, trajectories.cuh:74-75): no XLA dual exists, so the gate
    is statistical — 3.5 sigma against the exact BS oracle plus
    cross-agreement with the threefry run."""
    from mc_tpu import price
    from mc_tpu.oracle import bs_call
    sim = SimParams(n_paths=1 << 20, n_steps=10)
    opt = OptionParams()
    hw = price(option=opt, sim=sim, method="terminal_pair",
               rng_source="hw", interpret=False)
    bs = float(bs_call(opt.s0, opt.k, opt.t, opt.r, opt.sigma, opt.q))
    assert abs(float(hw.price) - bs) <= 3.5 * float(hw.stderr)
    tf = price(option=opt, sim=sim, method="terminal_pair",
               interpret=False)
    assert abs(float(hw.price) - float(tf.price)) <= 3.5 * (
        float(hw.stderr) ** 2 + float(tf.stderr) ** 2) ** 0.5


def test_qmc_merton():
    """Jump-diffusion QMC: Poisson counts from RAW point coordinates
    (draw_pair.unit) inside the compiled kernel, all three routes
    bitwise."""
    from mc_tpu.qmc import price_qmc_model
    sim = SimParams(n_paths=1 << 12, n_steps=8)

    def fn(engine, interpret=None, **kw):
        return price_qmc_model("merton", sim=sim, n_shifts=4,
                               engine=engine, interpret=interpret,
                               tile_rows=8)

    _assert_tri(*_tri(fn))


def test_nmc_family_fused():
    """Fused-strategy family NMC (outer physics + inner sweep in ONE
    kernel, history in VMEM scratch): compiled == interpret == the grid
    strategy bitwise on the real chip (heston: 2 market grids + asian
    payoff state riding the cv slab)."""
    from mc_tpu.nmc_heston import price_nmc_heston
    sim = SimParams(n_paths=2048, n_steps=4, n_paths_inner=8)
    kw = dict(sim=sim, payoff="asian_call", tile_rows=8)
    c = price_nmc_heston(strategy="fused", interpret=False, **kw)
    i = price_nmc_heston(strategy="fused", interpret=True, **kw)
    g = price_nmc_heston(strategy="grid", interpret=False, **kw)
    _assert_tri(c.outer, i.outer, g.outer)
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(i.surface))
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(g.surface))


def test_nmc_term():
    """Term-structure NMC: curve lookups in the compiled inner legs,
    all three routes bitwise."""
    from mc_tpu.models.term import TermStructure
    from mc_tpu.nmc_term import price_nmc_term
    sim = SimParams(n_paths=2048, n_steps=4, n_paths_inner=8)
    dyn = TermStructure.from_knots([0.10, 0.05], [0.15, 0.30], 4)
    c, i, x = _tri(price_nmc_term, dyn=dyn, sim=sim, tile_rows=8)
    _assert_tri(c.outer, i.outer, x.outer)
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(i.surface))
    np.testing.assert_array_equal(np.asarray(c.surface),
                                  np.asarray(x.surface))


@pytest.mark.parametrize("strategy", ["fused", "grid"])
def test_nmc_hw_inner(strategy):
    """Hardware-PRNG inner sweep (opt-in): no XLA dual exists, so the
    gates are (a) the outer estimate is BITWISE the threefry run's (the
    outer phase never switches), (b) the surface agrees statistically
    (per-point inner stderr ~ sigma/sqrt(n_inner))."""
    from mc_tpu.nmc import price_nmc
    sim = SimParams(n_paths=2048, n_steps=8, n_paths_inner=256)
    base = price_nmc(OPT, sim, "vanilla_call", strategy=strategy,
                     tile_rows=8, interpret=False)
    hw = price_nmc(OPT, sim, "vanilla_call", strategy=strategy,
                   tile_rows=8, interpret=False, rng_source="hw")
    assert float(hw.outer.price) == float(base.outer.price)
    rel = abs(float(hw.surface_mean) - float(base.surface_mean)) \
        / float(base.surface_mean)
    assert rel < 0.02, rel


def test_fx_quanto_compo():
    """Cross-currency exact-terminal kernel (models/fx): compiled
    Mosaic == interpret == XLA dual, two contract shapes."""
    from mc_tpu.models.fx import FXDynamics, price_fx
    fx = FXDynamics(x0=1.2, sigma_x=0.15, r_f=0.03, rho=-0.35)

    def fn(contract):
        def call(engine, interpret=None, **kw):
            return price_fx(OPT, fx, SIM, contract, engine=engine,
                            interpret=interpret, tile_rows=8, **kw)
        return call

    for contract in ("quanto_call", "compo_put"):
        f = fn(contract)
        _assert_tri(f(engine="pallas", interpret=False),
                    f(engine="pallas", interpret=True),
                    f(engine="xla"))


# --- model-family hardware-PRNG variants (round 5) -------------------------
# VERDICT r04 item 4: the hw-PRNG op-count lever plumbed through every
# model-family kernel.  No XLA dual exists for the stateful stream, so
# each gate is statistical: 3.5 sigma against the family's own threefry
# run (same workload, independent randomness), plus the analytic oracle
# where one exists.  The stream is opt-in and NOT tiling-invariant,
# like the bullet/terminal-pair hw variants.

def _hw_vs_threefry(price_fn, **kw):
    hw = price_fn(rng_source="hw", interpret=False, **kw)
    tf = price_fn(interpret=False, **kw)
    joint = (float(hw.stderr) ** 2 + float(tf.stderr) ** 2) ** 0.5
    assert float(hw.stderr) > 0.0
    assert abs(float(hw.price) - float(tf.price)) <= 3.5 * joint, (
        float(hw.price), float(tf.price), joint)
    return hw


def test_heston_hw_rng():
    from mc_tpu.models.heston import DEMO_HESTON, heston_call_cf, \
        price_heston
    sim = SimParams(n_paths=1 << 19, n_steps=16)
    hw = _hw_vs_threefry(price_heston, sim=sim)
    d = DEMO_HESTON
    ref = float(heston_call_cf(100.0, 100.0, 1.0, 0.1, d.v0, d.kappa,
                               d.theta, d.xi, d.rho))
    # Euler bias at 16 steps + MC noise
    assert abs(float(hw.price) - ref) <= 4.0 * float(hw.stderr) + 0.02 * ref


def test_heston_qe_hw_rng():
    """QE scheme draws its branch uniform from the hw stream too."""
    from mc_tpu.models.heston import price_heston
    sim = SimParams(n_paths=1 << 18, n_steps=16)
    _hw_vs_threefry(price_heston, sim=sim, scheme="qe")


def test_bates_hw_rng():
    from mc_tpu.models.bates import price_bates
    sim = SimParams(n_paths=1 << 18, n_steps=16)
    _hw_vs_threefry(price_bates, sim=sim)


def test_merton_hw_rng():
    from mc_tpu.models.merton import DEMO_MERTON, \
        merton_call_closed_form, price_merton
    sim = SimParams(n_paths=1 << 19, n_steps=16)
    hw = _hw_vs_threefry(price_merton, sim=sim)
    ref = merton_call_closed_form(100.0, 100.0, 1.0, 0.1, 0.2, lam=0.3,
                                  mu_j=-0.10, sigma_j=0.15)
    assert abs(float(hw.price) - ref) <= 4.0 * float(hw.stderr)


def test_sabr_hw_rng():
    from mc_tpu.models.sabr import price_sabr
    sim = SimParams(n_paths=1 << 18, n_steps=16)
    _hw_vs_threefry(price_sabr, sim=sim)


def test_localvol_hw_rng():
    from mc_tpu import OptionParams
    from mc_tpu.models.localvol import LocalVolSurface, price_localvol
    sim = SimParams(n_paths=1 << 18, n_steps=16)
    _hw_vs_threefry(price_localvol, option=OptionParams(),
                    surf=LocalVolSurface.flat(0.2, sim.n_steps), sim=sim)


def test_vasicek_hw_rng():
    from mc_tpu.models.vasicek import price_vasicek
    sim = SimParams(n_paths=1 << 18, n_steps=16)
    _hw_vs_threefry(price_vasicek, sim=sim)


def test_rainbow_hw_rng():
    from mc_tpu.models.rainbow import price_rainbow
    sim = SimParams(n_paths=1 << 19, n_steps=1)
    _hw_vs_threefry(price_rainbow, sim=sim)
    # d=4 demo basket has no closed form; the threefry cross-gate above
    # is the correctness check (plus the guard tests on CPU)


def test_fx_hw_rng():
    from mc_tpu import oracle
    from mc_tpu.models.fx import DEMO_FX, price_fx
    sim = SimParams(n_paths=1 << 19, n_steps=1)
    hw = _hw_vs_threefry(price_fx, sim=sim)
    fx = DEMO_FX
    ref = float(oracle.quanto_call(100.0, 100.0, 1.0, 0.1,
                                   float(fx.r_f), 0.2,
                                   float(fx.sigma_x), float(fx.rho),
                                   0.0, float(fx.x0)))
    assert abs(float(hw.price) - ref) <= 4.0 * float(hw.stderr)
