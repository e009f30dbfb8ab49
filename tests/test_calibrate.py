"""SABR smile calibration: jnp Hagan parity, round trips, MC loop."""

import math

import numpy as np
import pytest

from mc_tpu.calibrate import calibrate_sabr, hagan_iv
from mc_tpu.models.sabr import sabr_implied_vol

F, T = 100.0 * math.exp(0.1), 1.0
STRIKES = np.array([70.0, 85.0, 100.0, 115.0, 130.0, 150.0], np.float32)


def test_jnp_hagan_matches_host_oracle():
    for beta in (1.0, 0.7):
        for k in STRIKES:
            a = float(hagan_iv(F, k, T, 0.25, beta, 0.5, -0.3))
            b = sabr_implied_vol(F, float(k), T, 0.25, beta, 0.5, -0.3)
            assert a == pytest.approx(b, rel=2e-5), (beta, k)
    # ATM continuity of the z/x(z) series branch
    atm = float(hagan_iv(F, F, T, 0.25, 1.0, 0.5, -0.3))
    near = float(hagan_iv(F, F * 1.0001, T, 0.25, 1.0, 0.5, -0.3))
    assert atm == pytest.approx(near, rel=1e-3)


def test_round_trip_recovers_parameters():
    """IVs generated from known params, fit started far away."""
    true = dict(alpha=0.22, nu=0.6, rho=-0.5)
    target = np.asarray(hagan_iv(F, STRIKES, T, true["alpha"], 1.0,
                                 true["nu"], true["rho"]))
    fit = calibrate_sabr(F, T, STRIKES, target, beta=1.0,
                         init=(0.4, 0.2, 0.3))
    assert float(fit.rmse) < 1e-5, float(fit.rmse)
    assert float(fit.alpha) == pytest.approx(true["alpha"], rel=2e-3)
    assert float(fit.nu) == pytest.approx(true["nu"], rel=1e-2)
    assert float(fit.rho) == pytest.approx(true["rho"], abs=1e-2)


def test_round_trip_beta_half():
    target = np.asarray(hagan_iv(F, STRIKES, T, 0.2 * F ** 0.5, 0.5,
                                 0.4, -0.2))
    fit = calibrate_sabr(F, T, STRIKES, target, beta=0.5,
                         init=(0.1 * F ** 0.5, 0.8, 0.4))
    assert float(fit.rmse) < 1e-5
    assert float(fit.alpha) == pytest.approx(0.2 * F ** 0.5, rel=5e-3)


def test_vmap_across_maturities():
    import jax
    import jax.numpy as jnp
    ts = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)
    targets = jnp.stack([hagan_iv(F, STRIKES, t, 0.22, 1.0, 0.6, -0.5)
                         for t in ts])
    fits = jax.vmap(lambda t, tv: calibrate_sabr(F, t, STRIKES, tv))(
        ts, targets)
    np.testing.assert_allclose(np.asarray(fits.alpha), 0.22, rtol=5e-3)
    assert np.all(np.asarray(fits.rmse) < 1e-4)


def test_full_mc_loop_recovers_dynamics():
    """The production loop: MC prices under known SABR dynamics -> implied
    vols -> calibration recovers the dynamics within MC noise."""
    from mc_tpu import OptionParams, SimParams
    from mc_tpu.models.sabr import DEMO_SABR, price_sabr
    from mc_tpu.oracle import bs_implied_vol

    sim = SimParams(n_paths=200_000, n_steps=50)
    ks = np.array([85.0, 95.0, 100.0, 105.0, 115.0], np.float32)
    ivs = []
    for k in ks:
        res = price_sabr(OptionParams(k=float(k)), DEMO_SABR, sim,
                         engine="xla", antithetic=True, tile_rows=64)
        ivs.append(float(bs_implied_vol(res.price, 100.0, k, 1.0, 0.1)))
    fit = calibrate_sabr(F, T, ks, np.asarray(ivs, np.float32),
                         init=(0.3, 0.2, 0.0))
    # MC noise + Hagan expansion error: loose but identifying gates
    assert float(fit.alpha) == pytest.approx(0.2, abs=0.01)
    assert float(fit.rho) == pytest.approx(-0.4, abs=0.15)
    assert float(fit.nu) == pytest.approx(0.4, abs=0.15)
    assert float(fit.rmse) < 5e-3
