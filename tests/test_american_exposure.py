"""American-position exposure over the family rollout hooks: the
American-Monte-Carlo XVA surface (frozen-policy MtM per date, exercise
absorption) for any model family."""

import numpy as np
import pytest

from mc_tpu import OptionParams, SimParams
from mc_tpu.lsmc import american_exposure_family, price_american_family

SIM = SimParams(n_paths=8192, n_steps=8)


@pytest.fixture(scope="module")
def heston_exposure():
    return american_exposure_family("heston", OptionParams(), sim=SIM,
                                    n_outer=4096, n_inner=16)


def test_ee_telescopes_and_anchors_at_the_policy_price(heston_exposure):
    """Exercise absorbs, so EE(t_j) = E[cash at j] + EE(t_{j+1}):
    nonincreasing, and EE at the first date equals the policy price
    (the LSMC fit shares the SAME pilot key, so both estimate the same
    policy; agreement is statistical across the independent outer
    sets)."""
    from mc_tpu.models.heston import DEMO_HESTON
    from mc_tpu.nmc_heston import HestonNMC
    ee, _ = heston_exposure.exposure_profile()
    ee = np.asarray(ee)
    assert np.all(np.diff(ee) <= 1e-3), ee
    pr = price_american_family(HestonNMC(), OptionParams(),
                               DEMO_HESTON.as_f32(), SIM, "vanilla_put")
    assert abs(float(ee[0]) - float(pr.price)) \
        <= 0.05 * float(pr.price), (ee[0], float(pr.price))


def test_xva_metrics_compose_on_the_american_surface(heston_exposure):
    e = heston_exposure
    flat = float(e.cva(0.02))
    assert flat > 0.0
    assert float(e.collateralized(0.5).cva(0.02)) < flat
    assert float(e.mva(0.01)) > 0.0
    # long put under WWR-on-exposure: marked UP (exposure-linked)
    assert float(e.cva_wwr(0.02, 0.1)) > flat


def test_european_limit_every_beyond_horizon():
    """exercise_every > n_steps: the only exercise date is maturity, so
    the position is European — EE is the discounted European value
    surface, which under full discounting is a MARTINGALE: flat at the
    European price (no absorption before the last date)."""
    from mc_tpu import oracle
    e = american_exposure_family("cev", OptionParams(), sim=SIM,
                                 payoff="vanilla_put", n_outer=8192,
                                 n_inner=64, exercise_every=100)
    ee = np.asarray(e.exposure_profile()[0])
    # flat profile (martingale): every date within a few rollout-se of
    # the first
    assert float(np.max(np.abs(ee - ee[0]))) < 0.06 * float(ee[0]), ee


def test_unknown_model_and_state_payoffs_raise():
    with pytest.raises(ValueError, match="supports"):
        american_exposure_family("term")
    with pytest.raises(ValueError, match="terminal payoffs"):
        american_exposure_family("heston", payoff="asian_call")


def test_sharded_exposure_bitwise_mesh_invariant():
    """mesh=: pilot fit replicates, outer grids and rollout streams key
    by GLOBAL path id — the exposure matrix is BITWISE the single-chip
    one on any mesh size (no collectives anywhere)."""
    import jax

    from mc_tpu.parallel import make_mesh
    kw = dict(sim=SimParams(n_paths=2048, n_steps=8), n_outer=8192,
              n_inner=2)
    single = american_exposure_family("heston", OptionParams(), **kw)
    m1 = american_exposure_family("heston", OptionParams(),
                                  mesh=make_mesh(jax.devices()[:1]),
                                  **kw)
    m8 = american_exposure_family("heston", OptionParams(),
                                  mesh=make_mesh(), **kw)
    v = np.asarray(single.values)
    assert np.array_equal(v, np.asarray(m1.values))
    assert np.array_equal(v, np.asarray(m8.values))
