"""American exercise under Merton jump-diffusion (LSMC on jump paths)."""

import numpy as np
import pytest

from mc_tpu import OptionParams, SimParams
from mc_tpu.lsmc import binomial_american, price_american_merton
from mc_tpu.models.merton import (DEMO_MERTON, MertonDynamics,
                                  merton_call_closed_form)

OPT = OptionParams(r=0.05)   # moderate rate: real early-exercise premium
SIM = SimParams(n_paths=100_000, n_steps=50)


def test_no_jump_limit_matches_crr():
    """lam = 0: the engine must reproduce the GBM American put (CRR)."""
    dyn = MertonDynamics(lam=0.0)
    res = price_american_merton(OPT, dyn, SIM)
    ref = binomial_american(100.0, 100.0, 1.0, 0.05, 0.2, kind="put")
    tol = 4.0 * float(res.stderr) + 0.01 * ref
    assert abs(float(res.price) - ref) <= tol, (float(res.price), ref)


def test_downward_jumps_raise_the_put():
    """Crash risk makes the American put strictly more valuable."""
    nj = price_american_merton(OPT, MertonDynamics(lam=0.0), SIM)
    wj = price_american_merton(OPT, MertonDynamics(lam=0.5, mu_j=-0.15,
                                                   sigma_j=0.15), SIM)
    joint = np.hypot(float(nj.stderr), float(wj.stderr))
    assert float(wj.price) - float(nj.price) > 5.0 * joint


def test_american_dominates_european():
    """American put >= European put (series oracle via put-call parity)."""
    import math
    res = price_american_merton(OPT, DEMO_MERTON, SIM)
    call = merton_call_closed_form(100.0, 100.0, 1.0, 0.05, 0.2,
                                   lam=0.3, mu_j=-0.10, sigma_j=0.15)
    euro_put = call - 100.0 + 100.0 * math.exp(-0.05)
    assert float(res.price) >= euro_put - 3.0 * float(res.stderr)


def test_one_pass_dominates_two_pass():
    """Foresight-bias ordering: in-sample one-pass >= out-of-sample
    two-pass up to MC noise."""
    one = price_american_merton(OPT, DEMO_MERTON, SIM, two_pass=False)
    two = price_american_merton(OPT, DEMO_MERTON, SIM, two_pass=True)
    joint = np.hypot(float(one.stderr), float(two.stderr))
    assert float(one.price) >= float(two.price) - 3.0 * joint


def test_bermudan_schedule_ordering():
    """Fewer exercise dates can only lower the value."""
    am = price_american_merton(OPT, DEMO_MERTON, SIM, exercise_every=1)
    bm = price_american_merton(OPT, DEMO_MERTON, SIM, exercise_every=10)
    joint = np.hypot(float(am.stderr), float(bm.stderr))
    assert float(am.price) >= float(bm.price) - 3.0 * joint


def test_guards():
    with pytest.raises(ValueError, match="even n_steps"):
        price_american_merton(sim=SimParams(n_paths=2048, n_steps=9))
    with pytest.raises(ValueError, match="exercise_every"):
        price_american_merton(sim=SIM, exercise_every=0)
