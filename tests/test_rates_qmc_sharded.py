"""Shift-sharded frozen-policy QMC Bermudans (round 4): the `mesh=`
axis on `price_bermudan_{swaption,hw_swaption,g2_swaption}_qmc`.

Contract: the pilot fit REPLICATES (same key -> identical betas on
every chip) and each chip evaluates the full point set for its shifts,
so per-shift means — and hence the price — are mesh-SIZE invariant
bitwise; agreement with the mesh-less vmap program is gated at the
documented last-ulp tolerance (they currently coincide bitwise)."""

import jax
import pytest

from mc_tpu import SimParams
from mc_tpu.models.swaption import SwaptionSpec
from mc_tpu.parallel import make_mesh

SIM = SimParams(n_paths=1 << 10, n_steps=1)


def _fns():
    from mc_tpu.models.g2pp import price_bermudan_g2_swaption_qmc
    from mc_tpu.models.hullwhite import price_bermudan_hw_swaption_qmc
    from mc_tpu.models.swaption import price_bermudan_swaption_qmc
    # Short date grids: the 8-device shard_map TRACE time grows with the
    # unrolled date count on the virtual CPU mesh (documented in
    # test_g2pp.py); the invariance contract is date-count independent.
    return (("vasicek", price_bermudan_swaption_qmc, 6),
            ("hullwhite", price_bermudan_hw_swaption_qmc, 6),
            ("g2pp", price_bermudan_g2_swaption_qmc, 4))


@pytest.mark.parametrize("name,fn,n_pay",
                         _fns(), ids=[f[0] for f in _fns()])
def test_bermudan_qmc_mesh_invariance(name, fn, n_pay):
    spec = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=n_pay,
                        k_rate=0.04)
    devs = jax.devices()
    solo = fn(spec, sim=SIM, n_fit=1024, n_shifts=8)
    m1 = fn(spec, sim=SIM, n_fit=1024, n_shifts=8,
            mesh=make_mesh(devs[:1]))
    m8 = fn(spec, sim=SIM, n_fit=1024, n_shifts=8, mesh=make_mesh(devs))
    assert float(m8.price) == float(m1.price), name  # bitwise contract
    assert abs(float(m8.price) - float(solo.price)) <= 3e-7 * abs(
        float(solo.price)), name
    assert float(m8.stderr) > 0.0


def test_bermudan_qmc_mesh_rounds_up_shifts():
    """n_shifts rounds UP to a mesh multiple (shift budget grows, never
    silently shrinks)."""
    from mc_tpu.models.swaption import price_bermudan_swaption_qmc
    spec = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=2,
                        k_rate=0.04)
    m = price_bermudan_swaption_qmc(spec, sim=SIM, n_fit=1024,
                                    n_shifts=9, mesh=make_mesh())
    assert float(m.n_paths) == (1 << 10) * 16  # 9 -> 16 on 8 devices
