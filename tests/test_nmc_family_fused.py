"""Fused-strategy family NMC: the C11 (fused, zero-HBM-state) strategy
generalized to every registered model family.

The engine guarantee under test (nmc_engine.family_fused_kernel): the
fused kernel runs the SAME `outer_block` physics and the same inner
`leg` the grid strategy and the XLA dual run, so all three surfaces are
bitwise identical — strategy choice is purely a memory-layout decision
(VMEM history vs HBM grids), exactly the C10/C11 relationship of the
reference (/root/reference/inc/nmc.cuh strategies 1-2)."""

import jax
import numpy as np
import pytest

from mc_tpu import OptionParams, SimParams
from mc_tpu.nmc_engine import NMC_FAMILY_BUILDERS, price_nmc_family

# importing the family modules populates the registry
import mc_tpu.nmc_basket  # noqa: F401
import mc_tpu.nmc_cev  # noqa: F401
import mc_tpu.nmc_heston  # noqa: F401
import mc_tpu.nmc_localvol  # noqa: F401
import mc_tpu.nmc_merton  # noqa: F401
import mc_tpu.nmc_rainbow  # noqa: F401
import mc_tpu.nmc_sabr  # noqa: F401
import mc_tpu.nmc_term  # noqa: F401
import mc_tpu.nmc_vasicek  # noqa: F401

OPT = OptionParams()
SIM = SimParams(n_paths=512, n_steps=4, n_paths_inner=8)

FAMILIES = sorted(NMC_FAMILY_BUILDERS)


@pytest.mark.parametrize("model", FAMILIES)
def test_fused_bitwise_equals_grid(model):
    fam, dyn32 = NMC_FAMILY_BUILDERS[model](OPT, None, SIM)
    g = price_nmc_family(fam, OPT, dyn32, SIM, "vanilla_call",
                         engine="pallas", strategy="grid")
    f = price_nmc_family(fam, OPT, dyn32, SIM, "vanilla_call",
                         engine="pallas", strategy="fused")
    np.testing.assert_array_equal(np.asarray(g.surface),
                                  np.asarray(f.surface))
    assert float(g.outer.price) == float(f.outer.price)
    assert float(g.outer.stderr) == float(f.outer.stderr)
    assert float(g.surface_mean) == float(f.surface_mean)


@pytest.mark.parametrize("model", ("heston", "basket"))
def test_fused_path_payoff(model):
    """Path-dependent payoff state (running average) rides the fused
    outer carry and the VMEM cv history identically to the grid path."""
    fam, dyn32 = NMC_FAMILY_BUILDERS[model](OPT, None, SIM)
    g = price_nmc_family(fam, OPT, dyn32, SIM, "asian_call",
                         engine="pallas", strategy="grid")
    f = price_nmc_family(fam, OPT, dyn32, SIM, "asian_call",
                         engine="pallas", strategy="fused")
    np.testing.assert_array_equal(np.asarray(g.surface),
                                  np.asarray(f.surface))
    assert float(g.outer.price) == float(f.outer.price)


def test_fused_rejects_unknown_strategy():
    fam, dyn32 = NMC_FAMILY_BUILDERS["cev"](OPT, None, SIM)
    with pytest.raises(ValueError, match="strategy"):
        price_nmc_family(fam, OPT, dyn32, SIM, "vanilla_call",
                         engine="pallas", strategy="vmem")


def test_sharded_fused_bitwise_matches_grid():
    """strategy='fused' over the mesh: per-chip fused kernels on global
    path offsets produce the same sharded surface as the grid path."""
    from mc_tpu.parallel import make_mesh, price_nmc_model_sharded

    mesh = make_mesh(jax.devices()[:4])
    g = price_nmc_model_sharded("cev", sim=SIM, mesh=mesh,
                                strategy="grid")
    f = price_nmc_model_sharded("cev", sim=SIM, mesh=mesh,
                                strategy="fused")
    np.testing.assert_array_equal(np.asarray(g.surface),
                                  np.asarray(f.surface))
    assert float(g.outer.price) == float(f.outer.price)
    assert float(g.outer.stderr) == float(f.outer.stderr)


def test_sharded_term_model_runs():
    """'term' joined _NMC_MODEL_MODULES late: 1-device mesh is bitwise
    the single-chip result, like every other family."""
    from mc_tpu.nmc_term import price_nmc_term
    from mc_tpu.parallel import make_mesh, price_nmc_model_sharded

    single = price_nmc_term(sim=SIM, engine="pallas")
    m1 = price_nmc_model_sharded("term", sim=SIM,
                                 mesh=make_mesh(jax.devices()[:1]))
    assert float(m1.outer.price) == float(single.outer.price)
    np.testing.assert_array_equal(np.asarray(m1.surface),
                                  np.asarray(single.surface))
