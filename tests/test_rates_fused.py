"""Fused-engine European swaptions (round 4, VERDICT r03 item 4 prep):
`price_hw_swaption(engine="pallas"|"xla")` and the G2 twin.

Contract: the two fused engines are BITWISE equal (shared tile fold,
shared threefry stream), and both agree with the classic single-fusion
default impl to summation order (<= 3e-7 rel) — per-path arithmetic is
op-for-op identical, only the reduction differs (Kahan slabs + TwoSum
finish vs one jnp.sum).  The on-chip Mosaic leg lives in
tests_tpu/test_rates_device.py; the device measurement decides which
engine becomes the production default (BASELINE.md "Curve rates")."""

import pytest

from mc_tpu import SimParams, oracle
from mc_tpu.models.g2pp import DEMO_G2, price_g2_swaption
from mc_tpu.models.hullwhite import (DEMO_CURVE, DEMO_HW,
                                     price_hw_swaption)
from mc_tpu.models.swaption import SwaptionSpec

SPEC = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=10, k_rate=0.04)
SIM = SimParams(n_paths=1 << 16, n_steps=1)


@pytest.mark.parametrize("payer", [True, False], ids=["payer", "receiver"])
def test_hw_fused_engines_bitwise_and_match_default(payer):
    spec = SwaptionSpec(expiry=1.0, tenor=0.5, n_payments=10,
                        k_rate=0.04, payer=payer)
    legacy = price_hw_swaption(spec, DEMO_HW, DEMO_CURVE, SIM)
    pal = price_hw_swaption(spec, DEMO_HW, DEMO_CURVE, SIM,
                            engine="pallas")
    xla = price_hw_swaption(spec, DEMO_HW, DEMO_CURVE, SIM,
                            engine="xla")
    assert float(pal.price) == float(xla.price)
    assert float(pal.stderr) == float(xla.stderr)
    # summation-order noise: relative in the payoff-mean scale with an
    # absolute ulp floor (the deep-OTM receiver value is ~1e-3)
    assert abs(float(pal.price) - float(legacy.price)) <= (
        3e-7 * abs(float(legacy.price)) + 1e-9)
    ref = oracle.hw_swaption(DEMO_HW.a, DEMO_HW.sigma_r, DEMO_CURVE.df,
                             spec.expiry, spec.tenor, spec.n_payments,
                             spec.k_rate, payer=payer)
    assert abs(float(pal.price) - ref) < 4.0 * float(pal.stderr)


def test_g2_fused_engines_bitwise_and_match_default():
    legacy = price_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE, SIM)
    pal = price_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE, SIM,
                            engine="pallas")
    xla = price_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE, SIM,
                            engine="xla")
    assert float(pal.price) == float(xla.price)
    assert float(pal.stderr) == float(xla.stderr)
    assert abs(float(pal.price) - float(legacy.price)) <= 3e-7 * abs(
        float(legacy.price))
    ref = oracle.g2_swaption(DEMO_G2.a, DEMO_G2.sigma, DEMO_G2.b_mr,
                             DEMO_G2.eta, DEMO_G2.rho, DEMO_CURVE.df,
                             SPEC.expiry, SPEC.tenor, SPEC.n_payments,
                             SPEC.k_rate)
    assert abs(float(pal.price) - ref) < 4.0 * float(pal.stderr)


def test_fused_overhang_masking_bitwise():
    """Non-tile-multiple path counts mask identically in both engines."""
    sim = SimParams(n_paths=100_001, n_steps=1)
    p = price_hw_swaption(SPEC, DEMO_HW, DEMO_CURVE, sim,
                          engine="pallas")
    x = price_hw_swaption(SPEC, DEMO_HW, DEMO_CURVE, sim, engine="xla")
    assert float(p.price) == float(x.price)
    g = price_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE, sim,
                          engine="pallas")
    gx = price_g2_swaption(SPEC, DEMO_G2, DEMO_CURVE, sim, engine="xla")
    assert float(g.price) == float(gx.price)


def test_fused_engine_validation():
    with pytest.raises(ValueError, match="pallas|xla"):
        price_hw_swaption(SPEC, sim=SIM, engine="cuda")
    with pytest.raises(ValueError, match="single-curve"):
        from mc_tpu.models.hullwhite import DiscountCurve
        import numpy as np
        proj = DiscountCurve(DEMO_CURVE.times,
                             np.asarray(DEMO_CURVE.zeros) + 1e-4)
        price_hw_swaption(SPEC, sim=SIM, engine="xla",
                          projection_curve=proj)
    with pytest.raises(ValueError, match="pallas|xla"):
        price_g2_swaption(SPEC, sim=SIM, engine="cuda")


def test_vasicek_fused_engines_bitwise_and_match_default():
    from mc_tpu.models.swaption import price_swaption
    from mc_tpu.models.vasicek import VasicekDynamics
    dyn = VasicekDynamics(a=0.3, b=0.05, sigma_r=0.015)
    legacy = price_swaption(SPEC, dyn, SIM, r0=0.05)
    pal = price_swaption(SPEC, dyn, SIM, r0=0.05, engine="pallas")
    xla = price_swaption(SPEC, dyn, SIM, r0=0.05, engine="xla")
    assert float(pal.price) == float(xla.price)
    assert float(pal.stderr) == float(xla.stderr)
    assert abs(float(pal.price) - float(legacy.price)) <= (
        3e-7 * abs(float(legacy.price)) + 1e-9)
    ref = oracle.vasicek_swaption(0.05, dyn.a, dyn.b, dyn.sigma_r,
                                  SPEC.expiry, SPEC.tenor,
                                  SPEC.n_payments, SPEC.k_rate)
    assert abs(float(pal.price) - ref) < 4.0 * float(pal.stderr)
    with pytest.raises(ValueError, match="pallas|xla"):
        price_swaption(SPEC, dyn, SIM, engine="cuda")
