from mc_tpu.models.gbm import GBM, gbm_exact_terminal, gbm_log_euler_step
from mc_tpu.models.heston import (DEMO_HESTON, HestonDynamics,
                                  heston_call_cf, price_heston)

from mc_tpu.models.basket import BasketDynamics, DEMO_BASKET, price_basket
from mc_tpu.models.bates import (DEMO_BATES, BatesDynamics, bates_call_cf,
                                 price_bates)
from mc_tpu.models.cev import (CEVDynamics, DEMO_CEV, cev_call_closed_form,
                               price_cev)
from mc_tpu.models.merton import (DEMO_MERTON, MertonDynamics,
                                  merton_call_closed_form, price_merton)
from mc_tpu.models.rainbow import RAINBOW_PAYOFFS, price_rainbow
from mc_tpu.models.sabr import (DEMO_SABR, SABRDynamics, price_sabr,
                                sabr_call_hagan, sabr_implied_vol)
from mc_tpu.models.localvol import (DEMO_LOCALVOL, LocalVolSurface,
                                    price_localvol)
from mc_tpu.models.term import DEMO_TERM, TermStructure, price_term
from mc_tpu.models.vasicek import (DEMO_VASICEK, VasicekDynamics,
                                   price_vasicek)

__all__ = ["GBM", "gbm_exact_terminal", "gbm_log_euler_step",
           "HestonDynamics", "DEMO_HESTON", "heston_call_cf",
           "price_heston", "BasketDynamics", "DEMO_BASKET", "price_basket",
           "CEVDynamics", "DEMO_CEV", "cev_call_closed_form", "price_cev",
           "MertonDynamics", "DEMO_MERTON", "merton_call_closed_form",
           "price_merton", "SABRDynamics", "DEMO_SABR", "price_sabr",
           "sabr_call_hagan", "sabr_implied_vol", "price_rainbow",
           "RAINBOW_PAYOFFS", "VasicekDynamics", "DEMO_VASICEK",
           "price_vasicek", "TermStructure", "DEMO_TERM", "price_term",
           "LocalVolSurface", "DEMO_LOCALVOL", "price_localvol",
           "BatesDynamics", "DEMO_BATES", "bates_call_cf", "price_bates"]
