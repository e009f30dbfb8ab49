from mc_tpu.parallel.lsmc_sharded import price_american_sharded
from mc_tpu.parallel.mesh import (make_mesh, price_portfolio_sharded,
                                  price_qmc_sharded, price_sharded,
                                  shard_bounds)
from mc_tpu.parallel.models_sharded import (SHARDED_MODELS,
                                            price_model_sharded)
from mc_tpu.parallel.nmc_sharded import (price_nmc_model_sharded,
                                         price_nmc_sharded)
from mc_tpu.qmc import price_qmc_model_sharded

__all__ = ["make_mesh", "price_sharded", "price_qmc_sharded",
           "price_portfolio_sharded", "price_american_sharded",
           "shard_bounds", "price_nmc_sharded", "price_model_sharded",
           "SHARDED_MODELS", "price_nmc_model_sharded",
           "price_qmc_model_sharded"]
