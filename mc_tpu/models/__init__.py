"""Stochastic models (dynamics) for path generation."""

from mc_tpu.models.gbm import GBM, gbm_exact_terminal, gbm_log_euler_step

__all__ = ["GBM", "gbm_exact_terminal", "gbm_log_euler_step"]
