from mc_tpu.utils.benchmark import BenchResult, time_fn
from mc_tpu.utils.device import device_summary

__all__ = ["BenchResult", "time_fn", "device_summary"]
