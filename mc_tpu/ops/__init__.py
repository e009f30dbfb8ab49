"""Compute ops: payoffs, reductions, and the fused Pallas path kernels."""
