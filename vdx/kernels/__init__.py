"""Pallas TPU kernels for the denoise hot loop."""
