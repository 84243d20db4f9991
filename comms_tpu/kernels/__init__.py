"""Pallas TPU kernels for the hot ops."""

from comms_tpu.kernels.fir_pallas import fir_block_pallas  # noqa: F401
