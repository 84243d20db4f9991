"""Utilities: signal-parity metrics (SNR/EVM)."""

from comms_tpu.util import snr  # noqa: F401
