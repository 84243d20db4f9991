"""Pure DSP math ops (jax.numpy on device, numpy for host-side params)."""

from comms_tpu.ops import taps  # noqa: F401
