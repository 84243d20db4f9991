"""Pure DSP math ops (jax.numpy on device, numpy for host-side params)."""

from comms_tpu.ops import (  # noqa: F401
    agc,
    channelizer,
    demodulation,
    fft,
    fir,
    interp,
    mixer,
    modulation,
    prns,
    pulse,
    random,
    resample,
    spectrum,
    taps,
)
