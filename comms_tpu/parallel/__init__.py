"""Parallel layer: mesh helpers, time-block sharding with halo
exchange, channel sharding, multi-host init."""

from comms_tpu.parallel import (  # noqa: F401
    dfft,
    fused_wideband,
    multihost,
    scaling,
    sharding,
    wideband,
)
