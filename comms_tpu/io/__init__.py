"""I/O layer: raw IQ files, socket transport, audio sink."""

from comms_tpu.io import raw_iq  # noqa: F401
