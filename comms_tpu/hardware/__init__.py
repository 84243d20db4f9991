"""Hardware layer: radio protocols, file-replay radio, rtl-sdr."""

from comms_tpu.hardware.radio import (  # noqa: F401
    FileReplayRadio,
    FileSinkRadio,
    RadioRx,
    RadioTx,
)
