"""RTL-SDR binding exercised against a mocked pyrtlsdr device (no
hardware; parity with rtlsdr_radio.rs:17-53 call behavior)."""

import importlib
import sys
import types

import numpy as np


class _FakeSdr:
    def __init__(self, device_index=0):
        self.device_index = device_index
        self.center_freq = None
        self.sample_rate = None
        self.gain = None
        self.agc = None
        self.closed = False

    def set_agc_mode(self, enabled):
        self.agc = enabled

    def read_bytes(self, n):
        # deterministic interleaved IQ ramp, like a real dongle read
        return bytes(bytearray(i % 256 for i in range(n)))

    def close(self):
        self.closed = True


def _load_with_fake():
    fake_mod = types.ModuleType("rtlsdr")
    fake_mod.RtlSdr = _FakeSdr
    old = sys.modules.get("rtlsdr")
    sys.modules["rtlsdr"] = fake_mod
    try:
        import comms_tpu.hardware.rtlsdr as rtl
        return importlib.reload(rtl)
    finally:
        if old is None:
            sys.modules.pop("rtlsdr", None)
        else:
            sys.modules["rtlsdr"] = old


def test_rtlsdr_radio_mocked_roundtrip():
    rtl = _load_with_fake()
    try:
        assert rtl.HAVE_RTLSDR
        radio = rtl.RtlSdrRadio(index=3)
        assert radio._sdr.device_index == 3

        # init_radio mirrors rtlsdr_radio.rs:17-28
        radio.init_radio(88_700_000, 1_140_000, "auto")
        assert radio._sdr.center_freq == 88_700_000
        assert radio._sdr.sample_rate == 1_140_000
        assert radio._sdr.gain == "auto"

        radio.set_agc(True)
        assert radio._sdr.agc is True

        # recv_samples returns [n, 2] interleaved u8 IQ
        iq = radio.recv_samples(1024)
        assert iq.shape == (1024, 2) and iq.dtype == np.uint8
        assert iq[0, 0] == 0 and iq[0, 1] == 1 and iq[1, 0] == 2

        radio.close()
        assert radio._sdr.closed
    finally:
        importlib.reload(rtl)  # restore real-world gating


def test_rtlsdr_satisfies_radio_protocol():
    rtl = _load_with_fake()
    try:
        from comms_tpu.hardware.radio import RadioRx
        radio = rtl.RtlSdrRadio()
        assert isinstance(radio, RadioRx)
    finally:
        importlib.reload(rtl)
