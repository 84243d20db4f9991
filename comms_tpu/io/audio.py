"""Audio sink: WAV file writer (+ optional live device).

Functional parity with ``/root/reference/src/io/audio.rs:10-53``
(``AudioNode``: rodio sink fed per-block SamplesBuffer with channel
count and sample rate).  In this framework audio lands in a WAV file
by default (the environment has no audio device); if ``sounddevice``
is importable a live sink with the same ``write(block)`` interface is
available.
"""

from __future__ import annotations

import wave

import numpy as np

__all__ = ["WavSink", "open_sink"]


class WavSink:
    """Streaming WAV writer: float blocks in [-1, 1] -> 16-bit PCM.

    ``channels``/``sample_rate`` mirror AudioNode::new (audio.rs:24-42).
    """

    def __init__(self, path, channels: int = 1, sample_rate: int = 44100):
        self._w = wave.open(str(path), "wb")
        self._w.setnchannels(int(channels))
        self._w.setsampwidth(2)
        self._w.setframerate(int(sample_rate))

    def write(self, block) -> None:
        x = np.asarray(block, dtype=np.float64)
        pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
        self._w.writeframes(pcm.tobytes())

    def close(self):
        self._w.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_sink(path=None, channels: int = 1, sample_rate: int = 44100):
    """WAV sink if ``path`` given; else a live sounddevice stream when
    available (gated like the reference's audio_node cargo feature)."""
    if path is not None:
        return WavSink(path, channels, sample_rate)
    try:  # pragma: no cover - no audio device in CI
        import sounddevice as sd

        stream = sd.OutputStream(samplerate=sample_rate, channels=channels)
        stream.start()

        class _Live:
            def write(self, block):
                stream.write(np.asarray(block, dtype=np.float32))

            def close(self):
                stream.stop()
                stream.close()

        return _Live()
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            "no audio device available; pass a WAV path instead"
        ) from e
