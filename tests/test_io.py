"""Raw IQ file I/O: i16-interleaved format parity (raw_iq.rs:1-5) and
round-trips, using in-memory buffers like the reference's Cursor tests
(raw_iq.rs:225-356)."""

import io

import numpy as np
import pytest

from comms_tpu.io import raw_iq


def test_roundtrip_buffer():
    x = np.array([1 + 2j, -3 - 4j, 32767 - 32768j], dtype=np.complex64)
    buf = io.BytesIO()
    n = raw_iq.write_iq(buf, x)
    assert n == 3
    got = raw_iq.read_iq(buf.getvalue())
    assert np.array_equal(got, x)


def test_interleaved_native_endian_layout():
    x = np.array([258 + 772j], dtype=np.complex64)  # 0x0102, 0x0304
    buf = io.BytesIO()
    raw_iq.write_iq(buf, x)
    expected = np.array([258, 772], dtype=np.int16).tobytes()
    assert buf.getvalue() == expected


def test_rust_as_i16_truncation():
    # Rust `as i16` truncates toward zero: 0.9*8192 -> 7372 (not 7373).
    out = raw_iq.float_to_iq_i16(np.array([0.9 - 0.9j]), scale=8192.0)
    assert out[0] == int(0.9 * 8192.0)
    assert out[1] == -int(0.9 * 8192.0)


def test_iter_blocks_tail_policies(tmp_path):
    x = (np.arange(10) + 1j * np.arange(10)).astype(np.complex64)
    p = tmp_path / "iq.bin"
    with raw_iq.IQWriter(p) as w:
        w.write(x)

    blocks = list(raw_iq.iter_iq_blocks(p, 4, tail="drop"))
    assert len(blocks) == 2 and all(len(b) == 4 for b in blocks)

    blocks = list(raw_iq.iter_iq_blocks(p, 4, tail="pad"))
    assert len(blocks) == 3 and np.array_equal(blocks[2][2:], [0, 0])

    blocks = list(raw_iq.iter_iq_blocks(p, 4, tail="short"))
    assert len(blocks) == 3 and len(blocks[2]) == 2

    with pytest.raises(ValueError):
        next(raw_iq.iter_iq_blocks(p, 4, tail="bogus"))


def test_iter_blocks_scaling(tmp_path):
    x = np.array([100 + 200j], dtype=np.complex64)
    p = tmp_path / "iq.bin"
    with raw_iq.IQWriter(p) as w:
        w.write(x)
    (b,) = raw_iq.iter_iq_blocks(p, 1, scale=1 / 100)
    assert np.allclose(b, [1 + 2j])
