"""Native C++ IO: build, round-trip, read-ahead, EOF policies."""

import numpy as np
import pytest

from comms_tpu.native import (
    NativeBlockReader,
    NativeBlockWriter,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


def test_reader_blocks_and_eof(tmp_path):
    p = tmp_path / "data.bin"
    data = np.arange(1000, dtype=np.uint8)
    data.tofile(p)

    with NativeBlockReader(p, block_bytes=256) as r:
        blocks = list(r)
    # 3 full blocks + 1 short tail (232 bytes).
    assert [len(b) for b in blocks] == [256, 256, 256, 232]
    assert np.array_equal(np.concatenate(blocks), data)


def test_reader_loop_wraps(tmp_path):
    p = tmp_path / "data.bin"
    np.arange(100, dtype=np.uint8).tofile(p)
    with NativeBlockReader(p, block_bytes=64, loop=True) as r:
        b1 = r.next_block().copy()
        b2 = r.next_block().copy()
    assert len(b1) == 64 and len(b2) == 64
    assert b2[35] == 99 and b2[36] == 0  # wrap point: 36 remaining + restart


def test_reader_dtype_shape_view(tmp_path):
    p = tmp_path / "iq.bin"
    np.arange(40, dtype=np.uint8).tofile(p)
    with NativeBlockReader(p, block_bytes=40, dtype=np.uint8,
                           shape=(-1, 2)) as r:
        b = r.next_block()
        assert b.shape == (20, 2)
        assert b[1, 0] == 2


def test_writer_roundtrip(tmp_path):
    p = tmp_path / "out.bin"
    with NativeBlockWriter(p) as w:
        for i in range(5):
            w.write(np.full(100, i, dtype=np.int16))
    got = np.fromfile(p, dtype=np.int16)
    assert len(got) == 500
    assert (got.reshape(5, 100) == np.arange(5)[:, None]).all()


def test_reader_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        NativeBlockReader(tmp_path / "nope.bin", block_bytes=64)
