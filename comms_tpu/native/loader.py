"""ctypes bindings for the native streaming IO library.

``NativeBlockReader`` overlaps disk reads with device compute on a C++
thread (no GIL): Python borrows each filled block as a zero-copy numpy
view, ships it to the device, then releases the buffer back to the
ring.  ``NativeBlockWriter`` queues result blocks to a writer thread.

The library is compiled on first use (g++ -O3 -shared) and cached
beside the sources; if no toolchain is available the pure-Python IO in
:mod:`comms_tpu.io.raw_iq` remains the fallback
(``native_available()`` reports which).
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["NativeBlockReader", "NativeBlockWriter", "native_available"]

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libcomms_io.so"
_HASH = _DIR / "libcomms_io.so.srchash"
_SRC = _DIR / "loader.cpp"
_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _build(src_hash: str) -> None:
    """Compile loader.cpp -> libcomms_io.so and record the source hash
    it was built from (freshness is content-addressed, never mtime)."""
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-pthread",
         str(_SRC), "-o", str(_SO)],
        check=True, capture_output=True, text=True,
    )
    _HASH.write_text(src_hash)


def _get_lib():
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            raise RuntimeError(f"native IO unavailable: {_build_error}")
        try:
            src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()
            stale = (not _SO.exists() or not _HASH.exists()
                     or _HASH.read_text().strip() != src_hash)
        except OSError as e:
            _build_error = str(e)
            raise RuntimeError(f"native IO unavailable: {e}") from e
        try:
            if stale:
                _build(src_hash)
        except (OSError, subprocess.CalledProcessError) as e:
            _build_error = getattr(e, "stderr", str(e)) or str(e)
            raise RuntimeError(
                f"native IO unavailable: {_build_error}"
            ) from e
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as first:  # wrong-arch or corrupt .so: rebuild once
            try:
                _build(src_hash)
                lib = ctypes.CDLL(str(_SO))
            except (OSError, subprocess.CalledProcessError) as e:
                _build_error = (getattr(e, "stderr", None)
                                or f"{first}; rebuild failed: {e}")
                raise RuntimeError(
                    f"native IO unavailable: {_build_error}"
                ) from e
        lib.reader_open.restype = ctypes.c_void_p
        lib.reader_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                    ctypes.c_uint32, ctypes.c_int]
        lib.reader_next.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.reader_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint64)]
        lib.reader_release.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_uint8)]
        lib.reader_close.argtypes = [ctypes.c_void_p]
        lib.writer_open.restype = ctypes.c_void_p
        lib.writer_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                    ctypes.c_uint32]
        lib.writer_submit.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_uint8),
                                      ctypes.c_uint64]
        lib.writer_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        _get_lib()
        return True
    except RuntimeError:
        return False


class NativeBlockReader:
    """Iterate fixed-size byte blocks from a file, read-ahead on a C++
    thread.  ``dtype``/``shape`` reinterpret each block (e.g.
    ``dtype=np.uint8, shape=(-1, 2)`` for raw rtl-sdr IQ)."""

    def __init__(self, path, block_bytes: int, n_buffers: int = 3,
                 loop: bool = False, dtype=np.uint8, shape=None):
        self._lib = _get_lib()
        self._h = self._lib.reader_open(
            str(path).encode(), int(block_bytes), int(n_buffers),
            1 if loop else 0,
        )
        if not self._h:
            raise FileNotFoundError(path)
        self.block_bytes = int(block_bytes)
        self.dtype = np.dtype(dtype)
        self.shape = shape
        self._borrowed = None

    def next_block(self) -> Optional[np.ndarray]:
        """Borrow the next block (zero-copy).  Returns None at EOF.
        The previous block is released automatically."""
        self.release()
        n = ctypes.c_uint64()
        ptr = self._lib.reader_next(self._h, ctypes.byref(n))
        if not ptr or n.value == 0:
            return None
        self._borrowed = ptr
        arr = np.ctypeslib.as_array(ptr, shape=(n.value,)).view(self.dtype)
        if self.shape is not None:
            arr = arr.reshape(self.shape)
        return arr

    def release(self):
        if self._borrowed is not None:
            self._lib.reader_release(self._h, self._borrowed)
            self._borrowed = None

    def close(self):
        if self._h:
            self.release()
            self._lib.reader_close(self._h)
            self._h = None

    def __iter__(self):
        """Yields OWNED copies (safe to accumulate).  The zero-copy
        path is explicit ``next_block()`` + consume + next call, which
        releases the borrow back to the ring."""
        while True:
            b = self.next_block()
            if b is None:
                return
            yield b.copy()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativeBlockWriter:
    """Queue result blocks to a C++ writer thread (copies once into
    the queue, bounded depth gives natural back-pressure)."""

    def __init__(self, path, n_buffers: int = 4):
        self._lib = _get_lib()
        self._h = self._lib.writer_open(str(path).encode(), 0,
                                        int(n_buffers))
        if not self._h:
            raise OSError(f"cannot open {path} for writing")

    def write(self, arr) -> None:
        arr = np.ascontiguousarray(arr)
        ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        self._lib.writer_submit(self._h, ptr, arr.nbytes)

    def close(self):
        if self._h:
            self._lib.writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
