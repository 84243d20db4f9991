"""Native (C++) runtime components, loaded via ctypes.

Built on first use with g++ (cached as ``libcomms_io.so`` next to the
sources).  See ``loader.cpp`` for the C ABI.
"""

from comms_tpu.native.loader import (  # noqa: F401
    NativeBlockReader,
    NativeBlockWriter,
    native_available,
)
