"""Native (C++) host-side runtime components.

The reference's only native code is its two CUDA kernels (replaced here by
XLA/Pallas); its host-side post-processing is pure Python. This package holds
C++ implementations of the host-side hot spots — currently greedy NMS for the
SFD detector — built lazily with g++ into a cached shared library and bound via
ctypes. Every entry point has a pure-numpy fallback, so the framework works
without a toolchain.
"""

from warpedganspace_tpu.native.build import load_native

__all__ = ["load_native"]
