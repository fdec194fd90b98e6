"""Host runtime: native streaming I/O (C++ ring buffers + I/O threads)."""

from dy4tpu.runtime.native import (  # noqa: F401
    NativeSink,
    NativeSource,
    Ring,
    available,
    load_library,
)
