"""TPU-native DSP primitive library (equivalents of src/filter.cpp and
src/fourier.cpp, re-designed around XLA convolutions, batched scans and
matmul transforms)."""

from dy4tpu.ops import demod, fft, fir, firdes, mix, pll  # noqa: F401
