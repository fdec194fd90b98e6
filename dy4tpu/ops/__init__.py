"""TPU-native DSP primitive library (equivalents of src/filter.cpp and
src/fourier.cpp, re-designed around XLA convolutions, batched scans and
matmul transforms)."""

from dy4tpu.ops import (channelizer, demod, fft, fir, firdes,  # noqa: F401
                        mix, pll)
