"""Test-signal generators (equivalent of src/genfunc.cpp:13-41)."""

from __future__ import annotations

import numpy as np


def generate_sin(fs: float, freq: float, n: int, amp: float = 1.0,
                 phase: float = 0.0) -> np.ndarray:
    """amp * sin(2*pi*freq/fs*k + phase) (generateSin, genfunc.cpp:13-24)."""
    k = np.arange(n, dtype=np.float64)
    return (amp * np.sin(2 * np.pi * freq / fs * k + phase)
            ).astype(np.float32)


def add_sin(sins) -> np.ndarray:
    """Sum of equal-length sinusoids (addSin, genfunc.cpp:26-31)."""
    return np.sum(np.stack([np.asarray(s) for s in sins]), axis=0)


def generate_random_samples(n: int, max_abs: float = 10.0,
                            precision: int = 2,
                            seed: int | None = None) -> np.ndarray:
    """Bounded random floats rounded to ``precision`` decimals
    (generateRandomSamples, genfunc.cpp:33-41)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-max_abs, max_abs, n)
    return np.round(x, precision).astype(np.float32)
