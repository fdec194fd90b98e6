"""Naive numpy oracles for the DSP ops, written directly from the math.

These intentionally mirror the *semantics* of the reference MAC loops
(overlap-save block FIR, polyphase resampler, differentiator demod, type-II
PLL) as plain readable numpy, and serve as the golden models for the
TPU-native implementations.
"""

from __future__ import annotations

import math

import numpy as np


def block_fir(x, h, state):
    """Same-length FIR reading the previous block tail for n-k < 0."""
    x, h, state = map(np.asarray, (x, h, state))
    n, k = len(x), len(h)
    ext = np.concatenate([state, x])
    y = np.zeros(n, np.float64)
    for i in range(n):
        for j in range(k):
            y[i] += h[j] * ext[len(state) + i - j]
    return y.astype(np.float32), x[n - len(state):].astype(np.float32)


def block_fir_resample(x, h, state, up, down):
    """Polyphase rational resampler: ^up -> FIR -> v down, kept outputs only."""
    x, h, state = map(np.asarray, (x, h, state))
    n, k = len(x), len(h)
    s = len(state)
    m = n * up // down
    y = np.zeros(m, np.float64)
    for out in range(m):
        nn = out * down
        phase = nn % up
        for j in range(phase, k, up):
            xi = (nn - j) // up
            v = x[xi] if xi >= 0 else state[s + xi]
            y[out] += h[j] * v
    return y.astype(np.float32), x[n - s:].astype(np.float32)


def fm_demod_diff(i, q, prev_i=0.0, prev_q=0.0):
    i, q = np.asarray(i, np.float64), np.asarray(q, np.float64)
    out = np.zeros(len(i))
    for k in range(len(i)):
        p = i[k] ** 2 + q[k] ** 2
        if p == 0:
            out[k] = 0.0
        else:
            pi_, pq_ = (prev_i, prev_q) if k == 0 else (i[k - 1], q[k - 1])
            out[k] = (i[k] * (q[k] - pq_) - q[k] * (i[k] - pi_)) / p
    return out.astype(np.float32), float(i[-1]), float(q[-1])


class PLL:
    """Sequential type-II PLL, one stream."""

    def __init__(self):
        self.feedback_i = 1.0
        self.feedback_q = 0.0
        self.integrator = 0.0
        self.phase_est = 0.0
        self.trig_offset = 0
        self.nco = 1.0
        self.nco_q = 1.0

    def run(self, x, freq, fs, nco_scale=1.0, phase_adjust=0.0, bw=0.01):
        kp, ki = bw * 2.666, bw * bw * 3.555
        n = len(x)
        out_i = np.zeros(n)
        out_q = np.zeros(n)
        out_i[0], out_q[0] = self.nco, self.nco_q
        for k in range(n):
            ei = x[k] * self.feedback_i
            eq = x[k] * -self.feedback_q
            ed = 0.0 if ei == 0 else math.atan2(eq, ei)
            self.integrator += ki * ed
            self.phase_est += kp * ed + self.integrator
            self.trig_offset += 1
            arg = 2 * math.pi * (freq / fs) * self.trig_offset + self.phase_est
            self.feedback_i = math.cos(arg)
            self.feedback_q = math.sin(arg)
            v_i = math.cos(arg * nco_scale + phase_adjust)
            v_q = math.sin(arg * nco_scale + phase_adjust)
            if k == n - 1:
                self.nco, self.nco_q = v_i, v_q
            else:
                out_i[k + 1], out_q[k + 1] = v_i, v_q
        return out_i.astype(np.float32), out_q.astype(np.float32)


def delay_block(x, state):
    d = len(state)
    out = np.concatenate([state, x[:-d]])
    return out, x[-d:]
