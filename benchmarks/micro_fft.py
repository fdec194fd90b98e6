"""A/B the PSD segment transform lowerings (C12 routing decision).

Times jnp.fft.fft vs the four-step XLA einsum twin vs the Pallas
four-step kernel on the Bartlett PSD shape ([segments, 512]), honest
chained-dispatch timing (the axon tunnel returns from block_until_ready
early; chaining dependent dispatches + one tiny fetch measures truly).

Run: python -m benchmarks.micro_fft   (env: FFT_BATCH, FFT_N, FFT_REPS)
"""

import os
import time

from dy4tpu.utils import jaxenv
jaxenv.setup()

import numpy as np
import jax
import jax.numpy as jnp

from dy4tpu.ops import fft_pallas


def bench(fn, x, reps):
    y = fn(x)
    np.asarray(jnp.real(y)[..., :1])            # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        # dependent chain: feed a scalar of the output back into the input
        x = x + jnp.real(y)[..., :1] * 0.0
        y = fn(x)
    np.asarray(jnp.real(y)[..., :1])
    return (time.perf_counter() - t0) / reps


def main():
    b = int(os.environ.get("FFT_BATCH", 4096))
    n = int(os.environ.get("FFT_N", 512))
    reps = int(os.environ.get("FFT_REPS", 20))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

    on_tpu = jax.default_backend() == "tpu"
    cases = {
        "jnp.fft": jax.jit(lambda v: jnp.fft.fft(v)),
        "four_step(xla)": jax.jit(fft_pallas.fft_four_step),
    }
    if on_tpu:  # the compiled kernel needs real hardware; CPU would
        # only measure the interpreter
        cases["four_step(pallas)"] = jax.jit(fft_pallas.fft_pallas)
    print(f"batch {b} x N={n}, {reps} chained reps, "
          f"backend={jax.default_backend()}")
    for name, fn in cases.items():
        dt = bench(fn, x, reps)
        gsps = b * n / dt / 1e9
        print(f"  {name:18s} {dt * 1e3:8.3f} ms  {gsps:7.2f} Gsample/s")


if __name__ == "__main__":
    main()
