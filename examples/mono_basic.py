"""Single-pass mono decode — the fmMonoBasic.py lab flow, TPU-native.

Decodes a whole u8 IQ capture in one shot (no block processing, no carried
state): RF LPF -> decimate -> FM demod -> audio LPF -> decimate -> WAV.
Useful for validating the block pipeline against a stateless reference
(model/fmMonoBasic.py:107-199).

    python examples/mono_basic.py capture.raw out.wav [mode]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dy4tpu.utils import jaxenv
jaxenv.setup()

import numpy as np
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.ops import demod, fir, firdes
from dy4tpu.utils import io as dio


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    infile, outfile = sys.argv[1], sys.argv[2]
    cfg = get_mode(int(sys.argv[3]) if len(sys.argv) > 3 else 0)

    x = dio.u8_to_float(dio.read_raw_u8(infile))
    i, q = jnp.asarray(x[0::2]), jnp.asarray(x[1::2])

    rf = jnp.asarray(firdes.lpf(cfg.rf_fs, cfg.rf_fc, cfg.num_taps))
    k = cfg.num_taps
    # single-pass: convolve_full + "same" alignment, then decimate
    i_f = fir.convolve_full(i, rf)[..., k - 1:k - 1 + i.shape[-1]]
    q_f = fir.convolve_full(q, rf)[..., k - 1:k - 1 + q.shape[-1]]
    i_ds = fir.downsample(i_f, cfg.rf_decim)
    q_ds = fir.downsample(q_f, cfg.rf_decim)
    fm, _, _ = demod.fm_demod_diff(i_ds, q_ds, jnp.zeros(()), jnp.zeros(()))

    audio_h = jnp.asarray(firdes.lpf(cfg.if_fs * cfg.audio_up, cfg.audio_fc,
                                     cfg.audio_taps, up_factor=cfg.audio_up))
    up = fir.upsample(fm, cfg.audio_up) if cfg.audio_up > 1 else fm
    a_f = fir.convolve_full(up, audio_h)
    a_f = a_f[..., cfg.audio_taps - 1:cfg.audio_taps - 1 + up.shape[-1]]
    audio = fir.downsample(a_f, cfg.audio_down)

    dio.write_wav(outfile, np.asarray(audio), cfg.audio_fs)
    print(f"wrote {outfile}: {audio.shape[-1]} samples at "
          f"{cfg.audio_fs:.0f} Hz", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
