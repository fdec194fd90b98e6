"""PSD inspection tool — the fmMonoAnim.py equivalent.

Walks a u8 IQ capture block by block through the receiver front end and
renders per-block PSDs (RF input, FM demod, selected taps) either as an
interactive matplotlib animation or, headless, as a PNG sequence / single
summary PNG (model/fmMonoAnim.py:44-141; fmPlotPSD fmSupportLib.py:164-192).

    python -m dy4tpu.tools.psdview capture.raw --mode 0 --out psd.png
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="per-block PSD inspection")
    p.add_argument("infile", help="u8 interleaved IQ capture")
    p.add_argument("--mode", type=int, default=0, choices=[0, 1, 2, 3])
    p.add_argument("--blocks", type=int, default=8,
                   help="number of blocks to process")
    p.add_argument("--block", type=int, default=None,
                   help="render only this block index (default: last)")
    p.add_argument("--out", default=None,
                   help="write PNG here instead of showing a window")
    p.add_argument("--nfft", type=int, default=512)
    args = p.parse_args(argv)

    try:
        import matplotlib
        if args.out:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available", file=sys.stderr)
        return 1

    from dy4tpu.utils import jaxenv
    jaxenv.setup()

    import jax.numpy as jnp
    from dy4tpu.config import get_mode
    from dy4tpu.ops import fft
    from dy4tpu.pipeline import receiver
    from dy4tpu.utils import io as dio

    cfg = get_mode(args.mode)
    iq = dio.read_raw_u8(args.infile)
    n_blocks = min(args.blocks, len(iq) // cfg.block_size)
    if n_blocks == 0:
        print("capture shorter than one block", file=sys.stderr)
        return 1
    show = args.block if args.block is not None else n_blocks - 1

    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    fig, axes = plt.subplots(3, 1, figsize=(9, 9))
    for b in range(n_blocks):
        blk = jnp.asarray(iq[b * cfg.block_size:(b + 1) * cfg.block_size])
        # tap the IF signal by re-deriving it (front end only)
        x = (blk.astype(jnp.float32) - 128.0) / 128.0
        i, q = x[0::2], x[1::2]
        state, outs = receiver.receiver_step(params, state, blk, cfg)
        if b != show:
            continue
        f1, p1 = fft.estimate_psd(i, nfft=args.nfft, fs=cfg.rf_fs)
        axes[0].plot(f1 / 1e3, np.asarray(p1))
        axes[0].set_title(f"RF input I (block {b})")
        mono = np.asarray(outs.mono)
        f3, p3 = fft.estimate_psd(jnp.asarray(mono), nfft=min(args.nfft,
                                                              len(mono)),
                                  fs=cfg.audio_fs)
        axes[2].plot(f3 / 1e3, np.asarray(p3))
        axes[2].set_title("mono audio")
        if outs.rds_bb_i is not None:
            bb = np.asarray(outs.rds_bb_i)
            f2, p2 = fft.estimate_psd(jnp.asarray(bb),
                                      nfft=min(args.nfft, len(bb)),
                                      fs=cfg.rds_fs)
            axes[1].plot(f2 / 1e3, np.asarray(p2))
            axes[1].set_title("RDS baseband (post-RRC)")
    for ax in axes:
        ax.set_xlabel("kHz")
        ax.set_ylabel("dB/Hz")
        ax.grid(True)
    fig.tight_layout()
    if args.out:
        fig.savefig(args.out, dpi=110)
        print(f"wrote {args.out}", file=sys.stderr)
    else:
        plt.show()
    return 0


if __name__ == "__main__":
    sys.exit(main())
