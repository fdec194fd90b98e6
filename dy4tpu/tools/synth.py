"""Capture synthesiser CLI — fabricate test broadcasts.

The reference relies on an RTL-SDR dongle or pre-recorded captures
(constraints pdf p.2-3); this tool generates spec-shaped multiplex
captures from the framework's transmitter so any mode/path can be
exercised end-to-end without hardware:

    python -m dy4tpu.tools.synth out.raw --mode 0 --blocks 20 \
        --left 800 --right 2400 --pi 0xF205 --ps "DY4 TPU!"
    cat out.raw | python -m dy4tpu 0 r
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="synthesize a u8 IQ FM broadcast capture")
    p.add_argument("outfile")
    p.add_argument("--mode", type=int, default=0, choices=[0, 1, 2, 3])
    p.add_argument("--blocks", type=int, default=20)
    p.add_argument("--left", type=float, default=800.0,
                   help="left-channel tone in Hz (0 = silence)")
    p.add_argument("--right", type=float, default=2400.0,
                   help="right-channel tone in Hz (0 = silence)")
    p.add_argument("--pi", type=lambda s: int(s, 0), default=None,
                   help="RDS programme identification, e.g. 0xF205")
    p.add_argument("--ps", default="DY4 TPU!",
                   help="8-char RDS programme-service name")
    p.add_argument("--pty", type=int, default=10)
    p.add_argument("--noise", type=float, default=0.0,
                   help="additive IQ noise sigma")
    args = p.parse_args(argv)

    from dy4tpu.config import get_mode
    from dy4tpu.rds import coding
    from dy4tpu.tx import fm

    cfg = get_mode(args.mode)
    n_audio = args.blocks * cfg.audio_per_block
    left = (fm.tone(args.left, cfg.audio_fs, n_audio, amp=0.7)
            if args.left else None)
    right = (fm.tone(args.right, cfg.audio_fs, n_audio, amp=0.7)
             if args.right else None)
    bits = None
    if args.pi is not None:
        if not cfg.supports_rds:
            print(f"mode {args.mode} does not support RDS", file=sys.stderr)
            return 2
        ps = (args.ps + " " * 8)[:8]
        repeats = max(8, int(args.blocks * cfg.audio_per_block
                             / cfg.audio_fs * 1187.5 / 104) + 8)
        bits = coding.make_ps_bitstream(args.pi, args.pty, ps,
                                        repeats=repeats)
    iq = fm.synthesize(cfg, args.blocks, left=left, right=right,
                       rds_bits=bits, noise=args.noise)
    iq.tofile(args.outfile)
    secs = args.blocks * cfg.iq_per_block / cfg.rf_fs
    print(f"wrote {args.outfile}: mode {args.mode}, {args.blocks} blocks "
          f"({secs:.2f}s of broadcast, {len(iq)} bytes)"
          + (f", RDS PI={args.pi:04X} PS={ps!r}" if bits is not None
             else ""),
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
