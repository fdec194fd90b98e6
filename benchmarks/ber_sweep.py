"""RDS group error rate vs channel noise (the BASELINE "RDS group BER"
metric).

Synthesizes a mode-0 stereo+RDS broadcast at increasing additive IQ
noise, runs the full receiver chain, and reports per noise level:

* symbol error rate — decoded CDR hard symbols vs the transmitted
  bi-phase symbol stream (aligned by the known TX timing),
* group recovery rate — CRC-valid groups decoded / groups transmitted,
* PI correctness on the recovered groups.

The reference has no quantitative equivalent (validated by ear on
off-air captures, Final Report p.7 — its RDS lost sync at ~block 30 and
never re-locked on a clean capture); this sweep is the measured decode
margin of the TPU chain.

Run:  python -m benchmarks.ber_sweep   (CPU ok: DY4TPU_PLATFORM=cpu)
Env: BER_MODE (0 or 2 — mode 2 runs the SPS=27 constraint-table config,
VERDICT r2 item 8), BER_BLOCKS (default 32), BER_NOISE (comma list of
amplitudes), BER_CDR (peak = reference parity | envelope = the opt-in
square-law timing estimator, receiver._cdr), BER_CORRECT (0 disables
burst correction).
"""

import os

from dy4tpu.utils import jaxenv
jaxenv.setup()

import numpy as np
import jax
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver
from dy4tpu.rds import coding
from dy4tpu.rds.app import ApplicationLayer
from dy4tpu.rds.decoder import RDSDecoder
from dy4tpu.tx import fm

PI = 0x54A7


def run_level(cfg, params, n_blocks: int, noise: float, seed: int):
    n_audio = n_blocks * cfg.audio_per_block
    bits = coding.make_ps_bitstream(PI, 10, "BERSWEEP",
                                    repeats=max(2, n_blocks))
    iq = fm.synthesize(cfg, n_blocks,
                       left=fm.tone(800.0, cfg.audio_fs, n_audio, 0.6),
                       right=fm.tone(2400.0, cfg.audio_fs, n_audio, 0.6),
                       rds_bits=bits, noise=noise, seed=seed)
    state = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, cfg.block_size))
    # BER_CDR=envelope A/Bs the square-law timing estimator
    timing = os.environ.get("BER_CDR", "peak")

    def body(s, b):
        return receiver.receiver_step(params, s, b, cfg,
                                      cdr_timing=timing)

    _, outs = jax.jit(lambda s, b: jax.lax.scan(body, s, b))(
        state, blocks)

    syms = np.asarray(outs.rds_symbols)          # [B, spb]
    resync = np.asarray(outs.rds_resync)
    offs = np.asarray(outs.rds_offset)

    app = ApplicationLayer()
    correct = os.environ.get("BER_CORRECT", "1") != "0"
    dec = RDSDecoder(on_group=app.process, correct_bursts=correct)
    for b in range(n_blocks):
        dec.push_block(syms[b], resync=bool(resync[b]))

    # transmitted bi-phase symbol stream: exactly what the TX shaper
    # modulates (tx/fm.py:33-46); decoded hard symbols are compared over
    # the settled tail at the best alignment (the chain's group delay is
    # a fixed but mode-dependent number of symbols) and either polarity
    # (differential decoding makes polarity immaterial downstream)
    halves = coding.manchester_halves(coding.differential_encode(bits))
    tx_sym = (np.asarray(halves) > 0).astype(np.int8)
    rx = syms.ravel()
    spb = cfg.rds_symbols_per_block

    # A CDR re-acquisition that lands on a DIFFERENT sampling phase
    # shifts the downstream symbol alignment; a single best-lag over the
    # whole stream would book the post-resync stretch as errors even
    # when every group still decodes.  Align each offset-stable segment
    # independently (blocks 4.. to skip lock-in) and weight by length.
    cuts = [b for b in range(5, n_blocks)
            if resync[b] and offs[b] != offs[b - 1]]
    bounds = [4] + cuts + [n_blocks]
    err_total = 0.0
    n_total = 0
    for b0, b1 in zip(bounds, bounds[1:]):
        a = rx[b0 * spb:b1 * spb]
        if len(a) <= 100:
            continue
        best = 1.0
        for lag in range(-160, 161):          # rx delayed vs tx by the
            s = b0 * spb - lag                # chain's group delay
            if s < 0:
                continue
            n = min(len(a), len(tx_sym) - s)
            if n <= 100:
                continue
            t0 = tx_sym[s:s + n]
            err = float(np.mean(a[:n] != t0))
            best = min(best, err, 1.0 - err)
        err_total += best * len(a)
        n_total += len(a)
    best = err_total / max(n_total, 1)
    groups_tx = n_blocks * cfg.rds_symbols_per_block // (2 * 26 * 4)
    ok_groups = sum(1 for g in dec.groups if g.pi == PI)
    return best, ok_groups, groups_tx, app.info.pi_hex, dec.framer.corrected


def main():
    mode = int(os.environ.get("BER_MODE", 0))
    cfg = get_mode(mode)
    if not cfg.supports_rds:
        raise SystemExit(f"mode {mode} has no RDS path")
    params = receiver.make_params(cfg)
    n_blocks = int(os.environ.get("BER_BLOCKS", 32))
    levels = [float(x) for x in os.environ.get(
        "BER_NOISE", "0,0.2,0.4,0.5,0.6,0.8").split(",")]
    print(f"mode {mode} (SPS={cfg.rds_sps}), {n_blocks} blocks "
          f"({n_blocks * cfg.rds_symbols_per_block // 2} data bits); "
          f"noise = additive IQ amplitude vs unit FM envelope")
    print(f"{'noise':>6s} {'~SNR dB':>8s} {'sym BER':>9s} "
          f"{'groups ok/tx':>13s} {'PI':>6s} {'fixed':>6s}")
    for nz in levels:
        ber, ok, tx, pi, fixed = run_level(cfg, params, n_blocks, nz,
                                           seed=7)
        snr = "inf" if nz == 0 else f"{20 * np.log10(1.0 / nz):.1f}"
        print(f"{nz:6.2f} {snr:>8s} {ber:9.4f} {ok:6d}/{tx:<6d} "
              f"{pi or '--':>6s} {fixed:6d}")


if __name__ == "__main__":
    main()
