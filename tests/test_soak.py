"""Long-stream soak property test (VERDICT r4 item 7).

The receiver claims unbounded streaming: PLL phase accumulators wrapped
mod 4*pi (ops/pll.py — the reference lets its float accumulators grow
without bound, src/filter.cpp:213-214 / fmMonoBlock.py:441ff), pure
carried state, bit-transparent checkpoint/resume.  The longest ordinary
test streams are ~10^2 blocks; this one scans ~10^4 mode-0 blocks
(~5.3 hours of broadcast at 2.4 MS/s) by looping a short synthesized
broadcast through the jitted chunk scan with carried state, and checks:

  (a) every float state leaf stays finite and the PLL accumulators stay
      inside their wrap bounds — no drift, no blow-up;
  (b) checkpoint/resume at an arbitrary deep block is bit-transparent
      (utils.checkpoint round-trip through disk, then identical outputs);
  (c) RDS stays locked: the application layer decodes the correct PI/PS
      from the LAST chunk of the soak, with no CDR resyncs after
      acquisition.

Runtime: ~2 min on one CPU core (C=1, 25-block cycles, jit-compiled
once) — hours-equivalent coverage via stream length, not wall time.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver
from dy4tpu.rds import coding
from dy4tpu.tx import fm
from dy4tpu.utils import checkpoint as ckpt

PI_CODE = 0x54A7
CYCLE = 25          # blocks per jitted scan
CYCLES = 400        # 400 * 25 = 10,000 blocks ~ 5.3 h of stream
CKPT_AT = 300       # checkpoint/resume round-trip at block 7,500
WRAP = 4.0 * np.pi


@pytest.mark.slow
@pytest.mark.parametrize("mode,cycles,timing", [
    (0, CYCLES, "peak"),      # reference-parity CDR, ~10^4 blocks
    (2, 200, "envelope"),     # SPS=27 + the robust whole-block timing
])
def test_soak_10k_blocks(tmp_path, mode, cycles, timing):
    cfg = get_mode(mode)
    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg, batch=(1,))

    n_audio = CYCLE * cfg.audio_per_block
    bits = coding.make_ps_bitstream(PI_CODE, 10, "SOAKSOAK",
                                    repeats=3 * CYCLE)
    iq = fm.synthesize(
        cfg, CYCLE,
        left=fm.tone(800.0, cfg.audio_fs, n_audio, amp=0.7),
        right=fm.tone(2400.0, cfg.audio_fs, n_audio, amp=0.7),
        rds_bits=bits)
    blocks = jnp.asarray(iq.reshape(CYCLE, 1, cfg.block_size))

    @jax.jit
    def run(st, bl):
        def body(s, b):
            s, o = receiver.receiver_step(params, s, b, cfg,
                                          cdr_timing=timing)
            return s, (o.mono[..., :4], o.rds_symbols, o.rds_resync)
        return lax.scan(body, st, bl)

    def assert_bounded(st, where):
        for path, leaf in jax.tree_util.tree_flatten_with_path(st)[0]:
            a = np.asarray(leaf)
            if np.issubdtype(a.dtype, np.floating):
                assert np.all(np.isfinite(a)), (where, path)
        # the wrap invariant that makes streaming unbounded: one wrap
        # step per iteration keeps the accumulators in [-WRAP, 2*WRAP)
        # even transiently; a drifting accumulator would leave the band
        # within a few hundred blocks
        for pll_st in (st.audio.pll, st.rds.pll):
            for leaf in (pll_st.phase_est, pll_st.angle):
                a = np.asarray(leaf)
                assert np.all(np.abs(a) <= 2 * WRAP + 1.0), (where, a)

    ckpt_at = min(CKPT_AT, (3 * cycles) // 4)
    resumed = None
    resumed_outs = []
    direct_outs = []
    for cycle in range(cycles):
        state, outs = run(state, blocks)
        if cycle % 100 == 99:
            assert_bounded(state, f"cycle {cycle}")
        if cycle == ckpt_at - 1:
            # (b) checkpoint through disk at block ckpt_at*CYCLE
            path = str(tmp_path / "soak.ckpt")
            ckpt.save(path, state, meta={"block": ckpt_at * CYCLE})
            resumed, _, meta = ckpt.load(path)
            assert meta["block"] == ckpt_at * CYCLE
        if resumed is not None and cycle >= ckpt_at:
            direct_outs.append(jax.tree.map(np.asarray, outs))
            resumed, routs = run(resumed, blocks)
            resumed_outs.append(jax.tree.map(np.asarray, routs))
            if cycle == ckpt_at + 2:
                for d, r in zip(direct_outs, resumed_outs):
                    for a, b in zip(d, r):
                        np.testing.assert_array_equal(a, b)
                # resumed state equals the live one bit-for-bit too
                for a, b in zip(jax.tree.leaves(state),
                                jax.tree.leaves(resumed)):
                    np.testing.assert_array_equal(np.asarray(a),
                                                  np.asarray(b))
                resumed = None   # round-trip proven; stop the twin

    assert_bounded(state, "final")

    # (c) RDS still locked after ~10^4 blocks: decode the final cycle
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import RDSDecoder
    _, syms, resync = (np.asarray(o) for o in outs)
    assert not resync.any(), "CDR lost lock during the soak's last cycle"
    app = ApplicationLayer()
    dec = RDSDecoder(on_group=app.process)
    for b in range(CYCLE):
        dec.push_block(syms[b, 0], resync=False)
    assert app.info.pi_hex == f"{PI_CODE:04X}", app.info
    assert (app.info.ps_name or "").strip() == "SOAKSOAK"
