"""Mode-2 RDS hardening: SPS=27, odd 95 symbols/block, CDR dropouts.

The constraints define SPS=27 for mode 2 (constraints pdf p.1) — the
configuration the reference's CDR had latent bugs in
(model/fmSupportLib.py:209-247: searched offsets in [0, 2*sps) silently
drop a sample, and the resync path assumes even symbols/block).  This
property test forces CDR re-acquisitions at adversarial stream
positions and demands bit-exact group decode after every re-lock
(VERDICT r1 item 5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dy4tpu.config import get_mode
from dy4tpu.pipeline import receiver
from dy4tpu.rds import coding
from dy4tpu.rds.decoder import RDSDecoder
from dy4tpu.tx import fm

PI, PTY, PS = 0x2A95, 7, "MODE2 95"

cfg = get_mode(2)


@pytest.fixture(scope="module")
def mode2_run():
    """One mode-2 broadcast with two forced dropouts at adversarial
    positions: (a) aligned to a block edge, (b) starting mid-block and
    ending mid-symbol (prime sample offset)."""
    n_blocks = 52
    assert cfg.rds_symbols_per_block % 2 == 1, "mode 2 must be odd sym/blk"
    bits = coding.make_ps_bitstream(PI, PTY, PS, repeats=80)
    iq = fm.synthesize(cfg, n_blocks, rds_bits=bits).copy()

    bs = cfg.block_size
    # dropout A: exactly blocks [14, 16) (edge-aligned)
    iq[14 * bs:16 * bs] = 128
    # dropout B: 1.4 blocks starting at a prime offset inside block 30
    start = 30 * bs + 20011 * 2
    iq[start:start + int(1.4 * bs) // 2 * 2] = 128

    params = receiver.make_params(cfg)
    state = receiver.init_state(cfg)
    blocks = jnp.asarray(iq.reshape(n_blocks, bs))
    _, outs = jax.jit(
        lambda s, b: receiver.run_blocks(params, s, b, cfg))(state, blocks)
    return (n_blocks,
            np.asarray(outs.rds_symbols),
            np.asarray(outs.rds_resync),
            np.asarray(outs.rds_offset))


def _decode(n_blocks, symbols, resync, offsets, use_offsets):
    dec = RDSDecoder()
    per_block_groups = []
    for k in range(n_blocks):
        gs = dec.push_block(symbols[k], bool(resync[k]),
                            offset=int(offsets[k]) if use_offsets else None)
        per_block_groups.append(gs)
    return dec, per_block_groups


def test_cdr_reacquires_after_each_dropout(mode2_run):
    n_blocks, symbols, resync, offsets = mode2_run
    # the amplitude sanity check must trip inside each dropout region
    assert resync[15:18].any(), "no resync after edge-aligned dropout"
    assert resync[31:34].any(), "no resync after mid-block dropout"
    # and the CDR must re-lock (no permanent resync storm)
    assert not resync[24:30].any()
    assert not resync[40:].any()


def test_groups_bit_exact_after_each_relock(mode2_run):
    """Every decoded group in every lock period carries the exact PI —
    bit-exact group decode across odd-symbol re-locks."""
    n_blocks, symbols, resync, offsets = mode2_run
    dec, per_block = _decode(n_blocks, symbols, resync, offsets,
                             use_offsets=True)
    assert len(dec.groups) >= 8
    bad = [g for g in dec.groups if g.blocks["A"] != PI]
    assert not bad, f"{len(bad)}/{len(dec.groups)} corrupted groups"
    # decode must resume after BOTH dropouts, not just the first
    after_b = sum(len(per_block[k]) for k in range(36, n_blocks))
    assert after_b >= 2, "no groups decoded after second dropout"


def test_same_phase_resync_keeps_continuity(mode2_run):
    """A re-acquisition landing on the SAME CDR phase must not cost more
    groups than one landing on a different phase: the offset-gated reset
    (RDSDecoder(offset=...)) decodes at least as many groups as the
    raw-resync reset, and identical group content where they overlap."""
    n_blocks, symbols, resync, offsets = mode2_run
    gated, _ = _decode(n_blocks, symbols, resync, offsets, use_offsets=True)
    raw, _ = _decode(n_blocks, symbols, resync, offsets, use_offsets=False)
    assert len(gated.groups) >= len(raw.groups)
    for g in gated.groups:
        assert g.blocks["A"] == PI
    # overlapping groups (matched by bit position) must agree exactly
    raw_by_pos = {g.bit_position: g.blocks for g in raw.groups}
    both = [g for g in gated.groups if g.bit_position in raw_by_pos]
    for g in both:
        assert g.blocks == raw_by_pos[g.bit_position]


def test_fleet_matches_scalar_on_mode2_dropouts(mode2_run):
    """The vectorized fleet layer reproduces the scalar decoder on the
    odd-symbol dropout stream (offsets-gated reset)."""
    from dy4tpu.rds.fleet import FleetDecoder
    from dy4tpu.runtime import native
    if not native.available():
        pytest.skip("native runtime not built")
    n_blocks, symbols, resync, offsets = mode2_run
    scalar, _ = _decode(n_blocks, symbols, resync, offsets,
                        use_offsets=True)
    fleet = FleetDecoder(2)
    for k in range(n_blocks):
        fleet.push_block(np.stack([symbols[k], symbols[k]]),
                         resync=np.array([resync[k], resync[k]]),
                         offsets=np.array([offsets[k], offsets[k]]))
    for ch in range(2):
        assert len(fleet.groups[ch]) == len(scalar.groups)
        for a, b in zip(fleet.groups[ch], scalar.groups):
            assert a.blocks == b.blocks and a.bit_position == b.bit_position
