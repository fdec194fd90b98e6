import numpy as np
import pytest

from dy4tpu.rds import coding
from dy4tpu.rds.app import ApplicationLayer
from dy4tpu.rds.decoder import FrameSynchronizer, ManchesterDecoder, RDSDecoder


def test_crc_roundtrip_all_types():
    rng = np.random.default_rng(0)
    for t in coding.BLOCK_TYPES:
        for _ in range(20):
            msg = int(rng.integers(0, 1 << 16))
            blk = coding.encode_block(msg, t)
            assert coding.syndrome(blk) == coding.OFFSET_WORDS[t]
            # single-bit errors are detected
            for e in (0, 7, 25):
                assert coding.syndrome(blk ^ (1 << e)) != coding.OFFSET_WORDS[t]


def test_syndrome_matrix_matches_scalar():
    rng = np.random.default_rng(1)
    m = coding.syndrome_matrix()
    for _ in range(50):
        blk = int(rng.integers(0, 1 << 26))
        bits = np.array(coding.bits_of(blk, 26), np.int8)
        vec = coding.int_of((bits @ m) % 2)
        assert vec == coding.syndrome(blk)


def test_manchester_roundtrip():
    rng = np.random.default_rng(2)
    bits = list(rng.integers(0, 2, 400))
    halves = coding.manchester_halves(coding.differential_encode(bits))
    symbols = (halves > 0).astype(np.int8)

    dec = ManchesterDecoder(vote_blocks=1)
    # feed a vote block first (decoder needs one block to pick pairing)
    warm = symbols[:40]
    got = list(dec.push(warm))
    rest = []
    for i in range(40, len(symbols), 76):
        rest.extend(dec.push(symbols[i:i + 76]))
    # after warmup, decoded bits must match the tail of the source bits;
    # the very first differential bit is undefined (unknown bit_state at
    # the vote/decode boundary, as in the reference fmMonoBlock.py:596)
    rest = np.asarray(rest)
    src = np.asarray(bits[20:20 + len(rest)])
    np.testing.assert_array_equal(rest[1:], src[1:])


def test_manchester_vote_picks_shifted_phase():
    """If the symbol stream starts mid-pair the vote must flip pairing.

    Pair convention (fmMonoBlock.py:102-104): pairs are (s[i-1], s[i]) for
    i = start, start+2, ... — an unshifted stream pairs at start=1; dropping
    one leading half-symbol moves the true pairing to start=0.
    """
    rng = np.random.default_rng(3)
    bits = list(rng.integers(0, 2, 400))
    halves = coding.manchester_halves(coding.differential_encode(bits))
    symbols = (halves > 0).astype(np.int8)[1:]  # drop one half

    dec = ManchesterDecoder(vote_blocks=2)
    out = []
    for i in range(0, len(symbols) - 75, 76):
        out.extend(dec.push(symbols[i:i + 76]))
    assert dec.start == 0
    out = np.asarray(out)
    # decode starts after the 2 vote blocks (~bit 76); the decoded stream
    # must align with the source bits there (skip the undefined first bit)
    src = np.asarray(bits)
    found = any(np.array_equal(out[1:51], src[k:k + 50])
                for k in range(70, 84))
    assert found


def test_frame_sync_and_app_layer_bit_exact():
    pi, pty, ps = 0x54A8, 10, "DY4 TPU "
    bits = coding.make_ps_bitstream(pi, pty, ps, repeats=3)
    # prepend garbage so sync must search, inject one corrupted block
    rng = np.random.default_rng(4)
    stream = list(rng.integers(0, 2, 37)) + list(bits)

    app = ApplicationLayer()
    framer = FrameSynchronizer()
    groups = []
    for i in range(0, len(stream), 38):
        groups.extend(framer.push(np.asarray(stream[i:i + 38], np.int8)))
    for g in groups:
        app.process(g)

    assert len(groups) >= 8
    assert app.info.pi == pi
    assert app.info.pty == pty
    assert app.info.ps_name == ps
    # bit-exactness: every decoded group's blocks re-encode to valid blocks
    for g in groups:
        assert g.blocks["A"] == pi


def test_frame_sync_reacquires_after_bit_slip():
    pi, pty, ps = 0x1234, 5, "ABCDEFGH"
    bits = coding.make_ps_bitstream(pi, pty, ps, repeats=2)
    stream = list(bits) + [0] * 3 + list(bits)  # 3-bit slip in the middle

    framer = FrameSynchronizer()
    groups = list(framer.push(np.asarray(stream, np.int8)))
    # groups decoded both before and after the slip
    positions = [g.bit_position for g in groups]
    assert len(groups) >= 6
    assert max(positions) > len(bits) + 3


def test_full_decoder_with_cdr_resync():
    pi, pty, ps = 0xBEEF, 1, "NEWS1234"
    bits = coding.make_ps_bitstream(pi, pty, ps, repeats=4)
    halves = coding.manchester_halves(coding.differential_encode(bits))
    symbols = (halves > 0).astype(np.int8)

    dec = RDSDecoder()
    app = ApplicationLayer()
    n = 76
    for i in range(0, len(symbols) - n + 1, n):
        # resync on the second block: decoder must recover
        for g in dec.push_block(symbols[i:i + n], resync=(i == n)):
            app.process(g)
    assert app.info.pi == pi
    assert app.info.ps_name == ps


def test_radiotext_2a_roundtrip():
    """2A group radiotext: encode -> frame sync -> application layer
    (beyond-parity: the reference application layer stops at PS names)."""
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import FrameSynchronizer

    text = "DY4TPU RADIOTEXT DEMO"
    bits = np.array(coding.make_rt_bitstream(0xABCD, 4, text, repeats=3),
                    np.int8)
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(bits):
        app.process(g)
    assert app.info.pi == 0xABCD
    assert app.info.radiotext == text


def test_af_list_roundtrip():
    """0A alternative frequencies (method A): encode -> frame sync ->
    application layer recovers the full carrier list (beyond-parity:
    the reference application layer ignores block C entirely)."""
    from dy4tpu.rds.decoder import FrameSynchronizer

    afs = [98.5, 101.1, 107.9, 87.6]
    bits = np.array(coding.make_ps_bitstream(0x54A7, 10, "DY4TPU  ",
                                             repeats=3, af_mhz=afs),
                    np.int8)
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(bits):
        app.process(g)
    assert app.info.ps_name == "DY4TPU  "
    assert app.info.af_mhz == sorted(afs)


def test_af_lf_marker_not_misread_as_vhf():
    """A code following the 250 (LF/MF-follows) marker must not be
    decoded as a VHF carrier."""
    from dy4tpu.rds.decoder import Group

    app = ApplicationLayer()
    mk = lambda c: Group(blocks={"A": 0x1000, "B": 0 << 12, "C": c,
                                 "D": 0x2020}, bit_position=0)
    app.process(mk((225 << 8) | 250))   # count=1, then LF/MF marker
    app.process(mk((27 << 8) | 100))    # 27 = LF carrier code, then VHF
    assert app.info.af_mhz == [97.5]    # only code 100; 27 consumed


def test_0a_flags_ta_ms_di():
    """TA/MS and the segment-addressed DI bits decode from block B
    (spec 3.2.1.3-5; stereo flag d0 arrives with segment 3)."""
    from dy4tpu.rds.decoder import Group

    app = ApplicationLayer()
    for seg, di_bit in enumerate([1, 0, 0, 1]):    # d3=1 ... d0=1
        b = (0 << 12) | (1 << 4) | (0 << 3) | (di_bit << 2) | seg
        app.process(Group(blocks={"A": 0x1000, "B": b, "C": 0xE0E0,
                                  "D": 0x2020}, bit_position=0))
    assert app.info.ta == 1
    assert app.info.ms == 0
    assert app.info.di == 0b1001


def test_af_words_packing():
    assert coding.af_words([98.5]) == [((224 + 1) << 8) | 110]
    w = coding.af_words([98.5, 101.1])
    assert w == [((224 + 2) << 8) | 110, (136 << 8) | 205]
    with pytest.raises(ValueError):
        coding.af_words([87.5])


def test_radiotext_ab_flag_clears():
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import FrameSynchronizer

    bits = (coding.make_rt_bitstream(0x1000, 0, "FIRST TEXT", repeats=2,
                                     ab_flag=0)
            + coding.make_rt_bitstream(0x1000, 0, "NEW", repeats=2,
                                       ab_flag=1))
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(np.array(bits, np.int8)):
        app.process(g)
    assert app.info.radiotext == "NEW"


def test_mjd_roundtrip():
    """RDS annex-G MJD conversion round-trips across month/year edges."""
    for ymd in [(2026, 8, 17), (2000, 2, 29), (1999, 12, 31), (2024, 1, 1),
                (2030, 3, 1)]:
        mjd = coding.ymd_to_mjd(*ymd)
        assert coding.mjd_to_ymd(mjd) == ymd, (ymd, mjd)
    assert coding.ymd_to_mjd(2026, 8, 17) == 61269  # known MJD anchor


def test_clock_time_4a_roundtrip():
    """4A group clock-time: encode -> frame sync -> application layer
    (beyond-parity: the reference application layer stops at PS names)."""
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import FrameSynchronizer

    mjd = coding.ymd_to_mjd(2026, 8, 17)
    bits = (coding.make_group_4a(0x54A7, 10, mjd, 13, 37,
                                 offset_half_hours=-9)
            + coding.make_ps_bitstream(0x54A7, 10, "DY4TPU  "))
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(np.array(bits * 2, np.int8)):
        app.process(g)
    assert app.info.clock_time == (2026, 8, 17, 13, 37, -9)
    assert app.info.clock_time_str == "2026-08-17 13:37 UTC-4.5"


def test_radiotext_2b_roundtrip():
    """2B group radiotext (version B: 2 chars/group in block D, PI under
    the C' offset): encode -> frame sync -> application layer."""
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import FrameSynchronizer

    text = "VERSION B TEXT"
    bits = np.array(coding.make_rt_bitstream(0x54A7, 4, text, repeats=3,
                                             version="B"), np.int8)
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(bits):
        app.process(g)
    assert app.info.pi == 0x54A7
    assert app.info.rt_version == "B"
    assert app.info.radiotext == text


def test_radiotext_version_switch_clears():
    """Switching 2A -> 2B radiotext clears the accumulated segments."""
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import FrameSynchronizer

    bits = (coding.make_rt_bitstream(0x54A7, 4, "OLD TEXT A")
            + coding.make_rt_bitstream(0x54A7, 4, "NEWB", version="B"))
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(np.array(bits, np.int8)):
        app.process(g)
    assert app.info.radiotext == "NEWB"


def test_ptyn_10a_roundtrip():
    """10A programme type name: encode -> frame sync -> app layer."""
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import FrameSynchronizer

    bits = np.array(coding.make_ptyn_bitstream(0x54A7, 10, "FOOTBALL",
                                               repeats=2), np.int8)
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(bits):
        app.process(g)
    assert app.info.ptyn == "FOOTBALL"


def test_pin_1a_roundtrip():
    """1A programme item number (block D day/hour/minute)."""
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import FrameSynchronizer

    bits = np.array(coding.make_group_1a(0x54A7, 10, 17, 13, 37) * 2,
                    np.int8)
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(bits):
        app.process(g)
    assert app.info.pin == (17, 13, 37)
    assert app.info.pin_str == "day 17 13:37"


def test_oda_3a_announcement():
    """3A open-data announcement: records carrier group -> AID (e.g.
    RDS-TMC rides 8A with AID 0xCD46)."""
    from dy4tpu.rds.app import ApplicationLayer
    from dy4tpu.rds.decoder import FrameSynchronizer

    bits = np.array(coding.make_group_3a(0x54A7, 10, "8A", 0xCD46) * 2,
                    np.int8)
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(bits):
        app.process(g)
    assert app.info.oda == {"8A": 0xCD46}


def test_burst_error_table_is_exact():
    """All 367 bursts of <=5 bits have unique nonzero syndromes (the
    code's designed correction capability) and none equals an offset
    word, so correction can never alias a valid block of another type."""
    table = coding.burst_error_table()
    pats = set(int(e) for e in table if e >= 0)
    assert len(pats) == 367
    for off in coding.OFFSET_WORDS.values():
        assert table[off] == -1 or table[off] >= 0  # offsets unused below
    for t, off in coding.OFFSET_WORDS.items():
        # syndrome of a valid block is the offset word; table must not
        # claim it's a correctable error of the all-zero block
        assert int(table[off]) == -1


def test_frame_sync_burst_correction():
    """A <=5-bit burst inside a synced stream is repaired (group still
    decodes, payload exact); a 6-bit burst is not; correction off
    reproduces the drop."""
    from dy4tpu.rds.decoder import FrameSynchronizer

    bits = np.array(coding.make_ps_bitstream(0x54A7, 10, "DY4TPU  ",
                                             repeats=3), np.int8)

    def run(stream, **kw):
        fs = FrameSynchronizer(**kw)
        groups = list(fs.push(stream))
        return fs, groups

    fs0, clean = run(bits.copy())
    assert len(clean) == 12 and fs0.corrected == 0

    # burst of 5 in the C block of the 6th group (well inside sync)
    corrupt = bits.copy()
    pos = 5 * 104 + 2 * 26 + 7
    corrupt[pos:pos + 5] ^= np.array([1, 0, 1, 1, 1], np.int8)
    fs1, fixed = run(corrupt)
    assert fs1.corrected == 1
    assert [g.blocks for g in fixed] == [g.blocks for g in clean]

    # an error beyond the code's capability whose syndrome does NOT
    # alias a correctable burst -> block dropped.  (Bounded-distance
    # decoding: SOME >5-bit errors do alias and miscorrect — inherent
    # to the code, the spec's own capability statement.)
    table = coding.burst_error_table()
    wide = next(e for e in ((1 << 20) | (1 << 9) | m for m in range(64))
                if table[coding.syndrome(e)] == -1)
    corrupt6 = bits.copy()
    blk = corrupt6[5 * 104 + 2 * 26:5 * 104 + 3 * 26]
    blk ^= np.array(coding.bits_of(wide, 26), np.int8)
    fs2, dropped = run(corrupt6)
    assert fs2.corrected == 0
    # costs the damaged group AND (via the miss cascade -> resync) the
    # next one — exactly what correction saves
    assert len(dropped) <= len(clean) - 1

    # correction disabled reproduces the reference-style drop (same
    # miss-cascade cost as the uncorrectable error above)
    fs3, off = run(corrupt, correct_bursts=False)
    assert fs3.corrected == 0 and len(off) < len(clean)


def test_frame_sync_correction_not_used_for_acquisition():
    """Errors BEFORE sync never trigger correction (false-trap guard):
    acquisition still needs an exact block."""
    from dy4tpu.rds.decoder import FrameSynchronizer

    bits = np.array(coding.make_ps_bitstream(0x54A7, 10, "DY4TPU  ",
                                             repeats=2), np.int8)
    corrupt = bits.copy()
    corrupt[3] ^= 1            # error inside the very first block
    fs = FrameSynchronizer()
    groups = list(fs.push(corrupt))
    assert fs.corrected == 0   # first block dropped, sync from block 2
    assert len(groups) == len(list(FrameSynchronizer().push(bits))) - 1


def test_eon_14a_roundtrip():
    """14A EON: PS(ON), AF(ON), PTY/TA(ON) and PIN(ON) assemble under
    the other network's PI (spec 3.1.5.13)."""
    pi, pi_on = 0x54A7, 0x1FFF
    bits = np.array(coding.make_eon_bitstream(
        pi, 10, pi_on, "OTHERNET", af_on_mhz=(98.1, 101.5),
        pty_on=4, ta_on=1, pin_on=(12, 17, 30)) * 2, np.int8)
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(bits):
        app.process(g)
    assert pi_on in app.info.eon
    on = app.info.eon[pi_on]
    assert on.ps_name == "OTHERNET"
    assert on.af_mhz == [98.1, 101.5]
    assert on.pty == 4 and on.ta == 1
    assert on.pin == (12, 17, 30)
    assert app.info.pi == pi          # tuning station untouched


def test_eon_14b_changeover():
    """14B change-over switch: TA(ON) lands on the right EON record."""
    pi, pi_on = 0x54A7, 0x2ABC
    bits = np.array(coding.make_group_14b(pi, 10, pi_on, tp_on=1,
                                          ta_on=1) * 3, np.int8)
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(bits):
        app.process(g)
    on = app.info.eon[pi_on]
    assert on.ta == 1 and on.tp == 1


def test_fast_tuning_15b():
    """15B fast basic tuning: TA/MS/DI land without PS chars; block D
    repeats block B verbatim (spec 3.1.5.21)."""
    pi = 0x54A7
    bits = []
    for seg in range(4):
        bits.extend(coding.make_group_15b(pi, 7, seg, ta=1, ms=0,
                                          di=seg & 1))
    bits = np.array(bits * 2, np.int8)
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(bits):
        app.process(g)
    info = app.info
    assert info.pi == pi and info.pty == 7
    assert info.ta == 1 and info.ms == 0
    assert info.di == 0b0101          # d3..d0 from segments 0..3
    assert info.ps_name is None       # 15B carries no PS characters


def test_oda_payload_capture():
    """Announced ODA carrier groups (8A TMC) surface their raw 37-bit
    payloads; unannounced carriers are ignored."""
    pi = 0x54A7
    bits = list(coding.make_group_3a(pi, 10, "8A", 0xCD46))
    for k in range(3):
        bits.extend(coding.make_group_oda(pi, 10, "8A", k + 1,
                                          0x1234 + k, 0x5678 + k))
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(np.array(bits, np.int8)):
        app.process(g)
    assert app.info.oda_apps == {"8A": "RDS-TMC/Alert-C"}
    assert app.info.oda_payloads["8A"] == [
        (1, 0x1234, 0x5678), (2, 0x1235, 0x5679), (3, 0x1236, 0x567A)]


def test_pty_standard_tables():
    """PTY names under both standards: the default 'rds' table matches the
    reference's Program_Type_Codes (RDS_Application_layer.py:11-44, the
    European IEC 62106 list); 'rbds' selects the NRSC-4-B names."""
    from dy4tpu.rds import app as rds_app

    # spot-check the parity default against the reference's literals
    assert rds_app.pty_name(1) == "News"
    assert rds_app.pty_name(2) == "Current Affairs"
    assert rds_app.pty_name(10) == "Pop Music"
    assert rds_app.pty_name(31) == "Alarm"
    # the real North-American table diverges from code 2 upward
    assert rds_app.pty_name(2, "rbds") == "Information"
    assert rds_app.pty_name(9, "rbds") == "Top 40"
    assert rds_app.pty_name(31, "rbds") == "Emergency"
    assert rds_app.pty_name(None) is None
    assert len(rds_app.PTY_NAMES_RDS) == len(rds_app.PTY_NAMES_RBDS) == 32

    pi, pty, ps = 0x54A8, 10, "DY4 TPU "
    bits = coding.make_ps_bitstream(pi, pty, ps, repeats=2)
    for standard, name in (("rds", "Pop Music"), ("rbds", "Country")):
        app = ApplicationLayer(standard=standard)
        framer = FrameSynchronizer()
        for i in range(0, len(bits), 38):
            for g in framer.push(np.asarray(bits[i:i + 38], np.int8)):
                app.process(g)
        assert app.info.pty == pty
        assert app.info.pty_name == name

    with pytest.raises(ValueError):
        ApplicationLayer(standard="nrsc")


def test_rtplus_tags_resolve_against_radiotext():
    """RadioText+ (AID 0x4BD7 announced via 3A): tags are (start, length)
    windows into the 2A radiotext, cleared when the item toggle flips."""
    pi, pty = 0x54A7, 10
    text = "Now playing: Daydream by Wallace Collection"
    bits = []
    # radiotext first (pad to 64 chars happens segment-wise)
    padded = text.ljust(64)
    for seg in range(16):
        bits.extend(coding.make_group_2a(pi, pty, seg,
                                         padded[4 * seg:4 * seg + 4]))
    bits.extend(coding.make_group_3a(pi, pty, "12A", 0x4BD7))
    # ITEM.TITLE = "Daydream" (start 13 len 7), ITEM.BAND = "Wallace
    # Collection" (start 25, len 18)
    bits.extend(coding.make_group_rtplus(pi, pty, "12A",
                                         (1, 13, 7), (9, 25, 18),
                                         toggle=1))
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(np.array(bits, np.int8)):
        app.process(g)
    assert app.info.oda_apps["12A"] == "RadioText+"
    assert app.info.rtplus == {"ITEM.TITLE": "Daydream",
                               "ITEM.BAND": "Wallace Collection"}
    assert app.info.rtplus_running == 1

    # a new item (toggle flip) invalidates the old tags
    bits2 = coding.make_group_rtplus(pi, pty, "12A", (4, 0, 2), toggle=0)
    for g in fs.push(np.array(bits2, np.int8)):
        app.process(g)
    assert "ITEM.BAND" not in app.info.rtplus
    assert app.info.rtplus == {"ITEM.ARTIST": "Now"}


def test_tmc_single_group_decode():
    """RDS-TMC (AID 0xCD46 on 8A): single-group user messages decode to
    event/location/extent; tuning groups only count."""
    pi, pty = 0x54A7, 10
    bits = list(coding.make_group_3a(pi, pty, "8A", 0xCD46))
    bits.extend(coding.make_group_tmc_single(
        pi, pty, event=101, location=12345, extent=2, direction=1,
        diversion=1, duration=3))
    bits.extend(coding.make_group_tmc_single(pi, pty, event=701,
                                             location=777))
    # a tuning/system group (T bit set) must not be parsed as a message
    bits.extend(coding.make_group_oda(pi, pty, "8A", 0x10, 0, 0xABCD))
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(np.array(bits, np.int8)):
        app.process(g)
    assert app.info.oda_apps["8A"] == "RDS-TMC/Alert-C"
    assert app.info.tmc_messages[0] == {
        "event": 101, "location": 12345, "extent": 2, "direction": 1,
        "diversion": 1, "duration": 3}
    assert app.info.tmc_messages[1]["event"] == 701
    assert app.info.tmc_other == 1
    assert app.info.tmc_str[0] == ("stationary traffic at location 12345"
                                   " extent -2 (diversion advised)")
    assert app.info.tmc_str[1] == "roadworks at location 777"


def test_ert_utf8_decode():
    """Enhanced RadioText (AID 0x6552): 32x4-byte segments, UTF-8 per
    the 3A message's character-table bit, 0x0D-terminated — carries
    text the basic 2A table cannot (here a multi-byte character)."""
    pi, pty = 0x54A7, 10
    text = "Café ♫ now open".encode("utf-8") + b"\r"
    padded = text + b" " * (-len(text) % 4)
    bits = list(coding.make_group_3a(pi, pty, "11A", 0x6552, message=1))
    for seg in range(len(padded) // 4):
        bits.extend(coding.make_group_ert(pi, pty, "11A", seg,
                                          padded[4 * seg:4 * seg + 4]))
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(np.array(bits, np.int8)):
        app.process(g)
    assert app.info.oda_apps["11A"] == "Enhanced RadioText"
    assert app.info.ert == "Café ♫ now open"


def test_station_scheduler_interleaved_decode():
    """make_station_bitstream: every service decodes from ONE
    interleaved stream (what an off-air capture looks like), not the
    homogeneous per-service streams of the other helpers."""
    pi, pty = 0x54A7, 10
    rt = "Now: Daydream by Wallace Collection"
    bits = coding.make_station_bitstream(
        pi, pty, "DY4 FM  ", groups=120, radiotext=rt,
        rt_title="Daydream", rt_artist="Wallace Collection",
        af_mhz=(98.5, 101.1), ptyn="CLASSICS",
        clock=(2026, 8, 20, 12, 34, 4))
    fs = FrameSynchronizer()
    app = ApplicationLayer()
    for g in fs.push(np.array(bits, np.int8)):
        app.process(g)
    info = app.info
    assert info.pi == pi and info.pty == pty
    assert info.ps_name == "DY4 FM  "
    assert info.radiotext == rt
    assert info.rtplus == {"ITEM.TITLE": "Daydream",
                           "ITEM.ARTIST": "Wallace Collection"}
    assert info.af_mhz == [98.5, 101.1]
    assert info.ptyn == "CLASSICS"
    assert info.clock_time_str == "2026-08-20 12:34 UTC+2"
    assert info.oda_apps["12A"] == "RadioText+"
