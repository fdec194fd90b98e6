"""Mode table invariants (the constraints the reference hand-checks)."""

import pytest

from dy4tpu.config import MODES, get_mode


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_mode_geometry(mode):
    cfg = get_mode(mode)
    # block duration inside the course window (constraints pdf p.1)
    ms = 1000.0 * cfg.iq_per_block / cfg.rf_fs
    assert 22.0 <= ms <= 44.0
    # every stage produces an integer number of outputs per block
    assert cfg.iq_per_block % cfg.rf_decim == 0
    assert (cfg.if_per_block * cfg.audio_up) % cfg.audio_down == 0
    # audio rate round-trips through the polyphase factors
    assert cfg.if_fs * cfg.audio_up / cfg.audio_down == pytest.approx(
        cfg.audio_fs)
    if cfg.supports_rds:
        assert cfg.rds_per_block % cfg.rds_sps == 0
        assert cfg.rds_fs == cfg.rds_sps * 2375.0
        # 114.5 kHz carrier must sit below IF Nyquist
        assert cfg.if_fs / 2 > 114.5e3


def test_rds_only_modes_0_and_2():
    assert [m for m in sorted(MODES) if get_mode(m).supports_rds] == [0, 2]


def test_invalid_mode_rejected():
    with pytest.raises(ValueError, match="mode must be 0-3"):
        get_mode(7)


def test_mode3_keeps_as_built_deviation():
    """Mode 3 IF = 384 kS/s (rf_decim 5), the reference's documented
    as-built deviation (Final Report p.1; project.cpp:215-225)."""
    cfg = get_mode(3)
    assert cfg.if_fs == pytest.approx(384e3)
