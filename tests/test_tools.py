"""Subprocess smoke tests for the developer tools."""

import os
import subprocess
import sys

import numpy as np
import pytest

from dy4tpu.config import get_mode

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "DY4TPU_PLATFORM": "cpu"}


def _run(mod, args, timeout=600):
    return subprocess.run([sys.executable, "-m", mod, *args],
                          capture_output=True, cwd=REPO, env=ENV,
                          timeout=timeout)


@pytest.mark.slow
def test_synth_then_fleet_roundtrip(tmp_path):
    cap = str(tmp_path / "st.raw")
    p = _run("dy4tpu.tools.synth",
             [cap, "--mode", "0", "--blocks", "20", "--pi", "0x0A0B",
              "--ps", "TOOLTEST"])
    assert p.returncode == 0, p.stderr.decode()
    cfg = get_mode(0)
    assert os.path.getsize(cap) == 20 * cfg.block_size

    p = _run("dy4tpu.tools.fleet", ["--mode", "0", cap, cap])
    assert p.returncode == 0, p.stderr.decode()
    err = p.stderr.decode()
    assert err.count("PI=0A0B") == 2, err
    assert "2 stations" in err


def test_ratechange_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    src = str(tmp_path / "in.raw")
    dst = str(tmp_path / "out.raw")
    rng.integers(0, 256, 2 * 240000, dtype=np.uint8).tofile(src)
    p = _run("dy4tpu.tools.ratechange", [src, dst, "--to", "1440"])
    assert p.returncode == 0, p.stderr.decode()
    assert os.path.getsize(dst) == 2 * 144000


def test_psdview_headless(tmp_path):
    pytest.importorskip("matplotlib")
    cap = str(tmp_path / "c.raw")
    png = str(tmp_path / "psd.png")
    np.random.default_rng(0).integers(
        0, 256, 2 * get_mode(0).block_size, dtype=np.uint8).tofile(cap)
    p = _run("dy4tpu.tools.psdview",
             [cap, "--mode", "0", "--blocks", "2", "--out", png])
    assert p.returncode == 0, p.stderr.decode()
    assert os.path.getsize(png) > 10000


def test_psdview_animate_frames_and_gif(tmp_path):
    """--animate renders one frame per block (fmMonoAnim.py:44-93
    parity): PNG sequence via %d pattern, animated GIF via .gif."""
    pytest.importorskip("matplotlib")
    cap = str(tmp_path / "c.raw")
    np.random.default_rng(0).integers(
        0, 256, 3 * 2 * get_mode(0).block_size, dtype=np.uint8).tofile(cap)
    pat = str(tmp_path / "frame_%02d.png")
    p = _run("dy4tpu.tools.psdview",
             [cap, "--mode", "0", "--blocks", "3", "--animate",
              "--out", pat])
    assert p.returncode == 0, p.stderr.decode()
    for b in range(3):
        assert os.path.getsize(pat % b) > 5000

    gif = str(tmp_path / "psd.gif")
    p = _run("dy4tpu.tools.psdview",
             [cap, "--mode", "0", "--blocks", "3", "--animate",
              "--out", gif])
    assert p.returncode == 0, p.stderr.decode()
    assert os.path.getsize(gif) > 10000


@pytest.mark.slow
@pytest.mark.parametrize("radio_mode", ["0", "1"])
def test_bench_cli_smoke(radio_mode):
    """bench.py (the driver-facing benchmark CLI) prints exactly one
    JSON line for any BENCH_RADIO_MODE, on tiny CPU shapes."""
    import json
    import subprocess
    env = {**ENV, "BENCH_RADIO_MODE": radio_mode, "BENCH_CHANNELS": "2",
           "BENCH_BLOCKS": "2", "BENCH_REPEATS": "1", "BENCH_VALIDATE": "0"}
    p = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       cwd=REPO, env=env, timeout=600)
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    lines = p.stdout.decode().strip().splitlines()
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec["metric"] == (f"mode{radio_mode}"
                             "_full_chain_iq_throughput_per_chip")
    assert rec["value"] > 0 and rec["unit"] == "MS/s"


@pytest.mark.slow
def test_synth_wideband_then_decode_roundtrip(tmp_path):
    """synth --wideband -> tools.wideband: scan finds the stations,
    decode recovers each one's RDS PI/PS from ONE band capture."""
    cap = str(tmp_path / "band.raw")
    p = _run("dy4tpu.tools.synth",
             [cap, "--mode", "0", "--wideband", "4",
              "--stations", "1,3", "--blocks", "30"])
    assert p.returncode == 0, p.stderr.decode()
    cfg = get_mode(0)
    assert os.path.getsize(cap) == 30 * 2 * 4 * cfg.if_per_block

    p = _run("dy4tpu.tools.wideband",
             [cap, "--mode", "0", "--channels", "4", "--scan"])
    assert p.returncode == 0, p.stderr.decode()
    scan = p.stderr.decode()
    for ch, live in enumerate([False, True, False, True]):
        line = next(l for l in scan.splitlines() if l.startswith(f"ch   {ch}"))
        assert line.rstrip().endswith("*") == live, scan

    out = tmp_path / "decoded"
    p = _run("dy4tpu.tools.wideband",
             [cap, "--mode", "0", "--channels", "4", "--out-dir", str(out)])
    assert p.returncode == 0, p.stderr.decode()
    err = p.stderr.decode()
    assert "PI=5401 PS='WB CH-01'" in err, err
    assert "PI=5403 PS='WB CH-03'" in err, err
    assert (out / "station001.wav").exists()
    assert (out / "station003.wav").exists()
    assert not (out / "station000.wav").exists()  # squelched


def test_bench_wideband_smoke():
    """BENCH_MODE=wideband prints one JSON line on tiny CPU shapes."""
    import json
    env = {**ENV, "BENCH_MODE": "wideband", "BENCH_WB_CHANNELS": "4",
           "BENCH_BLOCKS": "2", "BENCH_REPEATS": "1", "BENCH_VALIDATE": "0"}
    p = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       cwd=REPO, env=env, timeout=600)
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    lines = p.stdout.decode().strip().splitlines()
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec["metric"] == "wideband_channelizer_4ch_iq_throughput_per_chip"
    assert rec["value"] > 0 and rec["unit"] == "MS/s"


def test_synth_impairment_flags(tmp_path):
    """--dc / --iq-imbalance / --multipath thread the tx fault models
    through to a decodable capture (the receiver's --iqcorr target)."""
    cfg = get_mode(0)
    # dc alone: the offsets must land as u8 lane-mean shifts (~15 LSB
    # +- the FM carrier-line component)
    cap = str(tmp_path / "dc.raw")
    p = _run("dy4tpu.tools.synth",
             [cap, "--mode", "0", "--blocks", "4",
              "--dc", "0.1", "-0.05"])
    assert p.returncode == 0, p.stderr.decode()
    iq = np.fromfile(cap, np.uint8)
    assert len(iq) == 4 * cfg.block_size
    assert 6.0 < iq[0::2].mean() - iq[1::2].mean() < 24.0

    # all three fault models together still parse and differ from dc-only
    cap2 = str(tmp_path / "fault.raw")
    p = _run("dy4tpu.tools.synth",
             [cap2, "--mode", "0", "--blocks", "4",
              "--dc", "0.1", "-0.05", "--iq-imbalance", "0.75", "20",
              "--multipath", "24:0.4:120,60:0.2"])
    assert p.returncode == 0, p.stderr.decode()
    iq2 = np.fromfile(cap2, np.uint8)
    assert len(iq2) == len(iq) and not np.array_equal(iq, iq2)
