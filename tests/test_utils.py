"""Host utility coverage: stream/file I/O, gnuplot logging, generators."""

import io as pyio
import os

import numpy as np

from dy4tpu.utils import gen
from dy4tpu.utils import io as dio
from dy4tpu.utils import logging as dlog


def test_read_iq_blocks_drops_partial_tail():
    data = bytes(range(250))
    blocks = list(dio.read_iq_blocks(pyio.BytesIO(data), 100))
    assert len(blocks) == 2
    np.testing.assert_array_equal(blocks[0],
                                  np.frombuffer(data[:100], np.uint8))


def test_u8_float_roundtrip():
    x = np.arange(256, dtype=np.uint8)
    f = dio.u8_to_float(x)
    assert f.min() == -1.0 and f.max() == 127 / 128
    np.testing.assert_array_equal(dio.float_to_u8(f), x)


def test_bin_f32_roundtrip(tmp_path):
    p = str(tmp_path / "x.bin")
    x = np.random.default_rng(0).standard_normal(100).astype(np.float32)
    dio.write_bin_f32(p, x)
    np.testing.assert_array_equal(dio.read_bin_f32(p), x)


def test_wav_roundtrip_stereo(tmp_path):
    p = str(tmp_path / "x.wav")
    a = np.stack([gen.generate_sin(48e3, 440, 480, 0.5),
                  gen.generate_sin(48e3, 880, 480, 0.5)], axis=1)
    dio.write_wav(p, a, 48e3)
    back, fs = dio.read_wav(p)
    assert fs == 48000 and back.shape == (480, 2)
    np.testing.assert_allclose(back, a, atol=1e-3)


def test_log_vector_gnuplot_format(tmp_path):
    path = dlog.log_vector("demo", None, [1.5, -2.25, 3.0],
                           directory=str(tmp_path))
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 3
    x0, y0 = lines[0].split()
    assert float(x0) == 0.0 and float(y0) == 1.5


def test_log_psd_writes_bins(tmp_path):
    x = gen.generate_sin(48e3, 1000, 4096)
    path = dlog.log_psd("psd", x, 48e3, nfft=512, directory=str(tmp_path))
    assert os.path.exists(path)
    assert len(open(path).read().strip().splitlines()) == 256


def test_generators_match_reference_semantics():
    s = gen.generate_sin(1000.0, 100.0, 10, amp=2.0)
    assert s.shape == (10,) and abs(s[0]) < 1e-6
    total = gen.add_sin([s, s])
    np.testing.assert_allclose(total, 2 * s)
    r = gen.generate_random_samples(1000, max_abs=5.0, precision=1, seed=3)
    assert np.all(np.abs(r) <= 5.0)
    np.testing.assert_allclose(r, np.round(r, 1))
