"""System-fidelity SILK tier (data/system_codecs.py; the degrade
default since round 5 via fidelity="auto" when libopus loads): real
SILK-mode Opus through the in-image libopus/libavcodec for the
reference's silk*/silkwb* vocabulary entries
(/root/reference/channel_simulation/simulated_channel.py:19-38).

Skipped wholesale when the system libraries are absent — the default
pipeline (native ACELP tier) never touches this module."""

import os

import numpy as np
import pytest

from asvspoof2021_air_tpu.data import system_codecs as sc

pytestmark = pytest.mark.skipif(
    not sc.available(), reason="in-image libavcodec/libopus not loadable")


def _speechlike(n=16000, sr=16000, seed=0):
    g = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.sin(2 * np.pi * 520 * t)
         + 0.04 * g.standard_normal(n))
    return x.astype(np.float32)


def test_packets_are_silk_only_at_silk_bitrates():
    """application=voip at SILK-ladder bitrates must keep Opus in its
    SILK layer: every packet TOC config <= 11 (RFC 6716 section 3.1)."""
    x = _speechlike()
    pcm = np.clip(np.rint(x[:8000] * 32768), -32768, 32767).astype(np.int16)
    for kbps in (6.0, 12.0, 20.0):
        pkts = sc.opus_silk_packets(pcm, 8000, kbps)
        assert len(pkts) >= 40  # ~50 x 20 ms frames in 1 s
        assert sc.silk_mode_fraction(pkts) == 1.0, kbps


def test_channel_roundtrip_preserves_signal_and_degrades_it():
    x = _speechlike()
    y = sc.opus_silk_channel(x, 8000, 12.0, 16000)
    assert y.shape == x.shape and y.dtype == np.float32
    assert np.isfinite(y).all()
    c = float(np.corrcoef(x, y)[0, 1])
    assert c > 0.8, c  # intelligible after delay alignment
    assert not np.allclose(y, x)  # and actually a lossy codec


def test_wideband_ladder_runs_at_16k():
    x = _speechlike()
    y = sc.opus_silk_channel(x, 16000, 20.0, 16000)
    assert y.shape == x.shape
    c = float(np.corrcoef(x, y)[0, 1])
    assert c > 0.8, c


def test_apply_codec_system_fidelity_differs_from_native():
    from asvspoof2021_air_tpu.cli.degrade import apply_codec

    x = _speechlike()
    nat = apply_codec(x, "silk12k", 16000, fidelity="native")
    sys_ = apply_codec(x, "silk12k", 16000, fidelity="system")
    assert nat.shape == sys_.shape == x.shape
    assert not np.allclose(nat, sys_)  # genuinely different codecs
    # non-silk entries are untouched by the fidelity switch
    g1 = apply_codec(x, "g711[law=a]", 16000, fidelity="native")
    g2 = apply_codec(x, "g711[law=a]", 16000, fidelity="system")
    np.testing.assert_array_equal(g1, g2)


def test_channel_degrade_system_fidelity_end_to_end(tmp_path):
    from asvspoof2021_air_tpu.cli.degrade import channel_degrade, load_filelist
    from asvspoof2021_air_tpu.data.audio_io import write_wav

    wavdir = tmp_path / "wav"
    wavdir.mkdir()
    write_wav(str(wavdir / "u0.wav"), _speechlike())
    out = str(tmp_path / "deg")
    n = channel_degrade(str(wavdir), out, mode="random", seed=3,
                        fidelity="system")
    assert n == 1
    files = load_filelist(out)
    assert len(files) == 1 and os.path.getsize(files[0]) > 1000
