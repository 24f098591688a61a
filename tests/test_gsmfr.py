"""Native GSM 06.10 Full-Rate codec: self-consistency + spectral validation.

The reference's channel vocabulary includes 'gsmfr'
(/root/reference/channel_simulation/simulated_channel.py:36-38); here it is a
real RPE-LTP bitstream codec (native/augment/gsmfr.cc), not a band-limit
stand-in. ETSI conformance vectors are not available offline, so validation
is: bitstream structure, encode/decode consistency, tandem stability, SNR in
the codec's characteristic range, and spectral-envelope preservation.
"""

import numpy as np
import pytest

from asvspoof2021_air_tpu.data import augment_host as ah


def speechlike(n=8000, sr=8000, f0=120, seed=0, level=0.3):
    g = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = np.zeros(n)
    for h in range(1, int(0.45 * sr / f0)):
        amp = (1.0 / (1 + ((h * f0 - 500) / 300) ** 2)
               + 0.5 / (1 + ((h * f0 - 1500) / 400) ** 2))
        x += amp * np.sin(2 * np.pi * h * f0 * t + g.uniform(0, 2 * np.pi))
    return (level * x / np.abs(x).max()).astype(np.float32)


def snr_db(x, y, max_lag=8):
    best = -np.inf
    for lag in range(max_lag):
        yy = y[lag:]
        xx = x[: len(yy)]
        err = xx - yy
        best = max(best, 10 * np.log10(
            (xx ** 2).mean() / max((err ** 2).mean(), 1e-12)))
    return best


def test_bitstream_structure():
    x = speechlike()
    frames = ah.gsmfr_encode(x)
    n_frames = -(-len(x) // 160)
    assert len(frames) == n_frames * 33  # 260 bits + magic nibble per frame
    for j in range(n_frames):
        assert frames[j * 33] >> 4 == 0xD  # GSM magic nibble


def test_encode_decode_matches_roundtrip():
    x = speechlike(seed=1)
    via_bits = ah.gsmfr_decode(ah.gsmfr_encode(x))[: len(x)]
    direct = ah.gsmfr_roundtrip(x)
    np.testing.assert_array_equal(via_bits, direct)


def test_roundtrip_deterministic_and_bounded():
    x = speechlike(seed=2)
    y1 = ah.gsmfr_roundtrip(x)
    y2 = ah.gsmfr_roundtrip(x)
    np.testing.assert_array_equal(y1, y2)
    assert np.isfinite(y1).all()
    assert np.abs(y1).max() <= 1.0


def test_speech_snr_in_codec_range():
    """RPE-LTP at 13 kbit/s typically achieves ~10-15 dB waveform SNR on
    voiced speech; far below means broken prediction, far above means the
    quantizers aren't really being applied."""
    x = speechlike(n=16000, seed=3)
    y = ah.gsmfr_roundtrip(x)
    s = snr_db(x, y)
    assert 8.0 < s < 25.0, f"SNR {s:.1f} dB outside GSM-FR range"


def test_sine_frequency_preserved():
    sr = 8000
    t = np.arange(8000) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    y = ah.gsmfr_roundtrip(x)
    w = np.hanning(4000)
    spec = np.abs(np.fft.rfft(y[800:4800] * w))
    peak_hz = np.argmax(spec) * sr / 4000
    assert abs(peak_hz - 440) < 10


def test_spectral_envelope_preserved():
    """Formant structure survives: band energies of the decoded signal track
    the input's within a few dB in the telephony band."""
    x = speechlike(n=16000, seed=4)
    y = ah.gsmfr_roundtrip(x)
    fx = np.abs(np.fft.rfft(x)) ** 2
    fy = np.abs(np.fft.rfft(y[: len(x)])) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / 8000)
    for lo, hi in ((200, 700), (700, 1500), (1500, 2500)):
        band = (freqs >= lo) & (freqs < hi)
        ratio = 10 * np.log10(fy[band].sum() / fx[band].sum())
        assert abs(ratio) < 4.0, f"band {lo}-{hi} off by {ratio:.1f} dB"


def test_silence_stays_silent():
    x = np.zeros(3200, np.float32)
    y = ah.gsmfr_roundtrip(x)
    assert np.abs(y).max() < 1e-2


def test_tandem_stability():
    """Re-encoding the decoded signal must not diverge (classic codec
    sanity: tandem SNR stays within a few dB of first-pass SNR)."""
    x = speechlike(n=16000, seed=5)
    y1 = ah.gsmfr_roundtrip(x)
    y2 = ah.gsmfr_roundtrip(y1)
    assert np.isfinite(y2).all()
    s12 = snr_db(y1, y2)
    assert s12 > 8.0, f"tandem SNR {s12:.1f} dB"


def test_full_telephony_hop_16k():
    x16 = speechlike(n=32000, sr=16000, seed=6)
    y = ah.telephony_channel(x16, "gsmfr", 16000)
    assert y.shape == x16.shape
    assert np.isfinite(y).all()
    best = -np.inf
    for lag in range(80):
        yy = y[lag:]
        xx = x16[: len(yy)]
        best = max(best, 10 * np.log10(
            (xx ** 2).mean() / max(((xx - yy) ** 2).mean(), 1e-12)))
    assert best > 8.0


def test_family_snr_matches_real_codec():
    """The on-device gsmfr family stand-in (ops/augment.py CHANNEL_FAMILIES)
    carries the real codec's measured SNR."""
    from asvspoof2021_air_tpu.ops.augment import CHANNEL_FAMILIES

    fam = {f.name: f for f in CHANNEL_FAMILIES}["gsmfr"]
    x16 = speechlike(n=32000, sr=16000, seed=0)
    y = ah.telephony_channel(x16, "gsmfr", 16000)
    best = -np.inf
    for lag in range(80):
        yy = y[lag:]
        xx = x16[: len(yy)]
        best = max(best, 10 * np.log10(
            (xx ** 2).mean() / max(((xx - yy) ** 2).mean(), 1e-12)))
    assert abs(fam.snr_db - best) < 2.0, (
        f"family table {fam.snr_db} dB vs measured {best:.1f} dB"
    )


def test_degrade_cli_uses_real_gsmfr():
    from asvspoof2021_air_tpu.cli.degrade import apply_codec

    x16 = speechlike(n=16000, sr=16000, seed=7)
    y = apply_codec(x16, "gsmfr", 16000)
    np.testing.assert_array_equal(y, ah.telephony_channel(x16, "gsmfr", 16000))
    assert not np.allclose(y, x16)


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        ah.gsmfr_decode(b"\x00" * 33)
