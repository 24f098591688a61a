"""Native C++ augmentation library tests (builds libaugment.so on demand)."""

import numpy as np
import pytest

from asvspoof2021_air_tpu.data import augment_host as ah


def tone(freq, sr=16000, n=16000, amp=0.3):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def snr_db(clean, coded):
    noise = coded - clean
    return 10 * np.log10((clean ** 2).mean() / max((noise ** 2).mean(), 1e-20))


def test_g711_ulaw_known_values():
    """Bit-exact ITU mu-law: encode(0) = 0xFF, decode(0xFF) = 0."""
    lib = ah.get_lib()
    lib.g711_ulaw_encode_sample.restype = __import__("ctypes").c_uint8
    lib.g711_ulaw_decode_sample.restype = __import__("ctypes").c_int16
    assert lib.g711_ulaw_encode_sample(0) == 0xFF
    assert lib.g711_ulaw_decode_sample(0xFF) == 0
    # max positive input saturates to code 0x80
    assert lib.g711_ulaw_encode_sample(32767) == 0x80
    # encode/decode consistency over the full 16-bit range (quantization
    # error bounded by segment step size)
    pcm = np.arange(-32768, 32768, 257, dtype=np.int64)
    for v in pcm:
        code = lib.g711_ulaw_encode_sample(int(v))
        back = lib.g711_ulaw_decode_sample(code)
        step = max(8 << max(0, int(np.log2(max(abs(v), 1) / 16 + 1))), 8)
        assert abs(back - v) <= 2 * step + 4, (v, back)


def test_g711_roundtrip_snr():
    x = tone(1000)
    for law in ("u", "a"):
        y = ah.g711_roundtrip(x, law)
        s = snr_db(x, y)
        assert s > 30, (law, s)  # G.711 gives ~35-38 dB SNR on speech-level tones


def test_g726_bitrate_ladder():
    x = tone(1000, sr=8000, n=8000)
    snrs = []
    for bits in (2, 3, 4, 5):
        y = ah.g726_roundtrip(x, bits)
        snrs.append(snr_db(x[500:], y[500:]))  # skip adaptation transient
    # more bits -> better SNR, and 4-bit (32 kbps) should be decent
    assert snrs[0] < snrs[1] < snrs[2] < snrs[3], snrs
    assert snrs[2] > 20, snrs


def test_resample_roundtrip():
    x = tone(1000)
    down = ah.resample(x, 16000, 8000)
    assert abs(len(down) - 8000) <= 33
    up = ah.resample(down, 8000, 16000)
    n = min(len(up), len(x)) - 100
    # compensate group delay ~0; compare interior
    c = np.corrcoef(up[50:n], x[50:n])[0, 1]
    assert c > 0.98, c


def test_resample_kills_aliasing():
    x = tone(6000)  # above 4 kHz Nyquist of 8 kHz
    down = ah.resample(x, 16000, 8000)
    assert (down[100:-100] ** 2).mean() < 1e-3 * (x ** 2).mean()


def test_fft_convolve_identity():
    g = np.random.default_rng(0)
    x = g.standard_normal(5000).astype(np.float32)
    ir = np.zeros(128, np.float32)
    ir[0] = 1.0
    y = ah.fft_convolve(x, ir)
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_fft_convolve_matches_numpy():
    g = np.random.default_rng(1)
    x = g.standard_normal(2000).astype(np.float32)
    ir = g.standard_normal(64).astype(np.float32) * 0.1
    y = ah.fft_convolve(x, ir)
    ref = np.convolve(x, ir)[:2000]
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_rms_normalize_native():
    g = np.random.default_rng(2)
    x = (0.01 * g.standard_normal(8000)).astype(np.float32)
    y = ah.rms_normalize(x, -26.0)
    rms_db = 20 * np.log10(np.sqrt((y ** 2).mean()))
    assert abs(rms_db - (-26.0)) < 0.2


def test_telephony_channel_end_to_end():
    x = tone(1000)
    for codec in ("g711u", "g711a", "g726_32k"):
        y = ah.telephony_channel(x, codec)
        assert y.shape == x.shape
        c = np.corrcoef(y[800:-800], x[800:-800])[0, 1]
        assert c > 0.8, (codec, c)


def test_g722_decoder_arbitrary_bytes_safe():
    """All 256 G.722 code values are valid table indices: decoding random
    bytes must produce bounded, finite audio (no crash, no overflow)."""
    from asvspoof2021_air_tpu.data import augment_host as ah

    g = np.random.default_rng(0)
    codes = g.integers(0, 256, 4000, dtype=np.uint8).tobytes()
    for kbps in (64, 56, 48):
        out = ah.g722_decode(codes, kbps)
        assert out.shape == (8000,)
        assert np.isfinite(out).all()
        assert np.abs(out).max() <= 2.1  # int16-range samples over 16384


def test_g722_invalid_mode_rejected():
    from asvspoof2021_air_tpu.data import augment_host as ah

    with pytest.raises(ValueError, match="64/56/48"):
        ah.g722_roundtrip(np.zeros(100, np.float32), 32)
    with pytest.raises(ValueError, match="64/56/48"):
        ah.g722_decode(b"\x00" * 10, 128)
