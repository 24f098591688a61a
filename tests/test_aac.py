"""From-scratch AAC-LC codec (native/augment/aac.cc).

Covers the reference's aac compression-augmentation capability
(/root/reference/channel_simulation/simulated_compression.py:11-13:
aac at 8/16/32 kbps) with REAL standard bitstreams:
- ADTS frame-structure validity (sync, profile, sampling-frequency
  index, channel config, exact frame-length fields)
- self round-trip SNR at every reference bitrate, delay-aligned
- rate-control accuracy against the nominal bitrate
- native codec vs the executable spec (tools/aac_tables/encoder.py /
  decoder.py): identical bytes-in -> samples-out behavior
- cross-validation against the system's reference AAC decoder
  (libavcodec) when present: it decodes our streams error-free and
  sample-identical to our decoder.
"""

import os
import sys

import numpy as np
import pytest

from asvspoof2021_air_tpu.data import augment_host as ah

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SR = 16000


def tone_noise(n, sr=SR, seed=0):
    g = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return (0.4 * np.sin(2 * np.pi * 440 * t) +
            0.2 * np.sin(2 * np.pi * 1320 * t + 0.3) +
            0.05 * g.standard_normal(n)).astype(np.float32)


def snr_db(ref, test):
    n = min(len(ref), len(test))
    e = test[:n] - ref[:n]
    return 10 * np.log10(np.dot(ref[:n], ref[:n]) / (np.dot(e, e) + 1e-12))


def parse_adts(data: bytes):
    """Walk the ADTS stream; returns one dict per frame."""
    frames = []
    pos = 0
    while pos + 7 <= len(data):
        b = data[pos:pos + 7]
        assert b[0] == 0xFF and (b[1] & 0xF0) == 0xF0, \
            f"lost sync at byte {pos}"
        assert (b[1] >> 1) & 3 == 0, "layer must be 00"
        profile = (b[2] >> 6) & 3
        sfi = (b[2] >> 2) & 0xF
        chan = ((b[2] & 1) << 2) | (b[3] >> 6)
        flen = ((b[3] & 0x03) << 11) | (b[4] << 3) | (b[5] >> 5)
        assert flen >= 7
        frames.append({"profile": profile, "sfi": sfi, "chan": chan,
                       "bytes": flen})
        pos += flen
    assert pos == len(data), "trailing bytes after last frame"
    return frames


def test_aac_adts_structure():
    x = tone_noise(SR)
    data = ah.aac_encode(x, 32, SR)
    frames = parse_adts(data)
    # ceil(n/1024) payload frames + 1 overlap flush
    assert len(frames) == -(-len(x) // 1024) + 1
    for f in frames:
        assert f["profile"] == 1  # AAC-LC
        assert f["sfi"] == 8      # 16 kHz
        assert f["chan"] == 1     # mono


@pytest.mark.parametrize("kbps,min_snr", [(8, 12), (16, 14), (32, 18)])
def test_aac_roundtrip_reference_bitrates(kbps, min_snr):
    """The reference's three aac modes; SNR floors a few dB under the
    measured psychoacoustic-lite operating points (15.7/17.0/21.3 dB)."""
    x = tone_noise(2 * SR)
    y = ah.aac_codec(x, kbps, SR)
    assert y.shape == x.shape
    assert snr_db(x, y) > min_snr
    # delay-aligned: zero-lag must beat +-2-sample misalignments
    assert snr_db(x, y) > snr_db(x[2:], y[:-2])
    assert snr_db(x, y) > snr_db(x[:-2], y[2:])


def test_aac_quality_scales_with_bitrate():
    x = tone_noise(2 * SR, seed=3)
    snrs = [snr_db(x, ah.aac_codec(x, k, SR)) for k in (8, 16, 32)]
    assert snrs[0] < snrs[1] < snrs[2]


@pytest.mark.parametrize("kbps", [8, 16, 32])
def test_aac_rate_control_accuracy(kbps):
    """Measured stream rate within [0.8, 1.25] of nominal on 4 s of
    tone+noise (includes the flush-frame overhead)."""
    x = tone_noise(4 * SR, seed=1)
    data = ah.aac_encode(x, kbps, SR)
    rate = len(data) * 8 / (len(x) / SR) / 1000.0
    assert 0.8 * kbps < rate < 1.25 * kbps


def test_aac_decode_own_stream():
    x = tone_noise(SR)
    data = ah.aac_encode(x, 32, SR)
    pcm, sr = ah.aac_decode(data)
    assert sr == SR
    assert len(pcm) >= len(x)
    # codec delay is fixed at 1024 samples (encoder frame buffering)
    assert snr_db(x[:SR - 1100], pcm[1024:1024 + SR - 1100]) > 18


def test_aac_8khz_path():
    sr = 8000
    x = tone_noise(2 * sr, sr=sr, seed=2)
    y = ah.aac_codec(x, 16, sr)
    assert y.shape == x.shape and snr_db(x, y) > 15
    data = ah.aac_encode(x, 16, sr)
    frames = parse_adts(data)
    assert frames[0]["sfi"] == 11  # 8 kHz
    pcm, out_sr = ah.aac_decode(data)
    assert out_sr == sr


def test_aac_silence_is_cheap_and_clean():
    z = np.zeros(8 * 1024, np.float32)
    data = ah.aac_encode(z, 16, SR)
    # all-zero books: far below the nominal rate
    assert len(data) * 8 / (len(z) / SR) < 4000
    pcm, _ = ah.aac_decode(data)
    assert np.abs(pcm).max() == 0.0


def test_aac_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        ah.aac_decode(b"\xff\xf1" + b"\x00" * 32)
    with pytest.raises(ValueError):
        ah.aac_decode(b"not an adts stream")


def test_aac_matches_python_spec():
    """The native codec and its executable spec (tools/aac_tables)
    agree: same stream decodes to the same samples (float32-I/O close)."""
    from tools.aac_tables import decoder as pydec
    from tools.aac_tables import encoder as pyenc

    x = tone_noise(8 * 1024, seed=4)
    data = ah.aac_encode(x, 16, SR)
    pkts = pyenc.split_adts(data)
    y_py = pydec.decode_packets(pkts) / 32768.0
    y_nat, _ = ah.aac_decode(data)
    n = min(len(y_py), len(y_nat))
    assert np.abs(y_py[:n] - y_nat[:n]).max() < 1e-6


def test_aac_in_compression_degrade(tmp_path):
    """cli.degrade compression writes real-aac-processed wavs."""
    from asvspoof2021_air_tpu.cli.degrade import compression_degrade
    from asvspoof2021_air_tpu.data.audio_io import read_wav, write_wav

    src = tmp_path / "in"
    dst = tmp_path / "out"
    os.makedirs(src)
    x = tone_noise(SR)
    write_wav(str(src / "LA_T_0000002.wav"), x, SR)
    n = compression_degrade(str(src), str(dst), SR, mode="parallel")
    assert n == 6  # 3 mp3 + 3 aac modes
    y, sr = read_wav(str(dst / "LA_T_0000002_aac[16k].wav"), SR)
    assert sr == SR and len(y) == len(x)
    # level-normalized + coded: correlated but not identical
    c = np.corrcoef(x, y)[0, 1]
    assert 0.8 < c < 0.99999
    assert not np.allclose(x, y)


def test_aac_tiny_and_empty_inputs():
    y = ah.aac_codec(np.zeros(100, np.float32), 16, SR)
    assert y.shape == (100,)
    data = ah.aac_encode(np.zeros(1024, np.float32), 8, SR)
    assert len(data) > 0
    parse_adts(data)


def test_aac_tables_header_regenerates_identically(tmp_path):
    """gen_header.py is deterministic over the committed learned JSON —
    the committed aac_tables.h is exactly what the tools produce."""
    import shutil
    import subprocess

    tools = tmp_path / "tools" / "aac_tables"
    shutil.copytree("tools/aac_tables", tools)
    native = tmp_path / "native" / "augment"
    os.makedirs(native)
    subprocess.run([sys.executable, "gen_header.py"], cwd=tools, check=True)
    with open(native / "aac_tables.h") as f:
        regenerated = f.read()
    with open("native/augment/aac_tables.h") as f:
        committed = f.read()
    assert regenerated == committed


# ---------------- cross-validation against the system AAC decoder -------


def _oracle():
    import avcodec_oracle as ao
    try:
        ao.ff_decode_packets("aac", [], SR)
    except ao.OracleUnavailable:
        return None
    except Exception:
        pass
    return ao


def test_aac_lavc_decodes_our_stream():
    """The system's reference AAC decoder accepts our ADTS streams and
    matches our decoder sample-for-sample (to its int16 output grid)."""
    ao = _oracle()
    if ao is None:
        pytest.skip("libavcodec aac decoder not present")
    from tools.aac_tables import encoder as pyenc

    x = tone_noise(2 * SR, seed=5)
    for kbps in (8, 16, 32):
        data = ah.aac_encode(x, kbps, SR)
        pkts = pyenc.split_adts(data)
        try:
            y_ff = np.asarray(ao.ff_decode_packets("aac", pkts, SR),
                              np.float64) / 32768.0
        except ao.OracleUnavailable:
            pytest.skip("libavcodec aac decoder not present")
        y_nat, _ = ah.aac_decode(data)
        n = min(len(y_ff), len(y_nat))
        assert n >= len(x)
        # int16 oracle grid: half an LSB of 2/65536
        assert np.abs(y_ff[:n] - y_nat[:n]).max() < 2.0 / 32768.0
        assert snr_db(x, y_nat[1024:1024 + len(x)]) > 10
