"""Native FLAC decoder vs a spec-conformant Python test encoder."""

import numpy as np
import pytest

from asvspoof2021_air_tpu.data import augment_host as ah
from asvspoof2021_air_tpu.data.audio_io import load_audio, read_flac
from tests.flac_encoder import encode_flac


def pcm_mono(n=10000, seed=0):
    g = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    x = 8000 * np.sin(2 * np.pi * 440 * t) + 500 * g.standard_normal(n)
    return np.clip(x, -32768, 32767).astype(np.int32)


@pytest.mark.parametrize("kind", ["constant", "verbatim", "fixed0", "fixed1",
                                  "fixed2", "lpc"])
def test_roundtrip_mono(kind):
    if kind == "constant":
        pcm = np.full(9000, 1234, np.int32)
    else:
        pcm = pcm_mono()
    data = encode_flac(pcm, kind=kind)
    samples, sr, bps = ah.flac_decode(data)
    assert sr == 16000 and bps == 16
    assert samples.shape == (len(pcm), 1)
    np.testing.assert_array_equal(samples[:, 0], pcm)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side"])
def test_roundtrip_stereo(mode):
    g = np.random.default_rng(1)
    n = 8192
    t = np.arange(n) / 16000
    left = np.clip(6000 * np.sin(2 * np.pi * 300 * t)
                   + 300 * g.standard_normal(n), -32768, 32767).astype(np.int32)
    right = np.clip(0.8 * left + 200 * g.standard_normal(n),
                    -32768, 32767).astype(np.int32)
    pcm = np.stack([left, right], 1)
    data = encode_flac(pcm, kind="fixed2", stereo_mode=mode)
    samples, sr, bps = ah.flac_decode(data)
    np.testing.assert_array_equal(samples, pcm)


def test_read_flac_file(tmp_path):
    pcm = pcm_mono(16000)
    path = tmp_path / "utt.flac"
    path.write_bytes(encode_flac(pcm, kind="lpc"))
    wav, sr = read_flac(str(path))
    assert sr == 16000
    np.testing.assert_allclose(wav, pcm / 32768.0, atol=1e-6)
    # load_audio routes .flac to the native decoder
    wav2, sr2 = load_audio(str(path))
    np.testing.assert_array_equal(wav, wav2)


def test_malformed_flac_raises():
    with pytest.raises(ValueError):
        ah.flac_decode(b"fLaC" + b"\x00" * 100)
    with pytest.raises(ValueError):
        ah.flac_decode(b"not a flac file at all, padded to length......")


def test_raw_dataset_over_flac(tmp_path):
    """Protocol-driven raw dataset over native-decoded FLAC files."""
    from asvspoof2021_air_tpu.data.datasets import RawAudioDataset

    db = tmp_path / "db"
    flac_dir = db / "LA" / "ASVspoof2019_LA_train" / "flac"
    flac_dir.mkdir(parents=True)
    proto_dir = db / "LA" / "ASVspoof2019_LA_cm_protocols"
    proto_dir.mkdir(parents=True)
    lines = []
    for i in range(3):
        fname = f"LA_T_{7000+i}"
        (flac_dir / f"{fname}.flac").write_bytes(
            encode_flac(pcm_mono(8000 + 500 * i, seed=i), kind="fixed2")
        )
        lines.append(f"LA_0001 {fname} - - bonafide")
    (proto_dir / "ASVspoof2019.LA.cm.train.trl.txt").write_text("\n".join(lines))

    ds = RawAudioDataset("LA", str(db), "train")
    assert len(ds) == 3
    wav, fname, tag, label = ds[1]
    assert fname == "LA_T_7001"
    assert len(wav) == 8500
    assert np.abs(wav).max() <= 1.0


def test_long_silence_not_truncated():
    """Streams that compress far below 25% (long constant runs) decode in
    full: the output buffer is sized from STREAMINFO total_samples, not a
    compression-ratio heuristic."""
    pcm = np.zeros(400_000, np.int32)
    data = encode_flac(pcm, kind="constant")
    assert len(data) * 4 < len(pcm)  # heuristic bound would have truncated
    samples, sr, bps = ah.flac_decode(data)
    assert samples.shape == (len(pcm), 1)
    assert not samples.any()


def test_stream_info_reports_totals():
    pcm = pcm_mono(12345)
    data = encode_flac(pcm, kind="lpc")
    samples, sr, bps = ah.flac_decode(data)
    assert samples.shape == (12345, 1)
