"""Bit-exact conformance of the from-scratch ITU-T G.722 codec
(native/augment/g722.cc) against the in-image reference implementation
(ffmpeg's g722, derived from spandsp — the de-facto interop reference).

Pinned in both directions and at every embedded mode: our encoder's
bytes equal the reference encoder's; our decoder's PCM equals the
reference decoder's at 64k (8 bits/codeword), 56k (7) and 48k (6).
Skipped when libavcodec is unavailable (tests/test_g722.py keeps the
oracle-free checks)."""

import numpy as np
import pytest

from asvspoof2021_air_tpu.data.augment_host import g722_decode, g722_encode

try:
    from tests.avcodec_oracle import OracleUnavailable, ff_decode, ff_encode
except ImportError:  # run from within tests/
    from avcodec_oracle import OracleUnavailable, ff_decode, ff_encode


def _oracle_or_skip(fn, *a, **kw):
    try:
        return fn(*a, **kw)
    except OracleUnavailable as e:
        pytest.skip(f"avcodec oracle unavailable: {e}")


def _cases(n=16000):
    g = np.random.default_rng(42)
    t = np.arange(n) / 16000.0
    return {
        "silence": np.zeros(n),
        "loud_noise": 0.99 * g.uniform(-1, 1, n),
        "quiet": 0.001 * g.standard_normal(n),
        "tone_3k": 0.8 * np.sin(2 * np.pi * 3000 * t),
        "tone_6k": 0.7 * np.sin(2 * np.pi * 6000 * t),
        "impulses": np.where(g.random(n) < 0.01,
                             g.choice([-0.9, 0.9], n), 0.0),
        "chirp": 0.7 * np.sin(2 * np.pi * (100 + 7000 * t / t[-1]) * t),
        "dc": 0.5 * np.ones(n),
        "square": np.tile([0.9, -0.9], n // 2),
    }


def test_avcodec_oracle_selfcheck():
    """The headerless ctypes harness relies on empirically pinned struct
    offsets; a reference-encoder roundtrip through the reference decoder
    must reconstruct a recognizable signal, proving the offsets hold for
    this libavcodec build."""
    n = 16000
    t = np.arange(n) / 16000.0
    pcm = np.round(0.5 * np.sin(2 * np.pi * 440 * t) * 32768).astype(np.int16)
    bs = _oracle_or_skip(ff_encode, "g722", pcm, 16000)
    dec = _oracle_or_skip(ff_decode, "g722", bs, 16000)
    assert len(dec) >= n - 400
    lag = 23  # QMF analysis+synthesis delay
    c = np.corrcoef(dec[lag:n].astype(np.float64),
                    pcm[: n - lag].astype(np.float64))[0, 1]
    assert c > 0.98


@pytest.mark.parametrize("name", sorted(_cases(16)))
def test_encoder_bitstream_matches_reference(name):
    x = _cases()[name]
    pcm = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)
    ff_bs = _oracle_or_skip(ff_encode, "g722", pcm, 16000)
    ours = g722_encode(pcm.astype(np.float32) / 32768.0)
    assert ours[: len(ff_bs)] == ff_bs


@pytest.mark.parametrize("kbps,bpc", [(64, 8), (56, 7), (48, 6)])
def test_decoder_pcm_matches_reference_all_modes(kbps, bpc):
    x = _cases()["chirp"]
    pcm = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)
    bs = _oracle_or_skip(ff_encode, "g722", pcm, 16000)
    ref = _oracle_or_skip(
        ff_decode, "g722", bs, 16000,
        {"bits_per_codeword": bpc} if bpc != 8 else None).astype(np.int64)
    ours = np.round(np.asarray(g722_decode(bs, kbps=kbps))
                    * 32768.0).astype(np.int64)
    m = min(len(ref), len(ours))
    np.testing.assert_array_equal(ours[:m], ref[:m])
