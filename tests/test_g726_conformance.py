"""Bit-exact conformance of the from-scratch ITU-T G.726 codec
(native/augment/g726.cc) against the in-image reference implementation
(ffmpeg's g726) at all four rates (16/24/32/40 kbps = 2/3/4/5 bits).

Both directions: our encoder's code sequences equal the reference
encoder's, and our decoder's PCM equals the reference decoder's on
reference-produced streams. Skipped without libavcodec."""

import numpy as np
import pytest

from asvspoof2021_air_tpu.data.augment_host import (
    g726_decode,
    g726_encode,
    g726_roundtrip,
)

try:
    from tests.avcodec_oracle import OracleUnavailable, ff_decode, ff_encode
except ImportError:
    from avcodec_oracle import OracleUnavailable, ff_decode, ff_encode


def _oracle_or_skip(fn, *a, **kw):
    try:
        return fn(*a, **kw)
    except OracleUnavailable as e:
        pytest.skip(f"avcodec oracle unavailable: {e}")


def _unpack(packed: bytes, cs: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(packed, np.uint8))
    n = len(bits) // cs
    return (bits[: n * cs].reshape(n, cs)
            * (1 << np.arange(cs - 1, -1, -1))).sum(1).astype(np.uint8)


def _signal(name: str, n: int = 8000) -> np.ndarray:
    g = np.random.default_rng(42)
    t = np.arange(n) / 8000.0
    x = {
        "speechish": 0.5 * np.sin(2 * np.pi * 440 * t)
        * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
        + 0.1 * g.standard_normal(n),
        "loud": 0.99 * g.uniform(-1, 1, n),
        "quiet": 0.001 * g.standard_normal(n),
        "impulses": np.where(g.random(n) < 0.01,
                             g.choice([-0.9, 0.9], n), 0.0),
    }[name]
    return np.clip(np.round(np.clip(x, -1, 1) * 32768),
                   -32768, 32767).astype(np.int16)


RATES = [(2, 16000), (3, 24000), (4, 32000), (5, 40000)]


@pytest.mark.parametrize("cs,bitrate", RATES)
@pytest.mark.parametrize("name", ["speechish", "loud", "impulses"])
def test_encoder_codes_match_reference(cs, bitrate, name):
    pcm = _signal(name)
    ff_codes = _unpack(
        _oracle_or_skip(ff_encode, "g726", pcm, 8000, {"b": bitrate}), cs)
    ours = g726_encode(pcm.astype(np.float32) / 32768.0, cs)
    m = min(len(ff_codes), len(ours))
    np.testing.assert_array_equal(ours[:m], ff_codes[:m])


@pytest.mark.parametrize("cs,bitrate", RATES)
def test_decoder_pcm_matches_reference(cs, bitrate):
    pcm = _signal("speechish")
    bs = _oracle_or_skip(ff_encode, "g726", pcm, 8000, {"b": bitrate})
    ref = _oracle_or_skip(ff_decode, "g726", bs, 8000,
                          {"bits_per_coded_sample": cs},
                          chunk=len(bs)).astype(np.int64)
    ours = np.round(g726_decode(_unpack(bs, cs), cs)
                    * 32768.0).astype(np.int64)
    m = min(len(ref), len(ours))
    np.testing.assert_array_equal(ours[:m], ref[:m])


def test_roundtrip_uses_same_state_machine():
    """g726_roundtrip == our encode -> our decode, sample for sample."""
    pcm = _signal("speechish", 4000)
    xf = pcm.astype(np.float32) / 32768.0
    for cs, _ in RATES:
        rt = np.asarray(g726_roundtrip(xf, cs))
        two = np.asarray(g726_decode(g726_encode(xf, cs), cs))
        np.testing.assert_array_equal(rt, two)
