"""ITU-T G.729 codec (native/augment/g729.cc) against the in-image
libavcodec `g729` decoder.

The reference's common tier includes the `g729a` entry
(/root/reference/channel_simulation/simulated_channel.py:36-39). The
round-5 campaign (tools/g729_tables/FACTS.md) recovered the complete
fixed-point pipeline from the lavc objects: the decoder's EXCITATION
is bit-exact vs lavc (validated by ctx introspection in the lab), the
output postfilter is a float structural model, and the AbS encoder
reaches 0.90 stream conformance on lavc's decoder — these tests hold
the NB-class bars."""

import numpy as np
import pytest

from asvspoof2021_air_tpu.data import augment_host as ah

try:
    from tests.avcodec_oracle import ff_decode_packets
except ImportError:
    from avcodec_oracle import ff_decode_packets


def _speechlike(n=16000, seed=7, sr=8000):
    rng = np.random.default_rng(seed)
    exc = np.zeros(n)
    i = 0
    while i < n:
        exc[i] = 1.0
        i += 66 + int(5 * np.sin(i / 1500))
    exc += 0.02 * rng.standard_normal(n)
    y = exc
    for fc, bw in ((300, 60), (900, 110), (2000, 180)):
        r = np.exp(-np.pi * bw / sr)
        w = 2 * np.pi * fc / sr
        b1, b2 = 2 * r * np.cos(w), -r * r
        out = np.zeros(n)
        y1 = y2 = 0.0
        for k in range(n):
            v = y[k] + b1 * y1 + b2 * y2
            out[k] = v
            y2, y1 = y1, v
        y = out
    return (0.25 * y / np.abs(y).max()).astype(np.float32)


def _lavc_decode(bs):
    pkts = [bs[i:i + 10] for i in range(0, len(bs), 10)]
    try:
        pcm = np.asarray(ff_decode_packets("g729", pkts, 8000))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"lavc oracle unavailable: {e}")
    if pcm.dtype == np.int16:
        pcm = pcm.astype(np.float32) / 32768.0
    return pcm


def _best_corr(a, b, lags=range(0, 20)):
    best = -1.0
    for lag in lags:
        n = min(len(a) - lag, len(b) - lag)
        x = np.asarray(a[:n], float)
        y = np.asarray(b[lag:lag + n], float)
        c = float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-12))
        best = max(best, c)
    return best


def _parity(P1):
    x = 1
    for b in range(2, 8):
        x ^= (P1 >> b) & 1
    return x


def test_framing_and_parity():
    """Raw 10-byte frames; every frame is non-zero (an all-zero frame
    means FRAME ERASURE to G.729 decoders) and carries a valid P0
    parity bit over P1's 6 MSBs (lavc conceals on parity failure)."""
    sig = _speechlike(8000)
    bs = ah.g729_encode(sig)
    assert len(bs) > 0 and len(bs) % 10 == 0
    for pos in range(0, len(bs), 10):
        fr = bs[pos:pos + 10]
        assert any(fr), "all-zero frame would signal erasure"
        bits = [(fr[i // 8] >> (7 - (i % 8))) & 1 for i in range(80)]
        P1 = 0
        for i in range(18, 26):
            P1 = (P1 << 1) | bits[i]
        assert bits[26] == _parity(P1), f"bad parity at frame {pos//10}"


def test_stream_conformance_on_lavc():
    """The NB-class bar: lavc's decode of our streams reconstructs the
    input (corr > 0.85; measured 0.90 on the standard seeds)."""
    for seed in (7, 11):
        sig = _speechlike(16000, seed)
        bs = ah.g729_encode(sig)
        pcm = _lavc_decode(bs)
        assert len(pcm) == 80 * (len(bs) // 10)
        c = _best_corr(sig, pcm)
        assert c > 0.85, (seed, c)


def test_native_decoder_matches_lavc():
    """Our decoder is BIT-EXACT vs lavc on our encoder's streams (the
    full chain: excitation, synthesis incl. the trial-overflow exc>>2
    redo, fixed-point postfilter, AGC, HPF)."""
    sig = _speechlike(16000, 11)
    bs = ah.g729_encode(sig)
    lav = np.rint(np.asarray(_lavc_decode(bs)) * 32768.0).astype(np.int64)
    nat = np.rint(np.asarray(ah.g729_decode(bs)) * 32768.0).astype(np.int64)
    n = min(len(lav), len(nat))
    assert n > 0
    assert np.array_equal(nat[:n], lav[:n]), (
        int(np.abs(nat[:n] - lav[:n]).max()),
        float(np.mean(nat[:n] == lav[:n])))


def test_native_decoder_bit_exact_on_random_streams():
    """Random 80-bit frames (valid parity): the native decoder output
    equals lavc sample-for-sample — pins the exact postfilter port
    (tools/g729_tables/pf_exact.py, fuzz-validated vs the object code)
    and the lsf/gain/overflow laws end to end."""
    rng = np.random.default_rng(42)
    frames = []
    for _ in range(25):
        b = bytearray(10)
        bits = [0] * 80
        fields = [(1,), (7,), (5,), (5,), (8,), (1,), (13,), (4,), (3,),
                  (4,), (5,), (13,), (4,), (3,), (4,)]
        pos = 0
        vals = []
        for (n,) in fields:
            v = int(rng.integers(0, 1 << n))
            vals.append(v)
            for i in range(n):
                bits[pos + i] = (v >> (n - 1 - i)) & 1
            pos += n
        P1 = vals[4]
        bits[26] = _parity(P1)
        for i, bit in enumerate(bits):
            if bit:
                b[i >> 3] |= 0x80 >> (i & 7)
        frames.append(bytes(b))
    bs = b"".join(frames)
    lav = np.rint(np.asarray(_lavc_decode(bs)) * 32768.0).astype(np.int64)
    nat = np.rint(np.asarray(ah.g729_decode(bs)) * 32768.0).astype(np.int64)
    n = min(len(lav), len(nat))
    assert n == 80 * 25
    assert np.array_equal(nat[:n], lav[:n]), (
        int(np.abs(nat[:n] - lav[:n]).max()),
        float(np.mean(nat[:n] == lav[:n])))


def test_long_stream_error_stationary():
    """20 s stream: per-window conformance stays above the bar in
    every 4 s window — no encoder/decoder state drift."""
    sig = _speechlike(8000 * 20, seed=3)
    bs = ah.g729_encode(sig)
    pcm = _lavc_decode(bs)
    win = 4 * 8000
    cs = []
    for s0 in range(0, len(sig) - win, win):
        cs.append(_best_corr(sig[s0:s0 + win], pcm[s0:s0 + win],
                             lags=range(0, 8)))
    assert len(cs) >= 4
    assert min(cs) > 0.82, cs
    assert max(cs) - min(cs) < 0.1, cs


def test_degrade_entry_routes_to_real_codec():
    """The `g729a` entry uses the real bitstream codec at 16 kHz I/O
    and reconstructs the speech."""
    from asvspoof2021_air_tpu.cli.degrade import apply_codec
    sig8 = _speechlike(8000, 5)
    sig = ah.resample(sig8, 8000, 16000)
    out = apply_codec(sig, "g729a", 16000)
    assert out.shape == sig.shape
    c = _best_corr(sig, out, lags=range(0, 4))
    assert c > 0.85, c


def test_pitch_laws_roundtrip():
    """The recovered pitch laws: abs d3 = P1 + 58 (P1 < 197) /
    3*(P1-112) above; rel d3 = 3*clip(prev-5,20,134) - 2 + P2; both
    cover the 19.33..143 delay range injectively."""
    seen = set()
    for P1 in range(256):
        d3 = P1 + 58 if P1 < 197 else 3 * (P1 - 112)
        assert 58 <= d3 <= 429
        seen.add(d3)
    assert len(seen) == 256  # injective
    for prev in (20, 47, 134, 143):
        t_min = min(max(prev - 5, 20), 134)
        for P2 in range(32):
            d3 = 3 * t_min - 2 + P2
            assert d3 // 3 >= 19
