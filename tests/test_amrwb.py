"""AMR-WB 12.65 kbps codec tests (native/augment/amrwb.cc) against the
in-image libavcodec `amrwb` decoder and the recovered-model invariants.

The reference's cellular tier includes 8 amrwb entries
(/root/reference/channel_simulation/simulated_channel.py:34-35). This
file pins what the round-4 campaign closed (tools/amrwb_tables/
FACTS.md): valid RFC 4867 storage framing that decodes ERROR-FREE on
lavc, the recovered 253-bit field maps / 2-pulse track law / lag laws
driving a self-consistent encoder-decoder loop, and the native
decoder's component-level tracking of lavc. Full waveform conformance
(the NB bar) is still open pending finer ISF tables — asserted bounds
here are the measured state of the campaign, not the end goal.
"""

import numpy as np
import pytest

from asvspoof2021_air_tpu.data import augment_host as ah

try:
    from tests.avcodec_oracle import ff_decode_packets
except ImportError:  # direct invocation
    from avcodec_oracle import ff_decode_packets


def _speechlike(n=16000, seed=7):
    rng = np.random.default_rng(seed)
    exc = np.zeros(n)
    i = 0
    while i < n:
        exc[i] = 1.0
        i += 133 + int(8 * np.sin(i / 3000))
    exc += 0.02 * rng.standard_normal(n)
    y = exc
    for fc, bw in ((600, 120), (1400, 180), (2600, 260)):
        r = np.exp(-np.pi * bw / 16000)
        w = 2 * np.pi * fc / 16000
        b1, b2 = 2 * r * np.cos(w), -r * r
        out = np.zeros(n)
        y1 = y2 = 0.0
        for i in range(n):
            v = y[i] + b1 * y1 + b2 * y2
            out[i] = v
            y2, y1 = y1, v
        y = out
    return (0.25 * y / np.abs(y).max()).astype(np.float32)


def _oracle_or_skip(codec, pkts, rate):
    try:
        return ff_decode_packets(codec, pkts, rate)
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"lavc oracle unavailable: {e}")


def test_framing_structure():
    """33-byte frames: TOC 0x14 (mode 2, quality bit), 32-byte payload.

    Matches RFC 4867 octet-aligned storage and the recovered frame
    facts (tools/amrwb_tables/FACTS.md 'Oracle behavior')."""
    sig = _speechlike(8000)
    bs = ah.amrwb_encode(sig)
    assert len(bs) > 0 and len(bs) % 33 == 0
    for pos in range(0, len(bs), 33):
        assert bs[pos] == (2 << 3) | 0x04


def test_frames_decode_error_free_on_lavc():
    """Every emitted frame decodes on libavcodec's amrwb decoder with
    the full 320 samples and finite output — the round-4 'done' bar for
    opening the WB campaign (VERDICT item 3)."""
    sig = _speechlike(16000)
    bs = ah.amrwb_encode(sig)
    pkts = [bs[i:i + 33] for i in range(0, len(bs), 33)]
    pcm = np.asarray(_oracle_or_skip("amrwb", pkts, 16000))
    if pcm.dtype == np.int16:
        pcm = pcm.astype(np.float32) / 32768.0
    assert len(pcm) == 320 * len(pkts)
    assert np.isfinite(pcm).all()
    # decodes to a real nonzero signal (absolute level is part of the
    # open conformance work -- see the module docstring)
    assert float(np.sqrt((pcm ** 2).mean())) > 1e-4


def test_self_round_trip_tracks_input():
    """Encoder and mirrored native decoder form a consistent AbS loop:
    the self round trip reconstructs the input waveform."""
    sig = _speechlike(16000)
    bs = ah.amrwb_encode(sig)
    dec = ah.amrwb_decode(bs)
    n = min(len(dec), len(sig))
    best = -1.0
    for lag in range(0, 80):
        a = sig[:n - lag].astype(float)
        b = dec[lag:n].astype(float)
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        best = max(best, c)
    assert best > 0.6, best


def test_native_decoder_tracks_lavc_on_probes():
    """Component probes (code bursts under converged state) decode the
    same on the native tracking decoder and lavc (lowband, after the
    fixed upsampler-delay alignment)."""
    def frame_bits(gain, code):
        bits = [0] * 253
        for i, b in enumerate([3, 20, 42, 28, 32, 38, 24]):
            if (gain >> (6 - i)) & 1:
                bits[b] = 1
        if code:
            bits[109] = 1
        return bits

    def pack(bits):
        p = bytearray(32)
        for i, b in enumerate(bits):
            if b:
                p[i >> 3] |= 0x80 >> (i & 7)
        return bytes([(2 << 3) | 4]) + bytes(p)

    frames = [pack([0] * 253)] * 3 + [pack(frame_bits(90, True))]
    lav = np.asarray(_oracle_or_skip("amrwb", frames, 16000))
    nat = ah.amrwb_decode(b"".join(frames))

    def lp(x):
        nfft = 8192
        s = np.fft.rfft(x, nfft)
        s[int(6200 / 16000 * nfft):] = 0
        return np.fft.irfft(s, nfft)[:len(x)]

    n = min(len(nat), len(lav))
    nfft = 8192
    spec = np.fft.rfft(nat[:n].astype(float), nfft)
    k = np.arange(len(spec))
    aligned = np.fft.irfft(spec * np.exp(-2j * np.pi * k * (-19.0) / nfft),
                           nfft)
    w0, w1 = 960, min(1280, n)
    a = lp(lav[w0:w1].astype(float))
    b = lp(aligned[w0:w1])
    c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert c > 0.55, c


def test_code_track_law_invariants():
    """The recovered 9-bit 2-pulse law: v=0 is a coincident negative
    pair, v=256 coincident positive; encode/decode maps are mutual
    inverses over all 512 values (native bit maps, FACTS '2-pulse
    track coding law')."""
    sig = np.zeros(320, np.float32)
    bs = ah.amrwb_encode(sig)          # exercises the C++ map end-to-end
    assert len(bs) % 33 == 0
    # python mirror of the law for the invariant check
    def dec_track(v):
        A = sum(((v >> (2 * i)) & 1) << i for i in range(4))
        B = sum(((v >> (2 * i + 1)) & 1) << i for i in range(4))
        s1 = 1 if (v >> 8) & 1 else -1
        return (B, s1), (A, s1 if A >= B else -s1)

    (p1, s1), (p2, s2) = dec_track(0)
    assert p1 == p2 == 0 and s1 == s2 == -1
    (p1, s1), (p2, s2) = dec_track(256)
    assert p1 == p2 == 0 and s1 == s2 == 1
    seen = set()
    for v in range(512):
        (pb, sb), (pa, sa) = dec_track(v)
        # order rule: the A pulse carries sigma iff A >= B
        assert (sa == sb) == (pa >= pb)
        seen.add(tuple(sorted(((pb, sb), (pa, sa)))))
    # the joint coding is injective over unordered signed pairs
    assert len(seen) == 512
