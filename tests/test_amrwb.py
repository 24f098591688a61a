"""AMR-WB 12.65 kbps codec tests (native/augment/amrwb.cc) against the
in-image libavcodec `amrwb` decoder.

The reference's cellular tier includes 8 amrwb entries
(/root/reference/channel_simulation/simulated_channel.py:33-35). The
round-5 campaign replaced the behavioral chain model with an exact
lavc-decode replica + AbS encoder (tools/amrwb_tables/truedec.py is
the validated Python reference; FACTS.md the audit trail), so this
file asserts the NB-class bars that the round-4 placeholders
(corr > 0.6 / 0.55) were explicitly scheduled to be replaced by
(round-4 VERDICT item 5): standard-bitstream framing, error-free lavc
decode, stream conformance > 0.85 on lavc's decoder, long-stream
error stationarity, and the DTX tier's framing + comfort-noise level
law (structural tier: lavc implements no WB DTX, like NB).
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


def _lavc_decode(bs):
    pkts = [bs[i:i + 33] for i in range(0, len(bs), 33)]
    pcm = np.asarray(_oracle_or_skip("amrwb", pkts, 16000))
    if pcm.dtype == np.int16:
        pcm = pcm.astype(np.float32) / 32768.0
    return pcm


def _best_corr(a, b, lags=range(0, 40)):
    n = min(len(a), len(b))
    best = -1.0
    for lag in lags:
        x = np.asarray(a[:n - lag], float)
        y = np.asarray(b[lag:n], float)
        c = float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-12))
        best = max(best, c)
    return best


def test_framing_structure():
    """33-byte frames: TOC 0x14 (mode 2, quality bit), 32-byte payload
    (RFC 4867 octet-aligned storage)."""
    sig = _speechlike(8000)
    bs = ah.amrwb_encode(sig)
    assert len(bs) > 0 and len(bs) % 33 == 0
    for pos in range(0, len(bs), 33):
        assert bs[pos] == (2 << 3) | 0x04


def test_frames_decode_error_free_on_lavc():
    """Every emitted frame decodes on libavcodec's amrwb decoder with
    the full 320 samples and finite output."""
    sig = _speechlike(16000)
    bs = ah.amrwb_encode(sig)
    pcm = _lavc_decode(bs)
    assert len(pcm) == 320 * (len(bs) // 33)
    assert np.isfinite(pcm).all()


def test_stream_conformance_on_lavc():
    """The NB-class bar: lavc's decode of our streams reconstructs the
    input waveform (corr > 0.85; measured 0.91-0.92 on the standard
    seeds, tools/amrwb_tables/measure_conf.py)."""
    for seed in (7, 11):
        sig = _speechlike(24000, seed)
        bs = ah.amrwb_encode(sig)
        pcm = _lavc_decode(bs)
        c = _best_corr(sig, pcm)
        assert c > 0.85, (seed, c)


def test_native_decoder_matches_lavc():
    """Our decoder and lavc produce near-identical waveforms on our
    streams (exact-replica bar, far above the old component probes)."""
    sig = _speechlike(24000, 11)
    bs = ah.amrwb_encode(sig)
    lav = _lavc_decode(bs)
    nat = ah.amrwb_decode(bs)
    n = min(len(lav), len(nat))
    c = float(nat[:n] @ lav[:n] /
              (np.linalg.norm(nat[:n]) * np.linalg.norm(lav[:n]) + 1e-12))
    assert c > 0.99, c


def test_long_stream_error_stationary():
    """30 s stream: the per-window conformance stays above the bar in
    EVERY 5 s window — no drift between our encoder state and lavc's
    decoder state (mirrors tests/test_amr_conformance.py's NB bar)."""
    sig = _speechlike(16000 * 30, seed=3)
    bs = ah.amrwb_encode(sig)
    pcm = _lavc_decode(bs)
    lag = 15
    n = min(len(sig) - lag, len(pcm) - lag)
    win = 5 * 16000
    cs = []
    for s0 in range(0, n - win, win):
        a = sig[s0:s0 + win].astype(float)
        b = pcm[s0 + lag:s0 + lag + win].astype(float)
        cs.append(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)
                                 + 1e-12)))
    assert len(cs) >= 5
    assert min(cs) > 0.82, cs
    assert max(cs) - min(cs) < 0.1, cs


def _speech_silence_speech(seed=1):
    rng = np.random.default_rng(seed)
    sp = _speechlike(9600)
    sil = (5e-4 * rng.standard_normal(9600)).astype(np.float32)
    return np.concatenate([sp, sil, 0.8 * sp]).astype(np.float32)


def test_dtx_framing_and_cn_level():
    """DTX streams carry VAD-gated speech + SID (type 9, 6 bytes) +
    NO_DATA (type 15, TOC only); our decoder reconstructs speech at
    the conformance bar AND matches the comfort-noise level to the
    input silence (structural tier: the in-image lavc rejects WB DTX
    like NB; docs/CODECS.md carries the caveat)."""
    sig = _speech_silence_speech()
    bs = ah.amrwb_encode(sig, dtx=True)
    fts, p = [], 0
    sizes = {2: 33, 9: 6, 15: 1}
    while p < len(bs):
        ft = (bs[p] >> 3) & 0xF
        assert ft in sizes, ft
        fts.append(ft)
        p += sizes[ft]
    assert fts.count(9) >= 2, "no SID updates"
    assert fts.count(15) >= 10, "no NO_DATA frames"
    assert fts.count(2) >= 50, "speech frames gated away"
    dec = ah.amrwb_decode(bs)
    assert len(dec) >= len(sig) - 320, len(dec)
    lead = 15
    m = min(len(sig) - lead, len(dec) - lead)
    c = float(sig[:m] @ dec[lead:lead + m] /
              (np.linalg.norm(sig[:m]) * np.linalg.norm(dec[lead:lead + m])
               + 1e-12))
    assert c > 0.85, c
    sil_in = float(np.sqrt((sig[11000:18000] ** 2).mean()))
    sil_out = float(np.sqrt((dec[11000:18000] ** 2).mean()))
    assert 0.5 * sil_in < sil_out < 2.0 * sil_in, (sil_in, sil_out)


def test_dtx_differs_from_nodtx_entry():
    """The degrade entries: amrwb[br=12k65] (dtx default) and the
    nodtx twin route to the real codec and differ measurably on
    silence-padded speech while both reconstruct the speech."""
    from asvspoof2021_air_tpu.cli.degrade import apply_codec
    sig = _speech_silence_speech()
    out_dtx = apply_codec(sig, "amrwb[br=12k65]", 16000)
    out_nodtx = apply_codec(sig, "amrwb[br=12k65,nodtx]", 16000)
    assert out_dtx.shape == out_nodtx.shape == sig.shape
    assert np.abs(out_dtx - out_nodtx).max() > 1e-4
    for out in (out_dtx, out_nodtx):
        c = _best_corr(sig[:9000], out[:9000], lags=range(0, 2))
        assert c > 0.85, c


def _lavc_decode_mode(bs, mode):
    fsz = ah.AMRWB_MODE_BYTES[mode]
    pkts = [bs[i:i + fsz] for i in range(0, len(bs), fsz)]
    pcm = np.asarray(_oracle_or_skip("amrwb", pkts, 16000))
    if pcm.dtype == np.int16:
        pcm = pcm.astype(np.float32) / 32768.0
    return pcm


def test_all_encoder_modes_conform_on_lavc():
    """Round-5 extension: 6.60k / 8.85k / 15.85k / 23.05k join 12.65k
    as real bitstream encoders — ALL 9 TS 26.201 modes encode (generic
    pulse-law codecs 1p..6p, low lag laws, 36-bit ISF path, gain6,
    anti-sparseness — all from the amrwbdec disassembly; 23.85 emits
    hb gain 0). Every mode's frames decode error-free on
    lavc and reconstruct the input; the 6.6k bar is lower because the
    codec itself is (12 code bits/subframe vs 88 at 23.05k)."""
    sig = _speechlike(24000, 7)
    bars = {0: 0.82, 1: 0.85, 3: 0.88, 4: 0.88, 5: 0.88, 6: 0.88,
            7: 0.88, 8: 0.88}
    for mode, bar in bars.items():
        bs = ah.amrwb_encode(sig, mode=mode)
        fsz = ah.AMRWB_MODE_BYTES[mode]
        assert len(bs) % fsz == 0
        assert bs[0] == (mode << 3) | 0x04
        pcm = _lavc_decode_mode(bs, mode)
        assert len(pcm) == 320 * (len(bs) // fsz)
        c = _best_corr(sig, pcm)
        assert c > bar, (mode, c)


def test_native_decoder_handles_all_nine_modes():
    """The native decoder covers ALL 9 TS 26.201 modes (incl. the
    14.25/18.25/19.85/23.85 rates without a native encoder): frames
    produced by our encoders at neighbouring rates decode, and the
    decoder matches lavc on each encoded stream."""
    sig = _speechlike(16000, 11)
    for mode in (0, 4, 7):
        bs = ah.amrwb_encode(sig, mode=mode)
        lav = _lavc_decode_mode(bs, mode)
        nat = ah.amrwb_decode(bs)
        n = min(len(lav), len(nat))
        c = float(nat[:n] @ lav[:n] /
                  (np.linalg.norm(nat[:n]) * np.linalg.norm(lav[:n])
                   + 1e-12))
        assert c > 0.97, (mode, c)


def test_new_mode_degrade_entries_route_to_real_codec():
    """The remaining reference amrwb entries (6k6/15k85/23k05 +
    nodtx twins, simulated_channel.py:33-35) use the real codec."""
    from asvspoof2021_air_tpu.cli.degrade import apply_codec
    sig = _speechlike(16000, 3)
    for name, bar in (("amrwb[br=6k6,nodtx]", 0.8),
                      ("amrwb[br=15k85]", 0.85),
                      ("amrwb[br=23k05]", 0.85)):
        out = apply_codec(sig, name, 16000)
        assert out.shape == sig.shape
        c = _best_corr(sig, out, lags=range(0, 2))
        assert c > bar, (name, c)


def test_code_track_law_invariants():
    """The recovered 9-bit 2-pulse law [s|B|A]: v=0 is a coincident
    POSITIVE pair (+2 at the track's position 0 — absolute sign pinned
    round 5 by the chain-impulse probe), v=256 coincident negative;
    the map is injective over unordered signed pairs."""
    def dec_track(v):
        s = (v >> 8) & 1
        b = (v >> 4) & 0xF
        a = v & 0xF
        s1 = -1 if s else 1
        return (b, s1), (a, s1 if a >= b else -s1)

    (p1, s1), (p2, s2) = dec_track(0)
    assert p1 == p2 == 0 and s1 == s2 == 1
    (p1, s1), (p2, s2) = dec_track(256)
    assert p1 == p2 == 0 and s1 == s2 == -1
    seen = set()
    for v in range(512):
        (pb, sb), (pa, sa) = dec_track(v)
        assert (sa == sb) == (pa >= pb)
        seen.add(tuple(sorted(((pb, sb), (pa, sa)))))
    assert len(seen) == 512
