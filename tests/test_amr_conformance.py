"""Conformance of the from-scratch AMR-NB MR122 codec
(native/augment/amrnb.cc) against the in-image libavcodec `amrnb`
decoder — the black-box oracle whose tables/laws were recovered in
tools/amr_tables/ (FACTS.md).

Matches the reference's amr[br=12k2] cellular channel entry
(/root/reference/channel_simulation/simulated_channel.py:30-33).

Two tiers:
  - oracle tests (skipped without libavcodec): our encoder's storage
    frames decode error-free on lavc and reconstruct the input with
    codec-class fidelity; our native decoder tracks lavc sample-wise.
  - oracle-free structural tests: framing, determinism, round trip.
"""

import numpy as np
import pytest

from asvspoof2021_air_tpu.data import augment_host as ah

try:
    from tests.avcodec_oracle import OracleUnavailable, ff_decode_packets
except ImportError:  # run from within tests/
    from avcodec_oracle import OracleUnavailable, ff_decode_packets


def _oracle_or_skip(fn, *a, **kw):
    try:
        return fn(*a, **kw)
    except OracleUnavailable as e:
        pytest.skip(f"avcodec oracle unavailable: {e}")


def _speechlike(n=8000, seed=0, f0=110.0):
    rng = np.random.default_rng(seed)
    exc = np.zeros(n)
    t = 0.0
    while t < n:
        exc[int(t)] = 1.0
        t += 8000.0 / f0 * (1.0 + 0.02 * np.sin(t / 700.0))
    exc += 0.02 * rng.standard_normal(n)
    out = np.zeros(n)
    y1 = np.zeros(2)
    y2 = np.zeros(2)
    for i in range(n):
        fa = 650 + 150 * np.sin(2 * np.pi * i / 1900.0)
        fb = 1800 + 300 * np.cos(2 * np.pi * i / 2300.0)
        o = exc[i]
        for (fc, bw, y) in ((fa, 120, y1), (fb, 180, y2)):
            r = np.exp(-np.pi * bw / 8000.0)
            c = 2 * r * np.cos(2 * np.pi * fc / 8000.0)
            o_new = o + c * y[0] - r * r * y[1]
            y[1] = y[0]
            y[0] = o_new
            o = o_new
        out[i] = o
    return (out / np.abs(out).max() * 0.35).astype(np.float32)


def _lavc_decode(bs: bytes, frame_bytes: int = 32) -> np.ndarray:
    pkts = [bs[i * frame_bytes:(i + 1) * frame_bytes]
            for i in range(len(bs) // frame_bytes)]
    dec = np.asarray(_oracle_or_skip(ff_decode_packets, "amrnb", pkts, 8000))
    if dec.dtype == np.int16:
        dec = dec.astype(np.float64) / 32768.0
    else:
        dec = dec.astype(np.float64)
        if np.abs(dec).max() > 4.0:  # s16-range floats
            dec = dec / 32768.0
    return dec


# corr threshold per stress class: MR122 is a speech codec; tonal and
# noise inputs are adversarial and legitimately reconstruct worse.
CASES = [
    ("speechlike", lambda n, g, t: _speechlike(n), 0.85),
    ("chirp", lambda n, g, t:
     (0.5 * np.sin(2 * np.pi * (100 + 3000 * t / t[-1]) * t))
     .astype(np.float32), 0.80),
    ("tone_440", lambda n, g, t:
     (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), 0.50),
    ("noise", lambda n, g, t:
     (0.1 * g.standard_normal(n)).astype(np.float32), 0.20),
]


@pytest.mark.parametrize("name,make,thr", CASES,
                         ids=[c[0] for c in CASES])
def test_streams_decode_on_lavc(name, make, thr):
    """Our encoder's storage frames are REAL AMR: lavc decodes every
    frame (no errors, full length) and reconstructs the signal."""
    n = 8000
    g = np.random.default_rng(42)
    t = np.arange(n) / 8000.0
    sig = make(n, g, t)
    bs = ah.amrnb_encode(sig)
    assert len(bs) == (n // 160) * 32
    dec = _lavc_decode(bs)
    assert len(dec) >= n - 160  # every frame produced output
    m = min(n, len(dec))
    c = np.corrcoef(sig[:m].astype(np.float64), dec[:m])[0, 1]
    assert c > thr, f"{name}: corr {c:.3f} <= {thr}"


def test_native_decoder_tracks_lavc():
    """Our from-scratch decoder and lavc agree sample-wise on our
    streams (the replica's pinned decode chain, incl. pitch emphasis and
    feedback truncation)."""
    sig = _speechlike(4800)
    bs = ah.amrnb_encode(sig)
    lavc = _lavc_decode(bs)
    nat = ah.amrnb_decode(bs)
    m = min(len(lavc), len(nat))
    scale = np.abs(lavc[:m]).max()
    assert scale > 1e-3
    err = np.abs(nat[:m] - lavc[:m]).max() / scale
    # residual unmodeled fixed-point detail drifts through the
    # adaptive-codebook feedback but is STATIONARY at workload length
    # (low-gp frames reset it — test_long_stream_error_is_stationary
    # pins a flat per-5s-window floor over 30 s); peak-bounded here,
    # energy-tight below
    assert err < 0.25, f"native vs lavc rel err {err:.3f}"
    # energy-domain agreement is much tighter
    snr = 10 * np.log10(np.dot(lavc[:m], lavc[:m]) /
                        max(np.dot(lavc[:m] - nat[:m],
                                   lavc[:m] - nat[:m]), 1e-12))
    assert snr > 18.0, f"native vs lavc SNR {snr:.1f} dB"


# ---------------------------------------------------------------------
# Low-rate modes 0..6 (amr[br=4k75 .. 10k2]): same conformance bar as
# MR122, per mode (native/augment/amrnb_low.cc; tables from the
# tools/amr_tables/ black-box campaign). Matches the reference's
# cellular entries (/root/reference/channel_simulation/
# simulated_channel.py:30-33).
LOW_MODES = [(0, "4k75"), (1, "5k15"), (2, "5k9"), (3, "6k7"),
             (4, "7k4"), (5, "7k95"), (6, "10k2")]


@pytest.mark.parametrize("mode,name", LOW_MODES,
                         ids=[m[1] for m in LOW_MODES])
def test_low_mode_streams_decode_on_lavc(mode, name):
    """Each low-rate encoder's storage frames are REAL AMR: lavc decodes
    every frame and reconstructs speechlike input with codec-class
    fidelity (measured 0.93-0.96; bar leaves margin)."""
    n = 8000
    sig = _speechlike(n)
    bs = ah.amrnb_encode(sig, mode=mode)
    fb = ah.AMRNB_MODE_BYTES[mode]
    assert len(bs) == (n // 160) * fb
    for i in range(n // 160):  # TOC: (mode << 3) | 0x04
        assert bs[i * fb] == (mode << 3) | 0x04
    dec = _lavc_decode(bs, fb)
    assert len(dec) >= n - 160
    m = min(n, len(dec))
    c = np.corrcoef(sig[:m].astype(np.float64), dec[:m])[0, 1]
    assert c > 0.88, f"{name}: corr {c:.3f} <= 0.88"


@pytest.mark.parametrize("mode,name", LOW_MODES,
                         ids=[m[1] for m in LOW_MODES])
def test_low_mode_native_decoder_tracks_lavc(mode, name):
    """The native low-mode decoder replica and lavc agree in the energy
    domain on our streams (open decoder-side laws — dispersion row
    selection, MR102 fixed-point detail — bound the floor; measured
    23-53 dB per mode)."""
    sig = _speechlike(4800)
    bs = ah.amrnb_encode(sig, mode=mode)
    lavc = _lavc_decode(bs, ah.AMRNB_MODE_BYTES[mode])
    nat = ah.amrnb_decode(bs)
    m = min(len(lavc), len(nat))
    assert np.abs(lavc[:m]).max() > 1e-3
    snr = 10 * np.log10(np.dot(lavc[:m], lavc[:m]) /
                        max(np.dot(lavc[:m] - nat[:m],
                                   lavc[:m] - nat[:m]), 1e-12))
    assert snr > 18.0, f"{name}: native vs lavc SNR {snr:.1f} dB"


def test_low_mode_roundtrip_channel():
    """amrnb_channel at 16 kHz input for a couple of low modes."""
    sig = _speechlike(3200, seed=5)
    sig16 = ah.resample(sig, 8000, 16000)
    for mode in (0, 6):
        out = ah.amrnb_channel(sig16, sample_rate=16000, mode=mode)
        assert out.shape == sig16.shape
        c = np.corrcoef(sig16.astype(np.float64),
                        out.astype(np.float64))[0, 1]
        assert c > 0.7, f"mode {mode}: corr {c:.3f}"


def test_degrade_routes_all_amr_to_real_bitstream():
    """Every amr[br=*] channel entry (dtx and nodtx) now uses the real
    bitstream hop, not the algorithmic-class ACELP tier."""
    from asvspoof2021_air_tpu.cli.degrade import apply_codec, _amrnb_mode
    sig = _speechlike(1600, seed=9)
    sig16 = ah.resample(sig, 8000, 16000)
    for name, kbps in [("amr[br=4k75]", 4.75), ("amr[br=5k15]", 5.15),
                       ("amr[br=5k9,nodtx]", 5.9), ("amr[br=6k7]", 6.7),
                       ("amr[br=7k4,nodtx]", 7.4), ("amr[br=7k95]", 7.95),
                       ("amr[br=10k2]", 10.2)]:
        assert _amrnb_mode(kbps) is not None
        out_real = apply_codec(sig16, name, 16000)
        out_acelp = ah.acelp_channel(sig16, 8000, kbps, 16000)
        assert out_real.shape == sig16.shape
        assert np.abs(out_real - out_acelp).max() > 1e-4  # distinct paths


# ---------------------------------------------------------------------
@pytest.mark.parametrize("mode", [7, 0, 6], ids=["12k2", "4k75", "10k2"])
def test_long_stream_error_is_stationary(mode):
    """Workload-length conformance (round-3 verdict: 'harden MR122
    conformance to workload length'): on a 30 s speech-modulated stream
    the native-vs-lavc error does NOT compound through the adaptive
    feedback — every 5 s window holds the same SNR floor (measured
    ~21-24 dB flat, incl. the LAST window; low-gp frames reset the
    feedback)."""
    n = 240000  # 30 s
    sig = _speechlike(n)
    bs = ah.amrnb_encode(sig, mode=mode)
    lavc = _lavc_decode(bs, ah.AMRNB_MODE_BYTES[mode])
    nat = ah.amrnb_decode(bs)
    m = min(len(lavc), len(nat), n)
    assert m >= n - 160  # every frame decoded
    c = np.corrcoef(sig[:m].astype(np.float64), lavc[:m])[0, 1]
    assert c > 0.9, f"30 s encode corr {c:.3f}"
    for t0 in range(0, 30, 5):
        a = lavc[t0 * 8000:(t0 + 5) * 8000]
        b = nat[t0 * 8000:(t0 + 5) * 8000].astype(np.float64)
        k = min(len(a), len(b))
        snr = 10 * np.log10(np.dot(a[:k], a[:k]) /
                            max(np.dot(a[:k] - b[:k], a[:k] - b[:k]),
                                1e-12))
        assert snr > 18.0, (
            f"mode {mode}: window {t0}-{t0 + 5}s SNR {snr:.1f} dB — "
            "error must stay stationary, not compound")


# ---------------------------------------------------------------------
# DTX / SID (the dtx-default amr entries, simulated_channel.py:30-35).
# ORACLE-FREE tier: the in-image lavc amrnb decoder REJECTS SID frames
# ("dtx mode is not implemented"), so conformance here is structural +
# round-trip through our own decoder (docs/CODECS.md carries the
# caveat). Speech frames inside DTX streams are the same lavc-verified
# encoders as above.
def _speech_silence_speech():
    sp = _speechlike(4800)
    sil = (5e-4 * np.random.default_rng(1)
           .standard_normal(4800)).astype(np.float32)
    return np.concatenate([sp, sil, 0.8 * sp]).astype(np.float32)


def test_dtx_framing_and_roundtrip():
    """DTX streams carry VAD-gated speech + SID (type 8, 6 bytes) +
    NO_DATA (type 15, TOC only); our decoder reconstructs speech AND
    matches the comfort-noise level to the input silence."""
    sig = _speech_silence_speech()
    for mode in (0, 4, 7):
        bs = ah.amrnb_encode(sig, mode=mode, dtx=True)
        fts = []
        p = 0
        while p < len(bs):
            ft = (bs[p] >> 3) & 0xF
            fts.append(ft)
            if ft == 8:
                p += 6
            elif ft == 15:
                p += 1
            else:
                p += ah.AMRNB_MODE_BYTES[ft]
        assert fts.count(8) >= 2, f"mode {mode}: no SID updates"
        assert fts.count(15) >= 10, f"mode {mode}: no NO_DATA frames"
        assert fts.count(mode) >= 50, f"mode {mode}: speech frames gated"
        # SID cadence: a SID opens each silence run, then every 8th frame
        dec = ah.amrnb_decode(bs)
        # Full-length decode: NO_DATA/SID frames must still emit their
        # 160 samples (pins the round-4 buffer-truncation bug where the
        # output buffer assumed >=13 bytes/frame).
        assert len(dec) >= len(sig) - 160, (
            f"mode {mode}: dtx decode truncated to {len(dec)}")
        m = min(len(sig), len(dec))
        c = np.corrcoef(sig[:m].astype(np.float64),
                        dec[:m].astype(np.float64))[0, 1]
        assert c > 0.85, f"mode {mode}: dtx corr {c:.3f}"
        sil_in = float(np.sqrt((sig[5600:8800] ** 2).mean()))
        sil_out = float(np.sqrt((dec[5600:8800] ** 2).mean()))
        assert 0.5 * sil_in < sil_out < 2.0 * sil_in, (
            f"mode {mode}: CN level {sil_out:.2e} vs input {sil_in:.2e}")


def test_dtx_differs_from_nodtx():
    """dtx and nodtx produce measurably different output on
    silence-padded speech (the reference's dtx-default entries vs their
    nodtx twins), while both reconstruct the speech run."""
    from asvspoof2021_air_tpu.cli.degrade import apply_codec
    sig = _speech_silence_speech()
    sig16 = ah.resample(sig, 8000, 16000)
    out_dtx = apply_codec(sig16, "amr[br=6k7]", 16000)
    out_nodtx = apply_codec(sig16, "amr[br=6k7,nodtx]", 16000)
    assert out_dtx.shape == out_nodtx.shape == sig16.shape
    assert np.abs(out_dtx - out_nodtx).max() > 1e-4
    for out in (out_dtx, out_nodtx):
        c = np.corrcoef(sig16[:9000].astype(np.float64),
                        out[:9000].astype(np.float64))[0, 1]
        assert c > 0.85


def test_frame_structure():
    """RFC 4867 octet-aligned storage framing: TOC 0x3C (FT=7, Q=1),
    32 bytes/frame, deterministic encode."""
    sig = _speechlike(1600, seed=3)
    bs = ah.amrnb_encode(sig)
    assert len(bs) == 10 * 32
    for i in range(10):
        assert bs[i * 32] == 0x3C
    assert bs == ah.amrnb_encode(sig)


def test_roundtrip_basic():
    sig = _speechlike(3200, seed=5)
    out = ah.amrnb_channel(sig, sample_rate=8000)
    assert out.shape == sig.shape
    assert np.abs(out).max() > 0.01
    c = np.corrcoef(sig.astype(np.float64), out.astype(np.float64))[0, 1]
    assert c > 0.8
    # decoder rejects reserved frame types (9..14)
    with pytest.raises(ValueError):
        ah.amrnb_decode(bytes([(9 << 3) | 0x04] + [0] * 5))


def test_degrade_routes_12k2_to_real_amr():
    """The amr[br=12k2] channel entry uses the real MR122 bitstream hop
    (not the algorithmic-class ACELP tier)."""
    from asvspoof2021_air_tpu.cli.degrade import apply_codec
    sig = _speechlike(3200, seed=7)
    sig16 = ah.resample(sig, 8000, 16000)
    out_real = apply_codec(sig16, "amr[br=12k2]", 16000)
    out_acelp = ah.acelp_channel(sig16, 8000, 12.2, 16000)
    assert out_real.shape == sig16.shape
    assert np.abs(out_real - out_acelp).max() > 1e-4  # distinct paths
    c = np.corrcoef(sig16.astype(np.float64),
                    out_real.astype(np.float64))[0, 1]
    assert c > 0.75


def test_dtx_cn_level_matches_quantizer_law():
    """Independent comfort-noise cross-check (round-5 verdict item 7):
    instead of only round-tripping (encoder and decoder could share a
    compensating bug), derive the SID energy index ANALYTICALLY and
    check both the bitstream and the synthesized level against it.

    Design: the 'silence' is white noise at a known sigma. LP analysis
    of white noise gives A(z) ~ 1, so the encoder's residual RMS ~
    sigma and the documented 6-bit grid (1.5 dB steps from -96 dBFS,
    amrnb_low.cc cn_energy_encode) pins the index to
    round((20*log10(sigma) + 96) / 1.5). The SID payload layout is
    lsf0 8 | lsf1 9 | lsf2 9 | energy 6 | 8 spare (sid_pack), so the
    index is readable straight off the frame bytes. The decoded CN
    must then sit at the DECODED grid level (not merely near the
    input), through the near-flat 1/A."""
    rng = np.random.default_rng(5)
    sigma = 1e-3  # -60 dBFS -> analytic index (96 - 60) / 1.5 = 24
    sp = _speechlike(4800)
    sil = (sigma * rng.standard_normal(12800)).astype(np.float32)
    sig = np.concatenate([sp, sil, 0.8 * sp]).astype(np.float32)
    bs = ah.amrnb_encode(sig, mode=4, dtx=True)

    def sid_eidx(payload):
        v = 0
        for b in payload:
            v = (v << 8) | b
        return (v >> 8) & 0x3F

    eidxs, p = [], 0
    while p < len(bs):
        ft = (bs[p] >> 3) & 0xF
        if ft == 8:
            eidxs.append(sid_eidx(bs[p + 1:p + 6]))
            p += 6
        elif ft == 15:
            p += 1
        else:
            p += ah.AMRNB_MODE_BYTES[ft]
    assert len(eidxs) >= 2, "designed silence produced <2 SID updates"
    # Steady-state SIDs (skip the first: its analysis window straddles
    # the speech tail) must hit the analytic index within one grid step.
    analytic = round((20 * np.log10(sigma) + 96) / 1.5)
    for e in eidxs[1:]:
        assert abs(e - analytic) <= 1, (eidxs, analytic)
    # The synthesized comfort noise must sit at the DECODED grid level.
    decoded_rms = 10.0 ** ((eidxs[-1] * 1.5 - 96.0) / 20.0)
    dec = ah.amrnb_decode(bs)
    cn = dec[7000:16000].astype(np.float64)
    cn_rms = float(np.sqrt((cn ** 2).mean()))
    assert decoded_rms / 1.5 < cn_rms < decoded_rms * 1.5, (
        cn_rms, decoded_rms, eidxs)
