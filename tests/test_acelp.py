"""Native ACELP codec tier: analysis-by-synthesis CELP for the AMR/SILK
channel families (native/augment/acelp.cc).

Validation (3GPP bit-compatibility is impossible offline — standardized
codebooks unavailable): bitrate-ladder monotonicity, determinism, codec-class
SNR ranges, spectral-envelope preservation, frame-erasure behavior, and the
feature-matched tuning of the on-device family stand-ins.
"""

import functools

import numpy as np

from asvspoof2021_air_tpu.cli import degrade as _degrade
from asvspoof2021_air_tpu.data import augment_host as ah

# This file certifies the self-contained NATIVE tier; pin it explicitly
# (the CLI default `fidelity=auto` promotes silk entries to real
# SILK-mode Opus whenever the in-image libopus is loadable — that tier
# is covered by tests/test_system_codecs.py).
apply_codec = functools.partial(_degrade.apply_codec, fidelity="native")


def voice(n=32000, sr=16000, f0=120.0, seed=0, level=0.3):
    g = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = np.zeros(n)
    for h in range(1, int(0.45 * sr / f0)):
        f = h * f0
        amp = (1.0 / (1 + ((f - 600) / 250) ** 2)
               + 0.4 / (1 + ((f - 1800) / 350) ** 2)) / (1 + (f / 2500) ** 2)
        x += amp * np.sin(2 * np.pi * f * t + g.uniform(0, 2 * np.pi))
    x += 0.02 * g.standard_normal(n)
    return (level * x / np.abs(x).max()).astype(np.float32)


def hp(x, pole=0.989):
    y = np.empty_like(x)
    m1 = m2 = 0.0
    for i, v in enumerate(x):
        o = v - m2 + pole * m1
        m2 = v
        y[i] = o
        m1 = o
    return y


def snr_db(ref, y, skip=1000):
    e = ref[skip:] - y[skip:]
    return 10 * np.log10((ref[skip:] ** 2).mean() / max((e ** 2).mean(), 1e-12))


def test_nb_ladder_monotonic_and_in_range():
    """More pulses (higher AMR mode) -> better SNR; absolute values in the
    CELP range on voiced input."""
    x = voice(16000, 8000)
    ref = hp(x)
    snrs = []
    for kbps in (4.75, 7.4, 12.2):
        y = ah.acelp_channel(x, 8000, kbps, sample_rate=8000)
        assert np.isfinite(y).all()
        snrs.append(snr_db(ref, y))
    assert snrs[0] < snrs[2], snrs
    assert 2.0 < snrs[0] < 25.0 and 5.0 < snrs[2] < 25.0, snrs


def test_wb_ladder_monotonic():
    x = voice(32000, 16000, f0=203.0)
    ref = hp(x)
    snrs = []
    for kbps in (6.6, 12.65, 23.05):
        y = ah.acelp_channel(x, 16000, kbps, sample_rate=16000)
        assert np.isfinite(y).all()
        snrs.append(snr_db(ref, y))
    assert snrs[0] < snrs[2], snrs
    assert snrs[2] > 4.0, snrs


def test_deterministic():
    x = voice(8000, 8000)
    y1 = ah.acelp_channel(x, 8000, 12.2, sample_rate=8000)
    y2 = ah.acelp_channel(x, 8000, 12.2, sample_rate=8000)
    np.testing.assert_array_equal(y1, y2)


def test_spectral_envelope_preserved():
    x = voice(16000, 8000)
    y = ah.acelp_channel(x, 8000, 12.2, sample_rate=8000)
    fx = np.abs(np.fft.rfft(hp(x))) ** 2
    fy = np.abs(np.fft.rfft(y)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / 8000)
    for lo, hi in ((200, 800), (800, 1600), (1600, 2800)):
        band = (freqs >= lo) & (freqs < hi)
        ratio = 10 * np.log10(fy[band].sum() / fx[band].sum())
        assert abs(ratio) < 4.5, f"band {lo}-{hi}: {ratio:.1f} dB"


def test_silence_stays_silent():
    x = np.zeros(8000, np.float32)
    y = ah.acelp_channel(x, 8000, 12.2, sample_rate=8000)
    assert np.abs(y).max() < 1e-2


def test_frame_erasure():
    x = voice(32000, 16000)
    y0 = ah.frame_erasure(x, 0.0, seed=1)
    np.testing.assert_array_equal(y0, x)  # 0% loss is the identity
    y10 = ah.frame_erasure(x, 10.0, seed=1)
    frames = len(x) // 320
    changed = sum(
        not np.array_equal(x[i * 320:(i + 1) * 320],
                           y10[i * 320:(i + 1) * 320])
        for i in range(frames)
    )
    assert 2 <= changed <= 25  # ~10% of 100 frames, concealed by repetition


def test_degrade_routes_codec_families():
    """Every AMR/SILK vocabulary entry routes through a real codec tier
    (bitstream codecs for amr/amrwb, ACELP for silk/g729a/g728 under
    fidelity=native) and produces finite, non-identity output; loss
    variants differ from their lossless base."""
    x = voice(32000, 16000)
    for name in ("amr[br=4k75]", "amr[br=12k2,nodtx]", "amrwb[br=23k05]",
                 "silk[br=15k]", "silkwb[br=30k]", "g729a", "g728"):
        y = apply_codec(x, name)
        assert y.shape == x.shape and np.isfinite(y).all(), name
        assert not np.allclose(y, x), name
    base = apply_codec(x, "silk[br=15k]")
    lossy = apply_codec(x, "silk[br=15k,loss=10]")
    assert not np.allclose(base, lossy)


def test_family_snrs_feature_matched():
    """The on-device family stand-ins (ops/augment.py CHANNEL_FAMILIES) are
    tuned so their LFCC distortion matches the real native codec tier's:
    verify the real codecs' LFCC distances fall near the stand-in values the
    snr_db entries were fit to (amr_nb/silk_nb 15.0, silk_wb 28.0,
    amr_wb 18.0 — re-fit round 5 when the amrwb entries flipped to the
    real bitstream codec; gsmfr 12.2)."""
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.ops.lfcc import LFCC

    lfcc = LFCC()
    x = voice(32000, 16000)
    fx = np.asarray(lfcc(jnp.asarray(x[None])))[0, 5:-5, :20]

    def dist(name):
        y = apply_codec(x, name).astype(np.float32)
        fy = np.asarray(lfcc(jnp.asarray(y[None])))[0, 5:-5, :20]
        return float(np.sqrt(((fx - fy) ** 2).mean()))

    d_nb = np.mean([dist("amr[br=4k75]"), dist("amr[br=7k4]"),
                    dist("amr[br=12k2]")])
    d_wb = np.mean([dist("amrwb[br=6k6]"), dist("amrwb[br=23k05]")])
    # fitted anchors: 1.53 (nb), 1.37 (wb, real-codec tier incl. its
    # ~15-sample delay; round-5 re-fit); drift beyond ~25% means the
    # codec changed and the family table needs re-fitting
    assert 1.2 < d_nb < 2.1, d_nb
    assert 1.0 < d_wb < 1.8, d_wb


def test_mdct_codec_ladder():
    """mp3/aac transform-codec sim: SNR monotone in bitrate; low rates cut
    high-frequency bands (spectral holes) while preserving the low band."""
    x = voice(32000, 16000)
    snrs = []
    for kbps in (8.0, 16.0, 32.0):
        y = ah.mdct_codec(x, kbps, "mp3")
        assert np.isfinite(y).all()
        sl = slice(1200, -1200)
        e = x[sl] - y[sl]
        snrs.append(10 * np.log10((x[sl] ** 2).mean() / (e ** 2).mean()))
    assert snrs[0] < snrs[2] and snrs[2] > 10.0, snrs
    # 8 kbps drops HF energy but keeps the low band
    y8 = ah.mdct_codec(x, 8.0, "mp3")
    fx = np.abs(np.fft.rfft(x)) ** 2
    fy = np.abs(np.fft.rfft(y8)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / 16000)
    lo = (freqs > 100) & (freqs < 1500)
    hi = freqs > 5000
    assert fy[lo].sum() / fx[lo].sum() > 0.5
    assert fy[hi].sum() / fx[hi].sum() < 0.5


def test_mdct_codec_deterministic_and_aac_differs():
    x = voice(16000, 16000)
    y1 = ah.mdct_codec(x, 16.0, "mp3")
    y2 = ah.mdct_codec(x, 16.0, "mp3")
    np.testing.assert_array_equal(y1, y2)
    ya = ah.mdct_codec(x, 16.0, "aac")
    assert not np.allclose(y1, ya)  # different frame size -> different codec


def test_compression_degrade_uses_transform_codec(tmp_path):
    from asvspoof2021_air_tpu.cli.degrade import compression_degrade
    from asvspoof2021_air_tpu.data.audio_io import read_wav, write_wav

    d = tmp_path / "wavs"
    d.mkdir()
    write_wav(str(d / "LA_T_0001.wav"), voice(16000, 16000))
    n = compression_degrade(str(d), str(tmp_path / "comp"), mode="parallel",
                            seed=1)
    assert n == 6
    import glob
    f = glob.glob(str(tmp_path / "comp" / "*mp3[[]8k[]]*"))[0]
    w, sr = read_wav(f)
    assert sr == 16000 and np.isfinite(w).all()


def test_frame_erasure_differs_across_utterances():
    """Loss patterns must vary per utterance, not be fixed per codec variant
    (the acoustic-simulator's loss is random per file)."""
    import zlib

    x1 = voice(32000, 16000, seed=10)
    x2 = voice(32000, 16000, seed=11)
    name = "silk[br=15k,loss=10]"
    y1 = apply_codec(x1, name, erasure_seed=zlib.crc32(b"LA_T_0000001"))
    y2 = apply_codec(x1, name, erasure_seed=zlib.crc32(b"LA_T_0000002"))
    base1 = apply_codec(x1, "silk[br=15k]")
    # identify erased frame positions (frame == previous frame)
    def erased(y):
        pos = set()
        for i in range(1, len(y) // 320):
            if np.array_equal(y[i * 320:(i + 1) * 320],
                              y[(i - 1) * 320:i * 320]):
                pos.add(i)
        return pos
    del x2, base1
    assert erased(y1) != erased(y2)


def test_low_pitch_does_not_corrupt():
    """Regression: lags at max_lag with fractional refinement read before the
    excitation history start (ASan heap-buffer-overflow) — a 55 Hz source
    (145-sample period at 8 kHz) must code cleanly."""
    sr = 8000
    t = np.arange(16000) / sr
    x = (0.3 * np.sin(2 * np.pi * 55.0 * t)).astype(np.float32)
    y = ah.acelp_channel(x, 8000, 12.2, sample_rate=8000)
    assert np.isfinite(y).all()
    assert np.abs(y).max() < 2.0


def test_channel_families_separable_in_lfcc_space():
    """The ADV_AUG premise: channel labels must carry acoustic signal in the
    feature space the spoofing models see. With the REAL codec tier, a
    trivial nearest-centroid probe over mean LFCC vectors must classify
    held-out utterances' codec family well above chance (VERDICT r01 flagged
    this as unproven while the families were noise stand-ins)."""
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.ops.lfcc import LFCC

    lfcc = LFCC()
    families = {
        "clean": None,
        "g711": "g711[law=u]",
        "amr_lo": "amr[br=4k75]",
        "gsmfr": "gsmfr",
        "amrwb": "amrwb[br=23k05]",
        "mp3": None,  # handled via mdct below
    }
    n_train_utts, n_test_utts = 4, 3

    def featurize(wave):
        f = np.asarray(lfcc(jnp.asarray(wave[None].astype(np.float32))))
        return f[0, 5:-5, :20].mean(axis=0)  # mean static cepstrum

    def degrade(wave, fam):
        if fam == "clean":
            return wave
        if fam == "mp3":
            return ah.mdct_codec(wave, 8.0, "mp3")
        return apply_codec(wave, families[fam])

    X_train, y_train, X_test, y_test = [], [], [], []
    names = list(families)
    for ci, fam in enumerate(names):
        for u in range(n_train_utts + n_test_utts):
            w = voice(24000, 16000, f0=100.0 + 17.0 * u, seed=100 + u)
            feat = featurize(degrade(w, fam))
            if u < n_train_utts:
                X_train.append(feat)
                y_train.append(ci)
            else:
                X_test.append(feat)
                y_test.append(ci)
    X_train, X_test = np.array(X_train), np.array(X_test)
    centroids = np.stack([
        X_train[np.array(y_train) == c].mean(axis=0) for c in range(len(names))
    ])
    pred = np.argmin(
        ((X_test[:, None, :] - centroids[None]) ** 2).sum(-1), axis=1
    )
    acc = (pred == np.array(y_test)).mean()
    assert acc >= 0.5, f"family probe accuracy {acc:.2f} (chance {1/len(names):.2f})"


def test_never_sticks_in_silent_state():
    """Regression: the sign-invariant matching-pursuit score could converge
    with negative target correlation, clamping the code gain to zero and
    locking the encoder in an all-zero attractor for ~half of all inputs
    (e.g. this exact 203 Hz draw at 8 kHz used to decode to pure silence)."""
    for seed in range(6):
        for f0 in (97.0, 203.0):
            x = voice(16000, 8000, f0=f0, seed=seed)
            y = ah.acelp_channel(x, 8000, 12.2, sample_rate=8000)
            rms_ratio = np.sqrt((y ** 2).mean() / (x ** 2).mean())
            assert rms_ratio > 0.3, (seed, f0, rms_ratio)
