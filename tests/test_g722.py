"""Native ITU-T G.722 sub-band ADPCM codec: structure + signal validation.

The reference's channel vocabulary includes g722[br=64k|56k|48k]
(/root/reference/channel_simulation/simulated_channel.py:36), produced there
by the external acoustic-simulator. Here it is a real in-process sub-band
ADPCM implementation (native/augment/g722.cc): 24-tap QMF band split,
embedded 6/5/4-bit low-band + 2-bit high-band ADPCM. ITU test vectors are
not available offline, so validation is: bitstream structure, embedded-mode
ordering, encode/decode vs roundtrip consistency, band-dependent fidelity
(fine low band / coarse 2-bit high band), idle channel, and tandem
stability.
"""

import numpy as np
import pytest

from asvspoof2021_air_tpu.data import augment_host as ah

SR = 16000


def speechlike(n=32000, f0=120, seed=0, level=0.3):
    g = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = np.zeros(n)
    for h in range(1, int(7000 / f0)):
        f = h * f0
        amp = (1.0 / (1 + ((f - 500) / 300) ** 2)
               + 0.5 / (1 + ((f - 1500) / 400) ** 2)
               + 0.1 / (1 + ((f - 5000) / 1000) ** 2))
        x += amp * np.sin(2 * np.pi * f * t + g.uniform(0, 2 * np.pi))
    return (level * x / np.abs(x).max()).astype(np.float32)


def snr_db(x, y, max_lag=40):
    """Lag-searched SNR: G.722's QMF pair delays by 22 samples."""
    best = -np.inf
    for lag in range(max_lag):
        yy = y[lag:]
        xx = x[: len(yy)]
        err = xx - yy
        best = max(best, 10 * np.log10(
            (xx ** 2).mean() / max((err ** 2).mean(), 1e-12)))
    return best


def test_bitstream_structure():
    x = speechlike()
    codes = ah.g722_encode(x)
    assert len(codes) == len(x) // 2  # one byte per two samples
    arr = np.frombuffer(codes, np.uint8)
    assert arr.min() >= 0 and arr.max() <= 255
    # on active speech both band fields vary
    assert len(np.unique(arr & 0x3F)) > 8    # low-band 6-bit codes
    assert len(np.unique(arr >> 6)) >= 2     # high-band 2-bit codes


def test_encode_decode_matches_roundtrip():
    x = speechlike(seed=1)
    for kbps in (64, 56, 48):
        via_bits = ah.g722_decode(ah.g722_encode(x), kbps)[: len(x)]
        direct = ah.g722_roundtrip(x, kbps)[: len(via_bits)]
        np.testing.assert_array_equal(via_bits, direct)


def test_embedded_mode_ordering():
    """Same bitstream decoded at 64/56/48 kbps: SNR strictly decreases as
    decoder bits are dropped (the embedded ADPCM property)."""
    x = speechlike(seed=2)
    codes = ah.g722_encode(x)
    snrs = [snr_db(x, ah.g722_decode(codes, k)) for k in (64, 56, 48)]
    assert snrs[0] > snrs[1] > snrs[2], snrs
    assert snrs[0] > 20.0, snrs      # 64 kbps: transparent-ish
    assert snrs[2] > 12.0, snrs      # 48 kbps: still a real codec


def test_band_dependent_fidelity():
    """Low band (6-bit) is much finer than the high band (2-bit)."""
    t = np.arange(SR) / SR
    lo = (0.3 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    hi = (0.3 * np.sin(2 * np.pi * 5000 * t)).astype(np.float32)
    snr_lo = snr_db(lo, ah.g722_roundtrip(lo, 64))
    snr_hi = snr_db(hi, ah.g722_roundtrip(hi, 64))
    assert snr_lo > 30.0, snr_lo
    assert snr_lo > snr_hi + 10.0, (snr_lo, snr_hi)
    # the high band is preserved at all (not band-limited away)
    y = ah.g722_roundtrip(hi, 64)
    assert (y ** 2).mean() > 0.25 * (hi ** 2).mean()


def test_idle_channel_and_determinism():
    z = np.zeros(4000, np.float32)
    y = ah.g722_roundtrip(z, 64)
    assert np.abs(y).max() < 1e-2  # near-silent on silence
    x = speechlike(seed=3, n=8000)
    np.testing.assert_array_equal(ah.g722_roundtrip(x, 56),
                                  ah.g722_roundtrip(x, 56))


def test_tandem_stability():
    """Re-encoding its own output must not diverge."""
    x = speechlike(seed=4, n=16000)
    y = ah.g722_roundtrip(x, 64)
    z = ah.g722_roundtrip(y, 64)
    assert np.isfinite(z).all()
    assert snr_db(y, z) > 15.0


def test_degrade_cli_uses_real_g722():
    from asvspoof2021_air_tpu.cli.degrade import apply_codec

    x = speechlike(seed=5, n=16000)
    for name, kbps in (("g722[br=64k]", 64), ("g722[br=56k]", 56),
                       ("g722[br=48k]", 48)):
        y = apply_codec(x, name, SR)
        np.testing.assert_array_equal(y, ah.g722_roundtrip(x, kbps))


def test_family_snr_feature_matched():
    """The on-device 'g722' stand-in snr_db (ops/augment.py) was fit to the
    real codec's LFCC distortion across the three modes, on the same voiced
    test signal the other family entries were fit on
    (tests/test_acelp.py::voice; anchor mean distance 0.19, equivalent
    additive-noise SNR ~37 dB, fitted 2026-08-16, delay-aligned at the
    codec's 23-sample QMF latency); drift beyond ~35% means the codec
    changed and the family table needs re-fitting."""
    import jax.numpy as jnp

    from asvspoof2021_air_tpu.ops.augment import CHANNEL_FAMILIES
    from asvspoof2021_air_tpu.ops.lfcc import LFCC
    from test_acelp import voice

    fam = {f.name: f for f in CHANNEL_FAMILIES}["g722"]
    assert fam.snr_db == pytest.approx(37.0)

    lfcc = LFCC()
    x = voice(32000, SR)
    dists = []
    for kbps in (64, 56, 48):
        y = ah.g722_roundtrip(x, kbps)[23:]
        xa = x[: len(y)]
        fx = np.asarray(lfcc(jnp.asarray(xa[None])))[0, 5:-5, :20]
        fy = np.asarray(lfcc(jnp.asarray(y[None])))[0, 5:-5, :20]
        dists.append(float(np.sqrt(((fx - fy) ** 2).mean())))
    d = float(np.mean(dists))
    assert 0.12 < d < 0.26, (d, dists)
