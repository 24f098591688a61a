"""On-device augmentation tests."""

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.ops.augment import (
    ChannelAugmenter,
    bitrate_noise,
    g711_sim,
    ir_convolve,
    rms_normalize,
    synthetic_ir_bank,
    telephony_bandlimit,
)


def tone(freq, sr=16000, n=16000, amp=0.3):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def band_power(x, freq, sr=16000, bw=100.0):
    X = np.abs(np.fft.rfft(np.asarray(x)))
    f = np.fft.rfftfreq(len(x), 1 / sr)
    return float((X[(f > freq - bw) & (f < freq + bw)] ** 2).sum())


def test_ir_convolve_identity_and_delay():
    g = np.random.default_rng(0)
    waves = jnp.asarray(g.standard_normal((2, 4000)), jnp.float32)
    irs = np.zeros((2, 64), np.float32)
    irs[0, 0] = 1.0     # identity
    irs[1, 10] = 1.0    # 10-sample delay
    out = np.asarray(ir_convolve(waves, jnp.asarray(irs), jnp.asarray([0, 1])))
    np.testing.assert_allclose(out[0], np.asarray(waves)[0], atol=1e-4)
    np.testing.assert_allclose(out[1, 10:], np.asarray(waves)[1, :-10], atol=1e-4)


def test_rms_normalize():
    g = np.random.default_rng(1)
    waves = jnp.asarray(0.3 * g.standard_normal((3, 8000)), jnp.float32)
    out = np.asarray(rms_normalize(waves, jnp.asarray([-26.0, -29.0, -35.0])))
    for i, target in enumerate([-26.0, -29.0, -35.0]):
        rms_db = 20 * np.log10(np.sqrt((out[i] ** 2).mean()))
        assert abs(rms_db - target) < 0.1


def test_bandlimit_attenuates_out_of_band():
    x = jnp.asarray(np.stack([tone(1000), tone(6000)]))
    nb = telephony_bandlimit(x, wideband=False)
    # 1 kHz passes, 6 kHz is crushed
    assert band_power(nb[0], 1000) > 100 * band_power(nb[0], 6000)
    in_ratio = band_power(nb[0], 1000) / band_power(x[0], 1000)
    out_ratio = band_power(nb[1], 6000) / band_power(x[1], 6000)
    assert in_ratio > 0.5
    assert out_ratio < 1e-3
    wb = telephony_bandlimit(x, wideband=True)
    assert band_power(wb[1], 6000) / band_power(x[1], 6000) > 0.5


def test_g711_roundtrip_close():
    x = jnp.asarray(tone(1000)[None])
    for law in ("u", "a"):
        y = np.asarray(g711_sim(x, law))
        # band-limited + companded signal stays correlated with input
        c = np.corrcoef(y[0], np.asarray(x)[0])[0, 1]
        assert c > 0.95, (law, c)


def test_bitrate_noise_snr():
    g = np.random.default_rng(2)
    x = jnp.asarray(0.3 * g.standard_normal((2, 16000)), jnp.float32)
    y = bitrate_noise(x, jax.random.PRNGKey(0), jnp.asarray([20.0, 40.0]))
    noise = np.asarray(y) - np.asarray(x)
    for i, snr_db in enumerate([20.0, 40.0]):
        measured = 10 * np.log10(
            (np.asarray(x)[i] ** 2).mean() / (noise[i] ** 2).mean()
        )
        assert abs(measured - snr_db) < 1.5


def test_channel_augmenter_jit():
    g = np.random.default_rng(3)
    waves = jnp.asarray(0.3 * g.standard_normal((8, 8000)), jnp.float32)
    aug = ChannelAugmenter(ir_bank=synthetic_ir_bank())

    @jax.jit
    def run(w, key):
        return aug(w, key, apply_ir=True)

    out, fam, ir_idx = run(waves, jax.random.PRNGKey(0))
    assert out.shape == waves.shape
    assert fam.shape == (8,)
    assert np.all(np.isfinite(np.asarray(out)))
    # different keys draw different channels
    out2, fam2, _ = run(waves, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(fam), np.asarray(fam2))


def test_synthetic_ir_bank_shape():
    bank = synthetic_ir_bank(13, 512)
    assert bank.shape == (13, 512)
    assert np.all(np.abs(bank).sum(1) > 0.99)


def test_synthesize_device_and_space_irs():
    """Device IRs: short band-passed modal responses; space IRs: direct path
    + reverb tail with positive decay energy over tens of ms."""
    import numpy as np

    from asvspoof2021_air_tpu.ops.augment import (
        synthesize_device_ir,
        synthesize_space_ir,
    )

    g = np.random.default_rng(0)
    dev = synthesize_device_ir(g)
    assert dev.shape == (1024,) and np.isfinite(dev).all()
    # energy concentrated early (short decays)
    e = dev ** 2
    assert e[:256].sum() > 5 * e[512:].sum()
    # band-passed: DC ~ 0
    assert abs(dev.sum()) < 0.1 * np.abs(dev).sum()

    sp = synthesize_space_ir(g)
    assert sp.shape == (8192,) and np.isfinite(sp).all()
    assert np.argmax(np.abs(sp)) == 0  # direct path first
    e = sp ** 2
    assert e[2048:].sum() > 0.001 * e.sum()  # has a late tail


def test_make_irs_cli(tmp_path):
    from asvspoof2021_air_tpu.cli.degrade import make_irs
    from asvspoof2021_air_tpu.data.audio_io import read_wav
    from asvspoof2021_air_tpu.data.protocol import (
        DEVICE_IR_INVENTORY,
        SPACE_IR_INVENTORY,
    )

    import os

    n = make_irs(str(tmp_path), seed=1)
    assert n == 74 + 15 == len(DEVICE_IR_INVENTORY) + len(SPACE_IR_INVENTORY)
    dev_files = os.listdir(tmp_path / "devices")
    assert len(dev_files) == 74
    # reference vocabulary stems present (label-compatible naming)
    assert "telephonehornT65C-16000.wav" in dev_files
    w, sr = read_wav(str(tmp_path / "space" / "BottleHall-16000.wav"))
    assert sr == 16000 and len(w) == 8192
