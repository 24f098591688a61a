"""On-device training front-end: waveform batches -> padded features inside
the step, with parity against the host-side pad policies."""

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.data.pipeline import WaveformIterator, pad_or_crop
from asvspoof2021_air_tpu.ops.augment import ChannelAugmenter, synthetic_ir_bank
from asvspoof2021_air_tpu.ops.lfcc import LFCC
from asvspoof2021_air_tpu.train.frontend import OnDeviceFrontend

FEAT_LEN = 100
HOP = 160


class RawItems:
    def __init__(self, lens, seed=0):
        g = np.random.default_rng(seed)
        self.items = [
            (0.3 * g.standard_normal(l).astype(np.float32), f"U{i}", 0, i % 2)
            for i, l in enumerate(lens)
        ]
        self.num_original = len(lens)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_repeat_padding_matches_host():
    """On-device repeat padding == host-side pad_or_crop('repeat') of the
    per-utterance features."""
    fe = OnDeviceFrontend(feat_len=FEAT_LEN, padding="repeat", use_pallas=False)
    lens = [8000, 12803]  # 51 and 81 frames, both < 100
    L = fe.min_samples() + 2 * HOP
    batch = np.zeros((2, L), np.float32)
    g = np.random.default_rng(1)
    for i, l in enumerate(lens):
        batch[i, :l] = 0.3 * g.standard_normal(l)
    out = np.asarray(
        fe({"wave": jnp.asarray(batch), "length": jnp.asarray(lens)},
           jax.random.PRNGKey(0))
    )
    assert out.shape == (2, FEAT_LEN, 60)

    lfcc = LFCC()
    for i, l in enumerate(lens):
        single = np.asarray(lfcc(jnp.asarray(batch[i:i + 1, :l])))
        expected = pad_or_crop(single, FEAT_LEN, "repeat")
        np.testing.assert_allclose(out[i], expected[0], atol=2e-4,
                                   err_msg=f"utt {i}")


def test_zero_padding_zeroes_invalid_frames():
    fe = OnDeviceFrontend(feat_len=FEAT_LEN, padding="zero", use_pallas=False)
    L = fe.min_samples()
    wave = np.zeros((1, L), np.float32)
    wave[0, :8000] = 0.5
    out = np.asarray(
        fe({"wave": jnp.asarray(wave), "length": jnp.asarray([8000])},
           jax.random.PRNGKey(0))
    )
    t_valid = 1 + 8000 // HOP
    assert np.all(out[0, t_valid:] == 0)
    assert np.any(out[0, :t_valid] != 0)


def test_silence_padding_prepends_like_host():
    """On-device 'silence' policy reproduces the reference PREPEND layout
    (/root/reference/dataset.py:525-528): silence rows first, valid frames
    shifted right — bit-comparable to host-side pad_or_crop."""
    fe = OnDeviceFrontend(feat_len=FEAT_LEN, padding="silence", use_pallas=False)
    lens = [8000, 12803, fe.min_samples()]  # two short + one exactly full
    L = fe.min_samples()
    batch = np.zeros((3, L), np.float32)
    g = np.random.default_rng(5)
    for i, l in enumerate(lens):
        batch[i, :l] = 0.3 * g.standard_normal(l)
    out = np.asarray(
        fe({"wave": jnp.asarray(batch), "length": jnp.asarray(lens)},
           jax.random.PRNGKey(0))
    )
    lfcc = LFCC()
    for i, l in enumerate(lens):
        single = np.asarray(lfcc(jnp.asarray(batch[i:i + 1, :l])))
        expected = pad_or_crop(single, FEAT_LEN, "silence")
        np.testing.assert_allclose(out[i], expected[0], atol=2e-4,
                                   err_msg=f"utt {i}")


def test_zero_padding_matches_host():
    """'zero' policy == host pad_or_crop('zero'): zeros appended trailing
    (/root/reference/dataset.py:514-518)."""
    fe = OnDeviceFrontend(feat_len=FEAT_LEN, padding="zero", use_pallas=False)
    L = fe.min_samples()
    l = 8000
    batch = np.zeros((1, L), np.float32)
    g = np.random.default_rng(6)
    batch[0, :l] = 0.3 * g.standard_normal(l)
    out = np.asarray(
        fe({"wave": jnp.asarray(batch), "length": jnp.asarray([l])},
           jax.random.PRNGKey(0))
    )
    lfcc = LFCC()
    single = np.asarray(lfcc(jnp.asarray(batch[:1, :l])))
    expected = pad_or_crop(single, FEAT_LEN, "zero")
    np.testing.assert_allclose(out[0], expected[0], atol=2e-4)


def test_eval_view_is_clean_and_deterministic():
    """eval_view() drops the augmenter: output equals the augmenter-free
    front-end regardless of rng (the reference evaluates on clean data,
    /root/reference/main_train.py:489-668)."""
    aug = ChannelAugmenter(ir_bank=synthetic_ir_bank(4, 256))
    fe = OnDeviceFrontend(feat_len=FEAT_LEN, padding="repeat",
                          augmenter=aug, apply_ir=True, use_pallas=False)
    clean = OnDeviceFrontend(feat_len=FEAT_LEN, padding="repeat",
                             use_pallas=False)
    ev = fe.eval_view()
    assert ev.augmenter is None and fe.augmenter is aug  # original untouched
    L = fe.min_samples()
    g = np.random.default_rng(7)
    batch = {
        "wave": jnp.asarray(0.3 * g.standard_normal((2, L)), jnp.float32),
        "length": jnp.full((2,), L, jnp.int32),
    }
    out_aug = np.asarray(fe(batch, jax.random.PRNGKey(0), fe.params))
    out_ev1 = np.asarray(ev(batch, jax.random.PRNGKey(0), fe.params))
    out_ev2 = np.asarray(ev(batch, jax.random.PRNGKey(9), fe.params))
    out_clean = np.asarray(clean(batch, jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(out_ev1, out_ev2)
    np.testing.assert_allclose(out_ev1, out_clean, atol=1e-6)
    assert not np.allclose(out_aug, out_ev1)


def test_frontend_with_augmenter_jits():
    aug = ChannelAugmenter(ir_bank=synthetic_ir_bank(4, 256))
    fe = OnDeviceFrontend(feat_len=FEAT_LEN, padding="repeat",
                          augmenter=aug, apply_ir=True, use_pallas=False)
    L = fe.min_samples()
    g = np.random.default_rng(2)
    batch = {
        "wave": jnp.asarray(0.3 * g.standard_normal((4, L)), jnp.float32),
        "length": jnp.full((4,), L, jnp.int32),
    }
    out = jax.jit(fe)(batch, jax.random.PRNGKey(0))
    assert out.shape == (4, FEAT_LEN, 60)
    assert np.isfinite(np.asarray(out)).all()
    # different rng -> different augmented features
    out2 = jax.jit(fe)(batch, jax.random.PRNGKey(5))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_waveform_iterator_shapes_and_crop():
    ds = RawItems([8000, 20000, 30000, 16000, 9000, 25000])
    max_samples = 16000
    it = WaveformIterator(ds, batch_size=4, max_samples=max_samples, seed=3)
    batches = list(it.epoch())
    assert len(batches) == it.steps_per_epoch == 2
    for b in batches:
        assert b["wave"].shape == (4, max_samples)
        assert np.all(b["length"] <= max_samples)
        for r in range(4):
            # zero beyond length
            assert np.all(b["wave"][r, b["length"][r]:] == 0)
    # long utterances were cropped to exactly max_samples
    lens = np.concatenate([b["length"] for b in batches])
    assert (lens == max_samples).sum() >= 3


def test_end_to_end_train_step_on_waveforms():
    """Full raw-audio train step: waveform batch -> augment -> LFCC -> model
    -> loss -> update, jitted."""
    from asvspoof2021_air_tpu.losses import build_loss
    from asvspoof2021_air_tpu.models import ECAPA_TDNN
    from asvspoof2021_air_tpu.train.state import (
        create_train_state,
        make_backbone_optimizer,
        make_loss_optimizer,
        step_decay_schedule,
    )
    from asvspoof2021_air_tpu.train.steps import StepConfig, make_train_step

    fe = OnDeviceFrontend(feat_len=50, padding="repeat", use_pallas=False)
    L = fe.min_samples()
    model = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=60, enc_dim=16)
    loss_mod = build_loss("ang_iso", enc_dim=16)
    sched = step_decay_schedule(5e-4, 0.5, 30, 10)
    btx, ltx = make_backbone_optimizer(sched), make_loss_optimizer(sched)

    g = np.random.default_rng(4)
    batch = {
        "wave": jnp.asarray(0.3 * g.standard_normal((4, L)), jnp.float32),
        "length": jnp.asarray([L, L // 2, L, L - 500], jnp.int32),
        "label": jnp.asarray([0, 1, 0, 1], jnp.int32),
    }
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        rng, model, fe(batch, rng),
        loss_module=loss_mod,
        example_feat=jnp.zeros((4, 16)),
        example_labels=batch["label"],
        backbone_tx=btx, loss_tx=ltx,
    )
    step = jax.jit(make_train_step(model, loss_mod, btx, ltx,
                                   StepConfig(add_loss="ang_iso"), frontend=fe))
    state, m1 = step(state, batch, jax.random.PRNGKey(1))
    state, m2 = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["total_loss"]))
    assert state.step == 2
