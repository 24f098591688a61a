"""Data layer tests over synthetic feature trees following the reference
filename schema (/root/reference/preprocess.py:243-244)."""

import os

import numpy as np
import pytest

from asvspoof2021_air_tpu.data import (
    ASVspoof2019FeatureDataset,
    AugmentedFeatureDataset,
    EvalFeatureDataset,
    RatioMixIterator,
    SequentialIterator,
    collate,
    pad_or_crop,
)
from asvspoof2021_air_tpu.data.audio_io import read_wav, write_wav
from asvspoof2021_air_tpu.data import protocol as proto

D = 60


def _write_feat(path, t, seed=0):
    g = np.random.default_rng(seed)
    np.save(path, g.standard_normal((1, t, D)).astype(np.float32))


@pytest.fixture(scope="module")
def feature_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("features")
    ori = root / "ori"
    aug = root / "aug"
    for part in ("train", "dev"):
        d = ori / part / "LFCC"
        d.mkdir(parents=True)
        for i in range(8):
            label = "bonafide" if i % 2 == 0 else "spoof"
            tag = "-" if label == "bonafide" else "A01"
            _write_feat(d / f"{i:06d}_LA_T_{1000+i}_{tag}_{label}.npy", 400 + 50 * i, i)
        da = aug / part / "LFCC"
        da.mkdir(parents=True)
        for i in range(6):
            label = "bonafide" if i % 2 == 0 else "spoof"
            tag = "-" if label == "bonafide" else "A02"
            ch = proto.LA_CHANNELS[1 + i]
            _write_feat(da / f"{i:06d}_LA_T_{2000+i}_{tag}_{label}_{ch}.npy", 300, i)
    return str(ori), str(aug)


def test_base_dataset(feature_tree):
    ori, _ = feature_tree
    ds = ASVspoof2019FeatureDataset("LA", ori, "train")
    assert len(ds) == 8
    feat, fname, tag, label = ds[0]
    assert feat.shape == (1, 400, D)
    assert fname == "LA_T_1000"
    assert tag == 0 and label == 0
    feat, fname, tag, label = ds[1]
    assert tag == 1 and label == 1


def test_aug_dataset(feature_tree):
    ori, aug = feature_tree
    ds = AugmentedFeatureDataset(ori, aug, "train", variant="LA")
    assert len(ds) == 14
    assert ds.num_original == 8
    feat, fname, tag, label, ch = ds[0]
    assert ch == 0  # no_channel
    feat, fname, tag, label, ch = ds[8]
    assert ch == 1  # first augmented channel id
    assert fname == "LA_T_2000"


def test_pad_or_crop_policies():
    g = np.random.default_rng(0)
    feat = g.standard_normal((1, 100, D)).astype(np.float32)

    crop = pad_or_crop(feat, 50, "repeat", g)
    assert crop.shape == (1, 50, D)

    zero = pad_or_crop(feat, 150, "zero")
    assert zero.shape == (1, 150, D)
    assert np.all(zero[:, 100:] == 0)

    rep = pad_or_crop(feat, 250, "repeat")
    assert rep.shape == (1, 250, D)
    np.testing.assert_array_equal(rep[:, 100:200], feat)

    sil = pad_or_crop(feat, 130, "silence")
    assert sil.shape == (1, 130, D)
    # silence frames are PREPENDED (/root/reference/dataset.py:525-528)
    np.testing.assert_array_equal(sil[:, 30:], feat)
    assert np.allclose(sil[0, 0, 20:], 0, atol=1e-4)  # deltas of silence ~ 0


def test_ratio_mix_iterator(feature_tree):
    ori, aug = feature_tree
    ds = AugmentedFeatureDataset(ori, aug, "train", variant="LA")
    it = RatioMixIterator(ds, batch_size=4, ratio=0.5, feat_len=120,
                          padding="repeat", seed=1)
    batches = list(it.epoch())
    assert len(batches) == it.steps_per_epoch == 4  # ceil(8/2)
    for b in batches:
        assert b["feat"].shape == (4, 120, D)
        assert b["label"].shape == (4,)
        assert b["channel"].shape == (4,)
        # first half original (channel 0), second half augmented (nonzero)
        assert np.all(b["channel"][:2] == 0)
        assert np.all(b["channel"][2:] != 0)


def test_ratio_one(feature_tree):
    ori, _ = feature_tree
    ds = ASVspoof2019FeatureDataset("LA", ori, "train")
    it = RatioMixIterator(ds, batch_size=4, ratio=1.0, feat_len=100, seed=2)
    b = next(iter(it.epoch()))
    assert b["feat"].shape == (4, 100, D)


def test_sequential_iterator_padding(feature_tree):
    ori, _ = feature_tree
    ds = ASVspoof2019FeatureDataset("LA", ori, "dev")
    it = SequentialIterator(ds, batch_size=3, feat_len=100)
    batches = list(it)
    assert len(batches) == 3
    assert batches[-1]["valid"].sum() == 2  # 8 = 3+3+2
    assert batches[0]["feat"].shape == (3, 100, D)


def test_eval_dataset(tmp_path):
    d = tmp_path / "LFCC"
    d.mkdir()
    _write_feat(d / "000000_LA_E_5000.npy", 200)
    ds = EvalFeatureDataset(str(tmp_path))
    feat, fname = ds[0]
    assert fname == "LA_E_5000"
    batch = collate([ds[0]], 100, "repeat")
    assert batch["feat"].shape == (1, 100, D)
    assert "label" not in batch


def test_genuine_only(feature_tree):
    ori, _ = feature_tree
    ds = ASVspoof2019FeatureDataset("LA", ori, "eval") if False else None
    # eval part doesn't exist in the fixture; check the bonafide filter path
    ds = ASVspoof2019FeatureDataset("LA", ori, "train")
    bona = [f for f in ds.files if "bonafide" in f]
    assert len(bona) == 4


def test_wav_roundtrip(tmp_path):
    g = np.random.default_rng(3)
    wav = (0.5 * g.standard_normal(16000)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "a.wav")
    write_wav(p, wav, 16000)
    back, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(back, wav, atol=1.0 / 16000)


def test_protocol_parse(tmp_path):
    p = tmp_path / "proto.txt"
    p.write_text(
        "LA_0079 LA_T_1138215 - - bonafide\n"
        "LA_0079 LA_T_1271820 - A01 spoof\n"
    )
    entries = proto.parse_protocol(str(p))
    assert len(entries) == 2
    assert entries[0].label == "bonafide"
    assert entries[1].tag == "A01"
    assert proto.LA_TAGS[entries[1].tag] == 1
    assert len(proto.LA_CHANNELS) == 60
    assert len(proto.DF_CHANNELS) == 7
    assert len(proto.DEVICES) == 13


def test_collate_pad_chop_false(feature_tree):
    """Variable-length collate: repeat-pad to batch max + 1
    (/root/reference/dataset.py:87-102)."""
    ori, _ = feature_tree
    ds = ASVspoof2019FeatureDataset("LA", ori, "train")
    samples = [ds[0], ds[3], ds[7]]  # lengths 400, 550, 750
    batch = collate(samples, feat_len=100, padding="zero", pad_chop=False)
    assert batch["feat"].shape == (3, 751, 60)
    # shorter items are repeat-padded, not zero-padded
    assert not np.allclose(batch["feat"][0, 400:], 0)
