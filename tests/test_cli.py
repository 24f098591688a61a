"""CLI smoke tests: degrade pipeline end-to-end on tiny synthetic corpora,
fusion CLI, tDCF CLI, train parser."""

import os

import numpy as np
import pytest

from asvspoof2021_air_tpu.cli.degrade import (
    channel_degrade,
    compression_degrade,
    device_degrade,
    load_filelist,
)
from asvspoof2021_air_tpu.cli.train import build_parser, config_from_args
from asvspoof2021_air_tpu.data.audio_io import read_wav, write_wav


@pytest.fixture()
def wav_corpus(tmp_path):
    g = np.random.default_rng(0)
    d = tmp_path / "wavs"
    d.mkdir()
    for i in range(2):
        wav = (0.3 * g.standard_normal(16000)).astype(np.float32).clip(-1, 1)
        write_wav(str(d / f"LA_T_{i:04d}.wav"), wav)
    return str(d)


def test_channel_degrade(wav_corpus, tmp_path):
    out = str(tmp_path / "aug")
    n = channel_degrade(wav_corpus, out, mode="parallel", seed=1)
    assert n == 2 * 21  # 7+6+6+2 codecs per utterance
    files = load_filelist(out)
    assert len(files) == 42
    wav, sr = read_wav(files[0])
    assert sr == 16000 and len(wav) == 16000
    assert np.isfinite(wav).all()
    # degraded differs from original
    ori, _ = read_wav(os.path.join(wav_corpus, "LA_T_0000.wav"))
    assert not np.allclose(wav, ori)


def test_compression_degrade(wav_corpus, tmp_path):
    out = str(tmp_path / "comp")
    n = compression_degrade(wav_corpus, out, mode="parallel", seed=1)
    assert n == 2 * 6
    names = {os.path.basename(f) for f in load_filelist(out)}
    assert any("mp3[16k]" in n for n in names)
    assert any("aac[32k]" in n for n in names)


def test_device_degrade(wav_corpus, tmp_path):
    ir_dir = tmp_path / "irs"
    ir_dir.mkdir()
    from asvspoof2021_air_tpu.ops.augment import synthetic_ir_bank
    bank = synthetic_ir_bank(4, 256)
    for i in range(4):
        np.save(str(ir_dir / f"device{i}-16000.npy"), bank[i])
    out = str(tmp_path / "dev")
    n = device_degrade(wav_corpus, out, str(ir_dir), n_device=3, seed=2)
    assert n == 2 * 3


def test_train_parser_defaults():
    args = build_parser().parse_args(["-o", "/tmp/x"])
    cfg = config_from_args(args)
    assert cfg.seed == 688
    assert cfg.batch_size == 64
    assert cfg.lr == 5e-4
    assert cfg.feat_len == 750
    assert cfg.model == "lcnn"
    assert cfg.add_loss is None
    assert cfg.r_real == 0.9 and cfg.r_fake == 0.2 and cfg.alpha == 20.0


def test_train_parser_full_flags():
    args = build_parser().parse_args([
        "-o", "/tmp/x", "-m", "ecapa", "--add_loss", "ang_iso",
        "--ADV_AUG", "true", "--LA_aug", "true", "--ratio", "0.5",
        "--lambda_", "0.05", "--lr_d", "0.0001",
    ])
    cfg = config_from_args(args)
    assert cfg.model == "ecapa"
    assert cfg.add_loss == "ang_iso"
    assert cfg.ADV_AUG and cfg.LA_aug


def test_fusion_cli(tmp_path):
    import asvspoof2021_air_tpu.cli.score_fusion as fusion_cli

    g = np.random.default_rng(3)
    paths = []
    for s in range(2):
        p = tmp_path / f"sys{s}.txt"
        lines = []
        for i in range(50):
            key = "bonafide" if i % 2 == 0 else "spoof"
            score = (1 if key == "bonafide" else -1) + 0.3 * g.standard_normal()
            lines.append(f"LA_D_{i:06d} {score} {key}")
        p.write_text("\n".join(lines))
        paths.append(str(p))
    fusion_cli.main(["-i", *paths, "-m", "avg", "-o", str(tmp_path / "out/")])
    assert os.path.exists(tmp_path / "out" / "avg_fuse_score")


def test_tdcf_cli(tmp_path, capsys):
    import asvspoof2021_air_tpu.cli.evaluate_tdcf as tdcf_cli

    g = np.random.default_rng(4)
    p = tmp_path / "cm.txt"
    lines = []
    for i in range(200):
        key = "bonafide" if i % 2 == 0 else "spoof"
        score = (2 if key == "bonafide" else -2) + g.standard_normal()
        lines.append(f"LA_E_{i:06d} A01 {key} {score}")
    p.write_text("\n".join(lines))
    tdcf_cli.main([str(p)])
    out = capsys.readouterr().out
    assert "eer" in out


def test_preprocess_cli_stft_and_melspec(tmp_path):
    """Preprocess driver writes STFT and Melspec feature trees too."""
    import asvspoof2021_air_tpu.cli.preprocess as pp

    db = tmp_path / "db"
    (db / "LA" / "ASVspoof2019_LA_train" / "wav").mkdir(parents=True)
    (db / "LA" / "ASVspoof2019_LA_cm_protocols").mkdir(parents=True)
    g = np.random.default_rng(0)
    lines = []
    for i in range(3):
        fname = f"LA_T_{9000+i}"
        write_wav(str(db / "LA" / "ASVspoof2019_LA_train" / "wav" / f"{fname}.wav"),
                  (0.2 * g.standard_normal(8000)).astype(np.float32))
        lines.append(f"LA_0001 {fname} - - bonafide")
    (db / "LA" / "ASVspoof2019_LA_cm_protocols" /
     "ASVspoof2019.LA.cm.train.trl.txt").write_text("\n".join(lines))

    for feature, dim_check in (("STFT", 257), ("LFCC", 60)):
        out = tmp_path / f"feats_{feature}"
        pp.main(["-d", str(db), "-o", str(out), "--part", "train",
                 "--feature", feature, "--batch_size", "2"])
        files = sorted((out / "train" / feature).glob("*.npy"))
        assert len(files) == 3
        arr = np.load(files[0])
        assert arr.shape[-1] == dim_check
