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


def _synth_corpus(db, parts=("train", "dev"), n=8, seed=7):
    """ASVspoof2019-layout wav corpus with separable classes."""
    import numpy as np

    g = np.random.default_rng(seed)
    protdir = os.path.join(db, "LA", "ASVspoof2019_LA_cm_protocols")
    os.makedirs(protdir, exist_ok=True)
    for part in parts:
        wavdir = os.path.join(db, "LA", f"ASVspoof2019_LA_{part}", "wav")
        os.makedirs(wavdir, exist_ok=True)
        lines = []
        for i in range(n):
            fname = f"LA_{part[0].upper()}_{i:07d}"
            if i % 2 == 0:
                wav = (0.3 * g.standard_normal(9000)).astype(np.float32)
                tag, label = "-", "bonafide"
            else:
                t = np.arange(9000) / 16000.0
                wav = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
                tag, label = "A01", "spoof"
            write_wav(os.path.join(wavdir, fname + ".wav"), wav)
            lines.append(f"LA_{i:04d} {fname} - {tag} {label}\n")
        with open(os.path.join(
                protdir, f"ASVspoof2019.LA.cm.{part}.trl.txt"), "w") as f:
            f.writelines(lines)
    return protdir


def test_preprocess_melspec_frame_count(tmp_path):
    """Melspec caches carry the hop-128 frame count (T = 1 + L//128), not the
    LFCC hop-160 count — the round trip loads with the correct T."""
    import numpy as np

    import asvspoof2021_air_tpu.cli.preprocess as pp
    from asvspoof2021_air_tpu.data.datasets import ASVspoof2019FeatureDataset

    db = str(tmp_path / "db")
    _synth_corpus(db, parts=("train",), n=2)
    out = str(tmp_path / "feats")
    pp.main(["-d", db, "-o", out, "--part", "train", "--feature", "Melspec"])
    ds = ASVspoof2019FeatureDataset("LA", out, "train", "Melspec")
    assert len(ds) == 2
    feat, _f, _t, _l = ds[0]
    assert feat.shape[1] == 1 + 9000 // 128  # Melspec hop, not 1 + L//160
    assert feat.shape[2] == 128


def test_add_loss_ocsoftmax_normalized_and_invalid_rejected():
    """--config JSON bypasses argparse choices; config_from_args normalizes
    'ocsoftmax' to ang_iso and rejects untrainable names eagerly."""
    import pytest

    args = build_parser().parse_args(["-o", "/tmp/x"])
    args.add_loss = "ocsoftmax"
    assert config_from_args(args).add_loss == "ang_iso"
    args.add_loss = "amsoftmax"
    with pytest.raises(SystemExit):
        config_from_args(args)


def test_degrade_preprocess_augtrain_score_chain(tmp_path, monkeypatch):
    """Full augmented pipeline with in-repo tools only: degrade ->
    preprocess (plain + aug trees) -> train --LA_aug --ADV_AUG ->
    generate_score -t 19laaugdev (closes the reference loop
    /root/reference/channel_simulation -> preprocess.py -> main_train.py)."""
    import numpy as np

    import asvspoof2021_air_tpu.cli.generate_score as gs
    import asvspoof2021_air_tpu.cli.preprocess as pp
    import asvspoof2021_air_tpu.cli.train as tr

    db = str(tmp_path / "db")
    protdir = _synth_corpus(db, parts=("train", "dev"), n=8)

    aug_wavs = str(tmp_path / "aug_wavs")
    for part in ("train", "dev"):
        n = channel_degrade(
            os.path.join(db, "LA", f"ASVspoof2019_LA_{part}", "wav"),
            os.path.join(aug_wavs, part), mode="random", seed=3,
        )
        assert n == 8

    feats, aug_feats = str(tmp_path / "feats"), str(tmp_path / "aug_feats")
    for part in ("train", "dev"):
        pp.main(["-d", db, "-o", feats, "--part", part])
        pp.main(["--dataset", "aug", "--aug_wav_dir", aug_wavs,
                 "--path_to_protocol", protdir, "-o", aug_feats,
                 "--part", part])
        assert len(os.listdir(os.path.join(aug_feats, part, "LFCC"))) == 8

    run = str(tmp_path / "run")
    tr.main(["-o", run, "-f", feats, "--path_to_aug_features", aug_feats,
             "-m", "lcnn", "--add_loss", "ang_iso", "--LA_aug", "true",
             "--ADV_AUG", "true", "--num_epochs", "2", "--batch_size", "8",
             "--feat_len", "56", "--ratio", "0.5", "--enc_dim", "32"])
    assert os.path.isdir(os.path.join(run, "best"))

    monkeypatch.chdir(tmp_path)
    gs.main(["--model_folder", str(tmp_path), "-n", "run", "-t", "19laaugdev",
             "-l", "ocsoftmax", "--ori_features", feats,
             "--aug_features", aug_feats, "--batch_size", "8"])
    score_file = tmp_path / "scores" / "run_19laaugdev_score.txt"
    assert score_file.exists()
    lines = score_file.read_text().strip().splitlines()
    assert len(lines) == 8 + 8  # original + augmented dev trials
    for ln in lines:
        fields = ln.split()
        assert len(fields) == 3 and fields[2] in ("bonafide", "spoof")
        assert np.isfinite(float(fields[1]))


def test_channel_degrade_jobs_identical(wav_corpus, tmp_path):
    """--jobs parallel degradation produces byte-identical outputs to the
    serial path (codec sampling stays on the main process)."""
    import filecmp

    from asvspoof2021_air_tpu.cli.degrade import channel_degrade

    serial = tmp_path / "serial"
    par = tmp_path / "par"
    n1 = channel_degrade(wav_corpus, str(serial), mode="random", seed=7)
    n2 = channel_degrade(wav_corpus, str(par), mode="random", seed=7, jobs=3)
    assert n1 == n2
    files = sorted(os.listdir(serial))
    assert files == sorted(os.listdir(par))
    for f in files:
        assert filecmp.cmp(serial / f, par / f, shallow=False), f


def test_preprocess_other_corpora_routes(tmp_path):
    """The preprocess CLI routes the non-2019 raw corpora the reference's
    preprocess.py covers (/root/reference/preprocess.py dataset blocks):
    ASVspoof2015 (per-speaker subdirs + cm_* protocols), VCC2020
    (bonafide/spoof trees), and unlabeled 2021-eval."""
    from asvspoof2021_air_tpu.cli.preprocess import main as pre_main

    g = np.random.default_rng(3)

    def wav(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_wav(path, (0.2 * g.standard_normal(8000))
                  .astype(np.float32).clip(-1, 1))

    # --- ASVspoof2015 layout ---
    db15 = tmp_path / "db2015"
    proto15 = tmp_path / "proto2015"
    os.makedirs(proto15)
    lines = []
    for i, (tag, label) in enumerate([("human", "human"), ("S3", "spoof")]):
        wav(str(db15 / "train" / f"SPK{i}" / f"T{i:03d}.wav"))
        lines.append(f"SPK{i} T{i:03d} {tag} {label}")
    (proto15 / "cm_train.trn").write_text("\n".join(lines) + "\n")
    out15 = tmp_path / "f2015"
    pre_main(["--dataset", "2015", "-d", str(db15),
              "--path_to_protocol", str(proto15), "--part", "train",
              "-o", str(out15), "--batch_size", "2"])
    files = sorted(os.listdir(out15 / "train" / "LFCC"))
    assert len(files) == 2
    assert files[0].endswith("_human_human.npy")
    assert files[1].endswith("_S3_spoof.npy")
    feat = np.load(out15 / "train" / "LFCC" / files[0])
    assert 60 in feat.shape  # 60-dim LFCC in the cache layout

    # --- VCC2020 layout ---
    bona = tmp_path / "vcc_bona"
    spoof = tmp_path / "vcc_spoof"
    wav(str(bona / "SEF1" / "wavs" / "E10001.wav"))
    wav(str(spoof / "sysA" / "SEF1" / "E10002.wav"))
    outv = tmp_path / "fvcc"
    pre_main(["--dataset", "vcc2020", "--path_to_bonafide", str(bona),
              "--path_to_spoof", str(spoof), "-o", str(outv),
              "--batch_size", "2"])
    vfiles = sorted(os.listdir(outv / "train" / "LFCC"))
    assert len(vfiles) == 2
    assert any("_-_bonafide" in f for f in vfiles)
    assert any("_sysA_spoof" in f for f in vfiles)

    # --- 2021 eval layout (unlabeled; the real corpus ships FLAC, decoded
    # by the native decoder) ---
    from tests.flac_encoder import encode_flac

    db21 = tmp_path / "db2021"
    wav(str(db21 / "flac" / "LA_E_0001.wav"))
    pcm = (g.standard_normal(8000) * 6000).astype(np.int32)
    os.makedirs(db21 / "flac", exist_ok=True)
    with open(db21 / "flac" / "LA_E_0002.flac", "wb") as fh:
        fh.write(encode_flac(pcm))
    out21 = tmp_path / "f2021"
    pre_main(["--dataset", "2021eval", "-d", str(db21), "-o", str(out21),
              "--batch_size", "2"])
    efiles = sorted(os.listdir(out21 / "train" / "LFCC"))
    assert len(efiles) == 2
    assert "LA_E_0001" in efiles[0] and "LA_E_0002" in efiles[1]


def test_compression_and_device_degrade_jobs_identical(wav_corpus, tmp_path):
    """--jobs parity for the compression and device modes too."""
    import filecmp

    from asvspoof2021_air_tpu.ops.augment import synthetic_ir_bank

    ir_dir = tmp_path / "irs"
    ir_dir.mkdir()
    bank = synthetic_ir_bank(3, 256)
    for i in range(3):
        np.save(str(ir_dir / f"dev{i}-16000.npy"), bank[i])

    for fn, kwargs in (
        (compression_degrade, {}),
        (lambda i, o, **k: device_degrade(i, o, str(ir_dir), n_device=2, **k),
         {}),
    ):
        serial = tmp_path / f"s{fn.__name__ if hasattr(fn, '__name__') else 'dev'}"
        par = tmp_path / f"p{fn.__name__ if hasattr(fn, '__name__') else 'dev'}"
        n1 = fn(wav_corpus, str(serial), mode="random", seed=5, **kwargs)
        n2 = fn(wav_corpus, str(par), mode="random", seed=5, jobs=2, **kwargs)
        assert n1 == n2
        files = sorted(os.listdir(serial))
        assert files == sorted(os.listdir(par))
        for f in files:
            assert filecmp.cmp(serial / f, par / f, shallow=False), f
