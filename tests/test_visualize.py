"""Visualization and matlab-export tests."""

import os

import numpy as np

from asvspoof2021_air_tpu.cli.prepare4matlab import convert2txt
from asvspoof2021_air_tpu.visualize import visualize_dev_and_eval


def test_visualize_writes_pdf(tmp_path):
    g = np.random.default_rng(0)
    dev = g.standard_normal((120, 16)).astype(np.float32)
    ev = g.standard_normal((100, 16)).astype(np.float32)
    dev_l = (np.arange(120) % 2)
    ev_l = (np.arange(100) % 2)
    center = g.standard_normal((1, 16)).astype(np.float32)
    out = visualize_dev_and_eval(dev, dev_l, ev, ev_l, center,
                                 out_fold=str(tmp_path), epoch=1, sample=100)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000


def test_visualize_dev_only_fallback(tmp_path):
    """Without eval embeddings (no --test_on_eval) the figure is dev-only —
    the reference always plots real eval embeddings
    (/root/reference/visualize.py:67-89); we must not silently duplicate
    the dev points under an Eval title."""
    g = np.random.default_rng(1)
    dev = g.standard_normal((80, 16)).astype(np.float32)
    dev_l = (np.arange(80) % 2)
    center = g.standard_normal((1, 16)).astype(np.float32)
    out = visualize_dev_and_eval(dev, dev_l, None, None, center,
                                 out_fold=str(tmp_path), epoch=2, sample=80)
    assert os.path.exists(out)
    # a 2x1 dev-only figure is materially smaller than the 2x2 version
    assert os.path.getsize(out) > 1000


def test_prepare4matlab(tmp_path):
    p = tmp_path / "score.txt"
    p.write_text(
        "LA_D_1 0.9 bonafide\nLA_D_2 -0.8 spoof\nLA_D_3 0.7 bonafide\n"
    )
    tar, non = convert2txt(str(p))
    assert open(tar).read().split() == ["0.9", "0.7"]
    assert open(non).read().split() == ["-0.8"]


def test_visualize_cli(tmp_path):
    """The standalone visualization CLI loads a run, embeds cached dev
    features, and writes the 2x2 PDF (the reference's visualize.py is not
    runnable at all — broken import, /root/reference/visualize.py:7)."""
    import dataclasses
    import json

    from asvspoof2021_air_tpu.cli.visualize import main as viz_main
    from asvspoof2021_air_tpu.train.checkpoint import save_checkpoint
    from asvspoof2021_air_tpu.train.loop import TrainConfig, setup_training

    g = np.random.default_rng(0)
    feats_dir = tmp_path / "feats" / "dev" / "LFCC"
    os.makedirs(feats_dir)
    for i in range(12):
        label = "spoof" if i % 2 else "bonafide"
        tag = "A01" if i % 2 else "-"
        arr = g.standard_normal((20, 60)).astype(np.float32) + 2.0 * (i % 2)
        np.save(feats_dir / f"{i:06d}_LA_D_{i:04d}_{tag}_{label}.npy", arr)

    run = tmp_path / "run"
    os.makedirs(run)
    config = TrainConfig(out_fold=str(run), model="lcnn", add_loss="ang_iso",
                         batch_size=4, feat_len=20, enc_dim=16)
    _m, _l, state, _ts, _es = setup_training(config, steps_per_epoch=1)
    save_checkpoint(str(run / "best"), state)
    with open(run / "args.json", "w") as f:
        json.dump(dataclasses.asdict(config), f)

    viz_main(["--model_folder", str(tmp_path), "-n", "run",
              "-f", str(tmp_path / "feats"), "--batch_size", "4",
              "--sample", "12", "-o", str(tmp_path / "viz")])
    pdfs = [f for f in os.listdir(tmp_path / "viz") if f.endswith(".pdf")]
    assert len(pdfs) == 1
