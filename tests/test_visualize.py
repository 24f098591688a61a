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


def test_prepare4matlab(tmp_path):
    p = tmp_path / "score.txt"
    p.write_text(
        "LA_D_1 0.9 bonafide\nLA_D_2 -0.8 spoof\nLA_D_3 0.7 bonafide\n"
    )
    tar, non = convert2txt(str(p))
    assert open(tar).read().split() == ["0.9", "0.7"]
    assert open(non).read().split() == ["-0.8"]
