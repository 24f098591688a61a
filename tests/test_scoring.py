"""Scoring pipeline tests: batched scorer -> reference-format score files."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.losses import build_loss
from asvspoof2021_air_tpu.metrics import eer_from_score_file, read_score_file
from asvspoof2021_air_tpu.models import ECAPA_TDNN
from asvspoof2021_air_tpu.scoring import make_score_fn, score_to_file

D, T, ENC = 60, 100, 32


class SyntheticLabeled:
    def __init__(self, n=10, seed=0):
        g = np.random.default_rng(seed)
        self.labels = (np.arange(n) % 2).astype(np.int32)
        self.feats = [
            (g.standard_normal((1, T, D)) + 2.0 * l).astype(np.float32)
            for l in self.labels
        ]

    def __len__(self):
        return len(self.feats)

    def __getitem__(self, i):
        return self.feats[i], f"LA_D_{i:07d}", 0, int(self.labels[i])


def _setup(add_loss=None):
    model = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=D, enc_dim=ENC)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, jnp.zeros((2, T, D)), False)
    loss_mod = loss_vars = None
    if add_loss:
        name = "ang_iso" if add_loss == "ocsoftmax" else add_loss
        loss_mod = build_loss(name, enc_dim=ENC)
        loss_vars = loss_mod.init(rng, jnp.zeros((2, ENC)),
                                  jnp.zeros((2,), jnp.int32))
    return model, variables, loss_mod, loss_vars


def test_score_file_format(tmp_path):
    model, variables, _, _ = _setup()
    fn = make_score_fn(model, variables)
    ds = SyntheticLabeled()
    out = score_to_file(fn, ds, str(tmp_path / "score.txt"), labeled=True,
                        batch_size=4, feat_len=T)
    cols = read_score_file(out)
    assert len(cols["fname"]) == 10
    assert set(cols["key"]) == {"bonafide", "spoof"}
    # softmax-based file scores are +softmax[:, 0] after double negation
    assert np.all(cols["score"] >= 0) and np.all(cols["score"] <= 1)
    eer = eer_from_score_file(out)
    assert 0.0 <= eer <= 0.5


def test_ocsoftmax_score_polarity(tmp_path):
    """Files store +cos for ocsoftmax (loss returns -cos, writer negates —
    the double negation at /root/reference/loss.py:97 +
    generate_score.py:116)."""
    model, variables, loss_mod, loss_vars = _setup("ocsoftmax")
    fn = make_score_fn(model, variables, loss_mod, loss_vars, "ocsoftmax")
    ds = SyntheticLabeled()
    out = score_to_file(fn, ds, str(tmp_path / "s.txt"), labeled=True,
                        batch_size=4, feat_len=T)
    cols = read_score_file(out)
    assert np.all(np.abs(cols["score"]) <= 1.0 + 1e-6)  # cosine range


def test_unlabeled_score_file(tmp_path):
    model, variables, _, _ = _setup()

    class UnlabeledDS(SyntheticLabeled):
        def __getitem__(self, i):
            return self.feats[i], f"LA_E_{i:07d}"

    fn = make_score_fn(model, variables)
    ds = UnlabeledDS()
    out = score_to_file(fn, ds, str(tmp_path / "u.txt"), labeled=False,
                        batch_size=4, feat_len=T)
    with open(out) as f:
        lines = [l.split() for l in f.read().splitlines()]
    assert len(lines) == 10
    assert all(len(l) == 2 for l in lines)
