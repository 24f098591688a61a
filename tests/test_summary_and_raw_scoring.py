"""Model summary utility and cache-free raw-audio scoring."""

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.metrics import eer_from_score_file
from asvspoof2021_air_tpu.models import ECAPA_TDNN
from asvspoof2021_air_tpu.models.summary import summarize
from asvspoof2021_air_tpu.scoring import score_raw_to_file
from asvspoof2021_air_tpu.train.frontend import OnDeviceFrontend


def test_summarize_ecapa():
    model = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=60, enc_dim=16)
    lines = []
    info = summarize(model, jnp.zeros((1, 100, 60)), print_fn=lines.append)
    assert info["n_params"] > 10000
    assert info["output_shapes"] == [(1, 16), (1, 2)]
    assert any("Total params" in l for l in lines)
    assert len(info["rows"]) > 20


class RawScored:
    def __init__(self, n=10, seed=0):
        g = np.random.default_rng(seed)
        self.items = []
        for i in range(n):
            label = i % 2
            wav = (0.2 * g.standard_normal(9000 + 100 * i)).astype(np.float32)
            if label:
                t = np.arange(len(wav)) / 16000
                wav = (0.2 * np.sin(2 * np.pi * 600 * t)).astype(np.float32)
            self.items.append((wav, f"LA_E_{i:06d}", 0, label))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_score_raw_to_file(tmp_path):
    fe = OnDeviceFrontend(feat_len=60, padding="repeat", use_pallas=False)
    model = ECAPA_TDNN(C=32, model_scale=4, n_out=2, n_feat=60, enc_dim=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, 60, 60)), False)
    out = score_raw_to_file(model, variables, RawScored(),
                            str(tmp_path / "raw_scores.txt"), labeled=True,
                            frontend=fe, batch_size=4)
    lines = open(out).read().splitlines()
    assert len(lines) == 10
    assert all(len(l.split()) == 3 for l in lines)
    eer = eer_from_score_file(out)
    assert 0.0 <= eer <= 0.5
