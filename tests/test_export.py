"""Serving export (cli/export.py): trained systems serialize to
self-contained StableHLO artifacts (params baked in) that deserialize and
reproduce the live scoring function — including fused ensembles and the
raw waveform->score pipeline with the LFCC front-end baked in.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.cli.export import export_system
from asvspoof2021_air_tpu.train.checkpoint import save_checkpoint
from asvspoof2021_air_tpu.train.loop import TrainConfig, setup_training

B = 4


def _make_run(tmp_path, name, **cfg_kwargs):
    """Materialize a run directory (args.json + 'best' checkpoint) without
    training — the scoring CLI/export contract only needs the artifacts."""
    out = tmp_path / name
    os.makedirs(out, exist_ok=True)
    base = dict(
        out_fold=str(out), model="lcnn", add_loss="ang_iso",
        batch_size=B, feat_len=32, feat_dim=60, enc_dim=16,
    )
    base.update(cfg_kwargs)
    config = TrainConfig(**base)
    _model, _loss, state, _ts, _es = setup_training(config, steps_per_epoch=1)
    save_checkpoint(str(out / "best"), state)
    with open(out / "args.json", "w") as f:
        json.dump(dataclasses.asdict(config), f)
    return str(out)


def test_export_feature_scoring_roundtrip(tmp_path):
    run = _make_run(tmp_path, "single")
    art = str(tmp_path / "single.stablehlo")
    meta = export_system(run, art, batch_size=B, check=True)
    assert os.path.exists(art) and os.path.exists(art + ".json")
    assert meta["mode"] == "features"
    assert meta["ensemble"] == 1

    # artifact executes standalone and matches the live system
    from jax import export as jax_export

    with open(art, "rb") as f:
        back = jax_export.deserialize(f.read())
    g = np.random.default_rng(1)
    feats = g.standard_normal((B, 32, 60)).astype(np.float32)
    scores = np.asarray(back.call(feats))
    assert scores.shape == (B,)
    assert np.isfinite(scores).all()
    # ang_iso scoring rule: negated cosine, bounded
    assert np.abs(scores).max() <= 1.0 + 1e-5


def test_export_ensemble_fused(tmp_path):
    run = _make_run(tmp_path, "ens", ensemble=2)
    art = str(tmp_path / "ens.stablehlo")
    meta = export_system(run, art, batch_size=B, check=True)
    assert meta["ensemble"] == 2

    # fused artifact == mean of per-member scoring
    from jax import export as jax_export

    from asvspoof2021_air_tpu.cli.generate_score import load_system
    from asvspoof2021_air_tpu.scoring import make_score_fn

    with open(art, "rb") as f:
        back = jax_export.deserialize(f.read())
    g = np.random.default_rng(2)
    feats = g.standard_normal((B, 32, 60)).astype(np.float32)
    fused = np.asarray(back.call(feats))

    model, variables, loss_mod, loss_vars, _cfg = load_system(run)
    member_scores = [
        np.asarray(make_score_fn(model, v, loss_mod, lv, "ocsoftmax")(feats))
        for v, lv in zip(variables, loss_vars)
    ]
    np.testing.assert_allclose(fused, np.mean(member_scores, axis=0),
                               rtol=1e-5, atol=1e-5)


def test_export_raw_waveform_scoring(tmp_path):
    run = _make_run(tmp_path, "raw")
    art = str(tmp_path / "raw.stablehlo")
    meta = export_system(run, art, batch_size=2, raw=True, wave_seconds=0.5,
                         check=True)
    assert meta["mode"] == "raw"
    n = meta["signature"]["wave"][1]

    from jax import export as jax_export

    with open(art, "rb") as f:
        back = jax_export.deserialize(f.read())
    g = np.random.default_rng(3)
    wave = g.standard_normal((2, n)).astype(np.float32)
    lengths = np.asarray([n, n // 2], np.int32)
    scores = np.asarray(back.call(wave, lengths))
    assert scores.shape == (2,)
    assert np.isfinite(scores).all()


def test_export_isolate_scoring_rule(tmp_path):
    """isolate/iso_sq runs export with the distance-to-center rule the run
    was model-selected with — not the softmax fallback."""
    run = _make_run(tmp_path, "iso", add_loss="isolate")
    art = str(tmp_path / "iso.stablehlo")
    export_system(run, art, batch_size=B, check=True)

    from jax import export as jax_export

    from asvspoof2021_air_tpu.cli.generate_score import load_system
    from asvspoof2021_air_tpu.scoring import make_score_fn

    with open(art, "rb") as f:
        back = jax_export.deserialize(f.read())
    g = np.random.default_rng(4)
    feats = g.standard_normal((B, 32, 60)).astype(np.float32)
    got = np.asarray(back.call(feats))
    model, variables, loss_mod, loss_vars, _cfg = load_system(run)
    want = np.asarray(
        make_score_fn(model, variables, loss_mod, loss_vars, "isolate")(feats)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert (got >= 0).all()  # distances, not softmax scores


def test_export_rawnet(tmp_path):
    """rawnet exports via --raw with its waveform front-end; feature-mode
    export is rejected with a clear error."""
    tiny = {
        "nb_samp": 6400, "first_conv": 129, "in_channels": 1,
        "filts": [4, [4, 4], [4, 8], [8, 8]], "blocks": [2, 4],
        "nb_fc_node": 16, "gru_node": 16, "nb_gru_layer": 1, "nb_classes": 2,
    }
    run = _make_run(tmp_path, "rawnet_run", model="rawnet", add_loss=None,
                    on_the_fly=True, rawnet_args=tiny)
    art = str(tmp_path / "rawnet.stablehlo")
    with pytest.raises(ValueError, match="--raw"):
        export_system(run, art, batch_size=2)
    meta = export_system(run, art, batch_size=2, raw=True, wave_seconds=0.4,
                         check=True)
    assert meta["mode"] == "raw"

    from jax import export as jax_export

    with open(art, "rb") as f:
        back = jax_export.deserialize(f.read())
    n = meta["signature"]["wave"][1]
    g = np.random.default_rng(5)
    wave = g.standard_normal((2, n)).astype(np.float32)
    scores = np.asarray(back.call(wave, np.full((2,), n, np.int32)))
    assert scores.shape == (2,) and np.isfinite(scores).all()


def test_export_int8_quantized(tmp_path):
    """Weights-only int8 export: artifact loads, scores track the float
    system closely, and metadata records the ~4x parameter-byte shrink."""
    run = _make_run(tmp_path, "q8", enc_dim=32)
    art = str(tmp_path / "q8.stablehlo")
    meta = export_system(run, art, batch_size=B, check=True,
                        quantize="int8")
    assert meta["quantize"] == "int8"
    assert meta["param_bytes_int8"] < 0.35 * meta["param_bytes_f32"]
    # per-channel int8 on a random-init scorer stays close to float
    assert meta["quantized_score_max_dev"] < 0.05

    from jax import export as jax_export

    with open(art, "rb") as f:
        back = jax_export.deserialize(f.read())
    g = np.random.default_rng(2)
    feats = g.standard_normal((B, 32, 60)).astype(np.float32)
    scores = np.asarray(back.call(feats))
    assert scores.shape == (B,) and np.isfinite(scores).all()


def test_quantize_roundtrip_numerics():
    """ops/quantize: per-channel int8 reconstructs kernels to <1% relative
    error and keeps small/1-D leaves exact."""
    from asvspoof2021_air_tpu.ops.quantize import (
        dequantize_tree,
        quantize_tree_int8,
        quantized_bytes,
    )

    g = np.random.default_rng(0)
    params = {
        "dense": {"kernel": g.standard_normal((64, 128)).astype(np.float32),
                  "bias": g.standard_normal((128,)).astype(np.float32)},
        "conv": {"kernel": (10 * g.standard_normal((3, 32, 64))
                            ).astype(np.float32)},
    }
    qt = quantize_tree_int8(params)
    back = dequantize_tree(qt)
    np.testing.assert_array_equal(np.asarray(back["dense"]["bias"]),
                                  params["dense"]["bias"])
    for k, orig in (("dense", params["dense"]["kernel"]),
                    ("conv", params["conv"]["kernel"])):
        rec = np.asarray(back[k]["kernel"])
        rel = np.abs(rec - orig).max() / np.abs(orig).max()
        assert rel < 0.01, (k, rel)
    qb, fb = quantized_bytes(qt)
    assert qb < 0.35 * fb
