"""Serving export: package a trained system's scoring function as a
serialized StableHLO artifact via jax.export.

The reference deploys by unpickling whole torch modules into a Python
process (/root/reference/generate_score.py:46-48). Here the deployable unit
is a self-contained compiled-IR artifact: parameters are baked in as
constants, the artifact carries its platform list and input signature, and
any JAX-capable runtime (or XLA-compatible loader) can execute it without
this package's model code.

Export surfaces:
- feature scoring (default): (batch, feat_len, feat_dim) float32 features
  -> (batch,) raw scores under the run's add-loss scoring rule (the same
  rule generate_score applies, /root/reference/generate_score.py:102-111).
- raw scoring (--raw): (batch, n_samples) float32 waveforms + (batch,)
  int32 lengths -> (batch,) scores, with the on-device LFCC front-end and
  pad/crop policy baked into the artifact (cache-free serving).
- --ensemble runs export ONE artifact computing the avg-fused score over
  all stacked members (the reference's 3-system fusion as a single
  deployable function).

Writes <out> (serialized bytes) and <out>.json (metadata: platform,
signature, scoring semantics). --check deserializes the artifact and
verifies it against the live function on random input before writing.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from asvspoof2021_air_tpu.cli.generate_score import load_system


def build_score_fn(model, variables, loss_mod, loss_vars, add_loss,
                   ensemble: int, frontend=None):
    """Batched scoring function following the per-loss scoring rules
    (scoring.score_rule — the same rule the run was model-selected with);
    for ensembles, the avg-fused score over the member axis."""
    from asvspoof2021_air_tpu.scoring import score_rule

    def member_score(mvars, mloss, feats):
        emb, logits = model.apply(mvars, feats, False)
        return score_rule(add_loss, emb, logits, loss_mod, mloss)

    if ensemble > 1:
        stacked_vars = jax.tree.map(lambda *xs: jnp.stack(xs), *variables)
        stacked_loss = (
            jax.tree.map(lambda *xs: jnp.stack(xs), *loss_vars)
            if loss_vars[0] is not None else None
        )

        def score_feats(feats):
            scores = jax.vmap(member_score, in_axes=(0, 0, None))(
                stacked_vars, stacked_loss, feats
            )
            return jnp.mean(scores, axis=0)
    else:
        def score_feats(feats):
            return member_score(variables, loss_vars, feats)

    if frontend is None:
        return score_feats

    def score_raw(wave, lengths):
        feats = frontend({"wave": wave, "length": lengths},
                         jax.random.PRNGKey(0), frontend.params)
        return score_feats(feats)

    return score_raw


def export_system(model_dir: str, output: str, batch_size: int = 64,
                  raw: bool = False, wave_seconds: float = 7.49,
                  checkpoint: str = "best", check: bool = False,
                  quantize: str = "none") -> dict:
    """Export a trained run to a StableHLO artifact; returns the metadata.

    quantize='int8' stores matmul/conv weights as int8 with per-channel
    scales (ops/quantize.py); dequantization is traced into the artifact
    so XLA fuses it into the weight reads. --check then also reports the
    score deviation vs the float system."""
    model, variables, loss_mod, loss_vars, cfg = load_system(
        model_dir, checkpoint
    )
    float_variables = variables
    if quantize == "int8":
        from asvspoof2021_air_tpu.ops.quantize import (
            dequantize_tree,
            quantize_tree_int8,
            quantized_bytes,
        )

        def q_tree(v):
            qt = quantize_tree_int8(v)
            return qt, quantized_bytes(qt)

        if cfg.ensemble > 1:
            quants = [q_tree(v) for v in variables]
            qbytes = sum(b[0] for _, b in quants)
            fbytes = sum(b[1] for _, b in quants)
            variables = [dequantize_tree(qt) for qt, _ in quants]
        else:
            qt, (qbytes, fbytes) = q_tree(variables)
            variables = dequantize_tree(qt)
    elif quantize != "none":
        raise ValueError(f"unknown quantize mode {quantize!r}")
    add_loss = cfg.add_loss
    frontend = None
    if cfg.model == "rawnet":
        # raw-waveform model: there is no feature surface to export
        if not raw:
            raise ValueError(
                "rawnet consumes raw waveforms; export it with --raw"
            )
        from asvspoof2021_air_tpu.models.rawnet import RAWNET2_DEFAULT_ARGS
        from asvspoof2021_air_tpu.train.frontend import WaveformFrontend

        nb_samp = (cfg.rawnet_args or RAWNET2_DEFAULT_ARGS)["nb_samp"]
        frontend = WaveformFrontend(n_samples=nb_samp, augmenter=None)
    elif raw:
        from asvspoof2021_air_tpu.train.frontend import OnDeviceFrontend

        frontend = OnDeviceFrontend(
            feat_len=cfg.feat_len, padding=cfg.padding, augmenter=None,
            feature=cfg.feat,
        )

    # load_system returns member lists for ensembles, plain trees otherwise
    fn = build_score_fn(model, variables, loss_mod, loss_vars, add_loss,
                        cfg.ensemble, frontend)

    if raw:
        n_samples = max(int(wave_seconds * 16000), frontend.min_samples())
        args = (
            jax.ShapeDtypeStruct((batch_size, n_samples), jnp.float32),
            jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        )
        signature = {
            "wave": [batch_size, n_samples, "float32"],
            "length": [batch_size, "int32"],
        }
    else:
        args = (
            jax.ShapeDtypeStruct(
                (batch_size, cfg.feat_len, cfg.feat_dim), jnp.float32
            ),
        )
        signature = {
            "feat": [batch_size, cfg.feat_len, cfg.feat_dim, "float32"],
        }

    exported = jax_export.export(jax.jit(fn))(*args)
    blob = exported.serialize()

    if check:
        back = jax_export.deserialize(blob)
        g = np.random.default_rng(0)
        if raw:
            test_args = (
                g.standard_normal(
                    (batch_size, n_samples)).astype(np.float32),
                np.full((batch_size,), n_samples, np.int32),
            )
        else:
            test_args = (
                g.standard_normal(
                    (batch_size, cfg.feat_len, cfg.feat_dim)
                ).astype(np.float32),
            )
        got = np.asarray(back.call(*test_args))
        want = np.asarray(jax.jit(fn)(*test_args))
        if not np.allclose(got, want, rtol=1e-5, atol=1e-5):
            raise RuntimeError(
                f"roundtrip check failed: max diff "
                f"{np.abs(got - want).max()}"
            )
        if quantize == "int8":
            # deviation of the quantized scorer vs the float system
            float_fn = build_score_fn(model, float_variables, loss_mod,
                                      loss_vars, add_loss, cfg.ensemble,
                                      frontend)
            ref = np.asarray(jax.jit(float_fn)(*test_args))
            quant_dev = float(np.abs(got - ref).max())
            # score-ORDER agreement: the corpus-level metrics (EER/tDCF)
            # only see score order, so report the fraction of pairs the
            # int8 and float scorers rank identically (the synthetic-
            # corpus EER-delta gate lives in
            # tests/test_ecapa_int8.py::test_int8_eer_delta_on_synthetic_corpus)
            go = np.sign(got.ravel()[:, None] - got.ravel()[None, :])
            ro = np.sign(ref.ravel()[:, None] - ref.ravel()[None, :])
            quant_rank = float((go == ro).mean())
        else:
            quant_dev = None
            quant_rank = None

    meta = {
        "platforms": list(exported.platforms),
        "signature": signature,
        "output": [batch_size, "float32"],
        "mode": "raw" if raw else "features",
        "model": cfg.model,
        "add_loss": add_loss,
        "ensemble": cfg.ensemble,
        "score_semantics": (
            "raw score; write -score to reproduce reference score files "
            "(/root/reference/generate_score.py:114-119)"
        ),
        "bytes": len(blob),
        "quantize": quantize,
    }
    if quantize == "int8":
        meta["param_bytes_int8"] = qbytes
        meta["param_bytes_f32"] = fbytes
        if check:
            meta["quantized_score_max_dev"] = quant_dev
            meta["quantized_rank_agreement"] = quant_rank
    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
    with open(output, "wb") as f:
        f.write(blob)
    with open(output + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def main(argv=None):
    p = argparse.ArgumentParser("export a trained system for serving")
    p.add_argument("--model_folder", type=str, default="./models")
    p.add_argument("-n", "--model_name", type=str, required=True)
    p.add_argument("-o", "--output", type=str, required=True,
                   help="artifact path (metadata written to <output>.json)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--raw", action="store_true",
                   help="export waveform->score with the LFCC front-end "
                        "baked in (cache-free serving)")
    p.add_argument("--wave_seconds", type=float, default=7.49,
                   help="static waveform length for --raw (reference "
                        "operating point: 750 LFCC frames)")
    p.add_argument("--checkpoint", type=str, default="best")
    p.add_argument("--check", action="store_true",
                   help="deserialize and verify against the live function "
                        "before writing")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8"],
                   help="weights-only int8 with per-channel scales "
                        "(ops/quantize.py); --check reports the score "
                        "deviation vs the float system")
    args = p.parse_args(argv)

    ckpt = args.checkpoint
    if ckpt != "best" and not os.path.isabs(ckpt):
        ckpt = os.path.join("checkpoint", ckpt)
    meta = export_system(
        os.path.join(args.model_folder, args.model_name), args.output,
        batch_size=args.batch_size, raw=args.raw,
        wave_seconds=args.wave_seconds, checkpoint=ckpt, check=args.check,
        quantize=args.quantize,
    )
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
