"""Offline feature materialization CLI
(capability of /root/reference/preprocess.py).

Where the reference loops utterance-by-utterance through a torch LFCC module
and torch.saves per-utterance .pt files, this driver batches waveforms into
length buckets, extracts features on device (fused Pallas kernel on TPU), and
writes .npy files with the reference filename schema
``%06d_%s_%s_%s[_%s[_%s]].npy`` = idx_filename_tag_label[_channel[_device]]
(/root/reference/preprocess.py:243-244), so cached-feature datasets are
interchangeable between frameworks.

Corpus routing (the reference's commented dataset blocks,
/root/reference/preprocess.py:30-245):
- ``--dataset 2019`` (default): plain ASVspoof2019 train/dev/eval parts
- ``--dataset aug``: augmented wav trees (e.g. asvspoof-degrade output) via
  AugmentedRawAudioDataset — writes the ``_channel[_device]`` suffix fields
  consumed by --LA_aug/--LAPA_aug/... training
- ``--dataset 2015`` / ``vcc2020`` / ``2021eval``: the other raw corpora
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.data.datasets import (
    ASVspoof2015RawDataset,
    ASVspoof2021EvalRawDataset,
    AugmentedRawAudioDataset,
    RawAudioDataset,
    VCC2020RawDataset,
)
from asvspoof2021_air_tpu.ops.cqcc import CQCC, CQCCConfig
from asvspoof2021_air_tpu.ops.lfcc import LFCC, LFCCConfig, Melspec, STFT


def build_extractor(feature: str):
    """Returns (jitted extractor fn(wave, lengths) -> (B, T, D), hop).

    Every front-end here emits ``1 + L // hop`` frames for an L-sample
    utterance (LFCC/STFT: hop 160 center-padded frames, ops/dsp.py
    frame_signal; Melspec: hop 128 centered reflect-pad, ops/lfcc.py:160-173;
    CQCC: its own hop), so valid-frame trimming derives from the extractor's
    hop instead of hardcoding the LFCC constant.
    """
    if feature == "LFCC":
        lfcc = LFCC(LFCCConfig())
        return jax.jit(lfcc.__call__), lfcc.config.hop_length
    if feature == "CQCC":
        cqcc = CQCC(CQCCConfig())
        return jax.jit(cqcc.__call__), cqcc.config.hop_length
    if feature == "STFT":
        stft = STFT()
        return jax.jit(lambda w, l: stft(w)), stft.config.hop_length
    if feature == "Melspec":
        mel = Melspec()
        return (
            jax.jit(lambda w, l: jnp.transpose(mel(w), (0, 2, 1))),
            mel.hop_length,
        )
    raise ValueError(f"unknown feature '{feature}'")


def bucket_extract(extractor, hop: int, items: List[tuple], out_dir: str,
                   start_idx: int = 0, batch_size: int = 32,
                   bucket_quant: int = 16000) -> int:
    """Group utterances into padded length buckets and extract in batches.

    items: (waveform, name_suffix) — the written file is
    ``{idx:06d}_{name_suffix}.npy`` trimmed to the utterance's valid frames.
    """
    os.makedirs(out_dir, exist_ok=True)
    order = sorted(range(len(items)), key=lambda i: len(items[i][0]))
    n_written = 0
    for s in range(0, len(order), batch_size):
        idx = order[s:s + batch_size]
        waves = [items[i][0] for i in idx]
        lens = np.array([len(w) for w in waves], np.int32)
        L = int(-(-lens.max() // bucket_quant) * bucket_quant)
        batch = np.zeros((len(waves), L), np.float32)
        for r, w in enumerate(waves):
            batch[r, :len(w)] = w
        feats = extractor(jnp.asarray(batch), jnp.asarray(lens))
        feats = np.asarray(feats)
        for r, i in enumerate(idx):
            suffix = items[i][1]
            T = 1 + lens[r] // hop
            out = feats[r:r + 1, :T, :]
            np.save(
                os.path.join(out_dir, f"{start_idx + i:06d}_{suffix}.npy"),
                out,
            )
            n_written += 1
    return n_written


def collect_items(args) -> List[tuple]:
    """Build (waveform, filename-suffix) pairs for the selected corpus."""
    items = []
    if args.dataset == "2019":
        ds = RawAudioDataset(args.access_type, args.path_to_database, args.part)
        tag_inv = {v: k for k, v in ds.tag.items()}
        label_inv = {v: k for k, v in ds.label.items()}
        for i in range(len(ds)):
            wav, fname, tag, label = ds[i]
            items.append((wav, f"{fname}_{tag_inv[tag]}_{label_inv[label]}"))
    elif args.dataset == "aug":
        protocol_dir = args.path_to_protocol or os.path.join(
            args.path_to_database, args.access_type,
            f"ASVspoof2019_{args.access_type}_cm_protocols",
        )
        ds = AugmentedRawAudioDataset(
            args.aug_wav_dir, protocol_dir, args.part,
            with_device=args.with_device,
        )
        tag_inv = {v: k for k, v in ds.tag.items()}
        label_inv = {v: k for k, v in ds.label.items()}
        for i in range(len(ds)):
            item = ds[i]
            wav, fname, tag, label = item[:4]
            suffix = f"{fname}_{tag_inv[tag]}_{label_inv[label]}_{item[4]}"
            if args.with_device:
                suffix += f"_{item[5]}"
            items.append((wav, suffix))
    elif args.dataset == "2015":
        ds = ASVspoof2015RawDataset(
            args.path_to_database, args.path_to_protocol, args.part
        )
        tag_inv = {v: k for k, v in ds.tag.items()}
        label_inv = {v: k for k, v in ds.label.items()}
        for i in range(len(ds)):
            wav, fname, tag, label = ds[i]
            items.append((wav, f"{fname}_{tag_inv[tag]}_{label_inv[label]}"))
    elif args.dataset == "vcc2020":
        ds = VCC2020RawDataset(args.path_to_spoof, args.path_to_bonafide)
        for i in range(len(ds)):
            wav, fname, tag, label = ds[i]
            items.append((wav, f"{fname}_{tag}_{label}"))
    elif args.dataset == "2021eval":
        ds = ASVspoof2021EvalRawDataset(args.path_to_database)
        for i in range(len(ds)):
            wav, fname = ds[i]
            items.append((wav, fname))
    else:
        raise ValueError(args.dataset)
    return items


def main(argv=None):
    p = argparse.ArgumentParser("materialize features to disk")
    p.add_argument("--dataset", type=str, default="2019",
                   choices=["2019", "aug", "2015", "vcc2020", "2021eval"])
    p.add_argument("-a", "--access_type", type=str, default="LA")
    p.add_argument("-d", "--path_to_database", type=str, default="")
    p.add_argument("-o", "--out_dir", type=str, required=True)
    p.add_argument("--part", type=str, default="train",
                   choices=["train", "dev", "eval"])
    p.add_argument("--feature", type=str, default="LFCC",
                   choices=["LFCC", "CQCC", "STFT", "Melspec"])
    p.add_argument("--batch_size", type=int, default=32)
    # aug-tree options
    p.add_argument("--aug_wav_dir", type=str, default="",
                   help="root of augmented wavs (<root>/<part>/**.wav) "
                        "as written by the degrade CLI")
    p.add_argument("--with_device", action="store_true",
                   help="aug filenames carry _channel_device suffixes")
    p.add_argument("--path_to_protocol", type=str, default="",
                   help="protocol dir (aug/2015 datasets)")
    # vcc2020 options
    p.add_argument("--path_to_spoof", type=str, default="")
    p.add_argument("--path_to_bonafide", type=str, default="")
    args = p.parse_args(argv)

    # eager per-dataset argument validation (fail at argparse, not deep in
    # dataset construction)
    if args.dataset in ("2019", "2021eval") and not args.path_to_database:
        p.error(f"--dataset {args.dataset} requires -d/--path_to_database")
    if args.dataset == "aug" and not args.aug_wav_dir:
        p.error("--dataset aug requires --aug_wav_dir")
    if args.dataset == "aug" and not (args.path_to_protocol
                                      or args.path_to_database):
        p.error("--dataset aug requires --path_to_protocol (or -d to derive "
                "the protocol dir)")
    if args.dataset == "2015" and not (args.path_to_database
                                       and args.path_to_protocol):
        p.error("--dataset 2015 requires -d and --path_to_protocol")
    if args.dataset == "vcc2020" and not (args.path_to_spoof
                                          and args.path_to_bonafide):
        p.error("--dataset vcc2020 requires --path_to_spoof and "
                "--path_to_bonafide")

    extractor, hop = build_extractor(args.feature)
    items = collect_items(args)
    out_dir = os.path.join(args.out_dir, args.part, args.feature)
    n = bucket_extract(extractor, hop, items, out_dir, 0, args.batch_size)
    print(f"wrote {n} feature files to {out_dir}")


if __name__ == "__main__":
    main()
