"""Offline feature materialization CLI
(capability of /root/reference/preprocess.py).

Where the reference loops utterance-by-utterance through a torch LFCC module
and torch.saves per-utterance .pt files, this driver batches waveforms into
length buckets, extracts LFCC on device (fused Pallas kernel on TPU), and
writes .npy files with the reference filename schema
``%06d_%s_%s_%s.npy`` = idx_filename_tag_label (/root/reference/preprocess.py:243-244),
so cached-feature datasets are interchangeable between frameworks.
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.data.datasets import RawAudioDataset
from asvspoof2021_air_tpu.ops.cqcc import CQCC, CQCCConfig
from asvspoof2021_air_tpu.ops.lfcc import LFCC, LFCCConfig, Melspec, STFT


def bucket_extract(extractor, items: List[tuple], out_dir: str,
                   start_idx: int, batch_size: int = 32,
                   bucket_quant: int = 16000) -> int:
    """Group utterances into padded length buckets and extract in batches."""
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
            _w, fname, tag, label = items[i]
            T = 1 + lens[r] // 160
            out = feats[r:r + 1, :T, :]
            np.save(
                os.path.join(out_dir,
                             f"{start_idx + i:06d}_{fname}_{tag}_{label}.npy"),
                out,
            )
            n_written += 1
    return n_written


def main(argv=None):
    p = argparse.ArgumentParser("materialize features to disk")
    p.add_argument("-a", "--access_type", type=str, default="LA")
    p.add_argument("-d", "--path_to_database", type=str, required=True)
    p.add_argument("-o", "--out_dir", type=str, required=True)
    p.add_argument("--part", type=str, default="train",
                   choices=["train", "dev", "eval"])
    p.add_argument("--feature", type=str, default="LFCC",
                   choices=["LFCC", "CQCC", "STFT", "Melspec"])
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args(argv)

    ds = RawAudioDataset(args.access_type, args.path_to_database, args.part)
    if args.feature == "LFCC":
        extractor = jax.jit(LFCC(LFCCConfig()))
    elif args.feature == "CQCC":
        extractor = jax.jit(CQCC(CQCCConfig()))
    elif args.feature == "STFT":
        stft = STFT()
        extractor = jax.jit(lambda w, l: stft(w))
    else:
        mel = Melspec()
        extractor = jax.jit(lambda w, l: jnp.transpose(mel(w), (0, 2, 1)))

    out_dir = os.path.join(args.out_dir, args.part, args.feature)
    items = []
    tag_inv = {v: k for k, v in ds.tag.items()}
    label_inv = {v: k for k, v in ds.label.items()}
    for i in range(len(ds)):
        wav, fname, tag, label = ds[i]
        items.append((wav, fname, tag_inv[tag], label_inv[label]))
    n = bucket_extract(extractor, items, out_dir, 0, args.batch_size)
    print(f"wrote {n} feature files to {out_dir}")


if __name__ == "__main__":
    main()
