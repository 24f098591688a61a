"""Batch pipeline: pad/crop policies, collation, ratio-mixed batching.

Pad/crop semantics match the reference
(/root/reference/dataset.py:67-79, 513-528): random crop when longer than
feat_len; zero / repeat / silence padding when shorter. The orig:aug batch
mixing reproduces the dual-DataLoader scheme
(/root/reference/main_train.py:226-242, 310-321): per step, an original
sub-batch of size int(B*ratio) and an augmented sub-batch of size
B - int(B*ratio) are concatenated; each stream reshuffles and wraps
independently. Batches are always full-size (static shapes for XLA; the
reference's ragged final batches are folded into the wraparound).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

_SILENCE_FRAME: Optional[np.ndarray] = None


def _silence_frame(dim: int) -> np.ndarray:
    """LFCC feature vector of pure silence, lazily computed once
    (cf. /root/reference/dataset.py:13-16)."""
    global _SILENCE_FRAME
    if _SILENCE_FRAME is None or _SILENCE_FRAME.shape[-1] != dim:
        from asvspoof2021_air_tpu.ops.lfcc import LFCC, LFCCConfig

        n_filters = max(dim // 3, 1)
        _SILENCE_FRAME = LFCC(LFCCConfig(n_filters=n_filters)).silence_frame()
    return _SILENCE_FRAME


def pad_or_crop(
    feat: np.ndarray,
    feat_len: int,
    padding: str = "repeat",
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """(1, T, D) -> (1, feat_len, D) via random crop / padding policy."""
    _, t, d = feat.shape
    if t > feat_len:
        start = 0
        if rng is not None and t - feat_len > 0:
            start = int(rng.integers(0, t - feat_len))
        return feat[:, start:start + feat_len, :]
    if t < feat_len:
        pad = feat_len - t
        if padding == "zero":
            return np.concatenate(
                [feat, np.zeros((1, pad, d), feat.dtype)], axis=1
            )
        if padding == "repeat":
            reps = -(-feat_len // t)  # ceil
            return np.tile(feat, (1, reps, 1))[:, :feat_len, :]
        if padding == "silence":
            sil = np.broadcast_to(_silence_frame(d), (1, pad, d)).astype(feat.dtype)
            # silence is PREPENDED (/root/reference/dataset.py:525-528)
            return np.concatenate([sil, feat], axis=1)
        raise ValueError("padding should be zero, repeat, or silence")
    return feat


def collate(samples: Sequence[tuple], feat_len: int, padding: str,
            rng: Optional[np.random.Generator] = None,
            pad_chop: bool = True) -> Dict[str, np.ndarray]:
    """Collate dataset items into a batch dict with (B, T, F) features.

    pad_chop=False reproduces the reference's variable-length collate
    (/root/reference/dataset.py:87-102): repeat-pad every item to the batch
    max length + 1 instead of the fixed feat_len. NOTE: variable batch
    shapes trigger XLA recompiles per distinct length — the reference's own
    operating mode, kept for parity; prefer pad_chop=True on TPU.
    """
    if not pad_chop:
        feat_len = max(s[0].shape[1] for s in samples) + 1
        padding = "repeat"
    feats = np.concatenate(
        [pad_or_crop(s[0], feat_len, padding, rng) for s in samples], axis=0
    )
    batch: Dict[str, np.ndarray] = {"feat": feats.astype(np.float32)}
    if len(samples[0]) >= 4:
        batch["fname"] = np.array([s[1] for s in samples])
        batch["tag"] = np.array([s[2] for s in samples], np.int32)
        batch["label"] = np.array([s[3] for s in samples], np.int32)
    else:  # eval: (feat, fname)
        batch["fname"] = np.array([s[1] for s in samples])
    if len(samples[0]) >= 5:
        batch["channel"] = np.array([s[4] for s in samples], np.int32)
    return batch


class _IndexStream:
    """Endless reshuffled index stream over a range (the DataLoader-with-
    SubsetRandomSampler + StopIteration-restart pattern,
    /root/reference/main_train.py:310-321)."""

    def __init__(self, indices: Sequence[int], rng: np.random.Generator,
                 shuffle: bool = True):
        self.indices = np.asarray(indices)
        self.rng = rng
        self.shuffle = shuffle
        self._pos = 0
        self._order = self._new_order()

    def _new_order(self):
        order = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(order)
        return order

    def take(self, n: int) -> np.ndarray:
        out = []
        while n > 0:
            avail = len(self._order) - self._pos
            if avail == 0:
                self._order = self._new_order()
                self._pos = 0
                avail = len(self._order)
            k = min(n, avail)
            out.append(self._order[self._pos:self._pos + k])
            self._pos += k
            n -= k
        return np.concatenate(out)


class RatioMixIterator:
    """Yields batches mixing original and augmented items at a fixed ratio.

    dataset items at index < num_original are 'original'; the rest are
    augmented (the AugmentedFeatureDataset layout). With ratio=1 or
    num_original == len(dataset), plain batching over the whole range.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        ratio: float = 0.5,
        num_original: Optional[int] = None,
        feat_len: int = 750,
        padding: str = "repeat",
        seed: int = 688,
        steps_per_epoch: Optional[int] = None,
        pad_chop: bool = True,
    ):
        if not (0 < ratio <= 1):
            raise ValueError("ratio must be in (0, 1]")
        self.dataset = dataset
        self.batch_size = batch_size
        self.feat_len = feat_len
        self.padding = padding
        self.pad_chop = pad_chop
        n = len(dataset)
        if num_original is None:
            num_original = getattr(dataset, "num_original", n)
        self.num_original = min(num_original, n)
        self.ori_bs = int(batch_size * ratio)
        self.aug_bs = batch_size - self.ori_bs
        if self.num_original == n:
            self.aug_bs = 0
            self.ori_bs = batch_size
        self.rng = np.random.default_rng(seed)
        self._ori = _IndexStream(np.arange(self.num_original), self.rng)
        self._aug = (
            _IndexStream(np.arange(self.num_original, n), self.rng)
            if self.aug_bs
            else None
        )
        # steps per epoch = ceil(n_ori / ori_bs), the reference's
        # len(trainOriDataLoader) (/root/reference/main_train.py:310).
        self.steps_per_epoch = steps_per_epoch or -(-self.num_original // max(self.ori_bs, 1))

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        for _ in range(self.steps_per_epoch):
            idx = self._ori.take(self.ori_bs)
            if self._aug is not None:
                idx = np.concatenate([idx, self._aug.take(self.aug_bs)])
            samples = [self.dataset[int(i)] for i in idx]
            yield collate(samples, self.feat_len, self.padding, self.rng,
                          self.pad_chop)


class SequentialIterator:
    """Deterministic batching for scoring/eval; final partial batch is padded
    up to batch_size with repeats and a 'valid' mask so device shapes stay
    static."""

    def __init__(self, dataset, batch_size: int, feat_len: int = 750,
                 padding: str = "repeat"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.feat_len = feat_len
        self.padding = padding

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        for start in range(0, n, self.batch_size):
            idx = list(range(start, min(start + self.batch_size, n)))
            valid = len(idx)
            while len(idx) < self.batch_size:
                idx.append(idx[-1])
            samples = [self.dataset[i] for i in idx]
            batch = collate(samples, self.feat_len, self.padding, rng=None)
            batch["valid"] = np.arange(self.batch_size) < valid
            yield batch

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.batch_size)


class WaveformIterator:
    """Fixed-shape waveform batching for the on-device front-end.

    Long utterances are random-cropped to max_samples (the waveform-domain
    equivalent of the reference's per-epoch random feature crop,
    /root/reference/dataset.py:68-70); short ones are zero-padded with their
    true length carried alongside (padding policy applied in feature space on
    device by train.frontend.OnDeviceFrontend). Supports the same orig:aug
    ratio mixing as RatioMixIterator.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        max_samples: int,
        ratio: float = 1.0,
        num_original: Optional[int] = None,
        seed: int = 688,
        steps_per_epoch: Optional[int] = None,
        shuffle: bool = True,
    ):
        if not (0 < ratio <= 1):
            raise ValueError("ratio must be in (0, 1]")
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_samples = max_samples
        n = len(dataset)
        if num_original is None:
            num_original = getattr(dataset, "num_original", n)
        self.num_original = min(num_original, n)
        self.ori_bs = int(batch_size * ratio)
        self.aug_bs = batch_size - self.ori_bs
        if self.num_original == n:
            self.aug_bs = 0
            self.ori_bs = batch_size
        self.rng = np.random.default_rng(seed)
        self._ori = _IndexStream(np.arange(self.num_original), self.rng, shuffle)
        self._aug = (
            _IndexStream(np.arange(self.num_original, n), self.rng, shuffle)
            if self.aug_bs
            else None
        )
        self.steps_per_epoch = steps_per_epoch or -(
            -self.num_original // max(self.ori_bs, 1)
        )

    def _collate(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        waves = np.zeros((len(idx), self.max_samples), np.float32)
        lengths = np.zeros(len(idx), np.int32)
        fnames, tags, labels, channels = [], [], [], []
        for r, i in enumerate(idx):
            item = self.dataset[int(i)]
            w = np.asarray(item[0], np.float32).ravel()
            if len(w) > self.max_samples:
                start = int(self.rng.integers(0, len(w) - self.max_samples + 1))
                w = w[start:start + self.max_samples]
            waves[r, :len(w)] = w
            lengths[r] = len(w)
            fnames.append(item[1])
            tags.append(item[2] if len(item) > 2 else 0)
            labels.append(item[3] if len(item) > 3 else 0)
            if len(item) > 4:
                channels.append(item[4])
        batch = {
            "wave": waves,
            "length": lengths,
            "fname": np.array(fnames),
            "tag": np.array(tags, np.int32),
            "label": np.array(labels, np.int32),
        }
        if channels:
            batch["channel"] = np.array(channels)
        return batch

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        for _ in range(self.steps_per_epoch):
            idx = self._ori.take(self.ori_bs)
            if self._aug is not None:
                idx = np.concatenate([idx, self._aug.take(self.aug_bs)])
            yield self._collate(idx)
