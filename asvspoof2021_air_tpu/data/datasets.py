"""Feature and raw-audio datasets over the reference's on-disk layouts.

Cached features follow the reference filename schema
``%06d_%s_%s_%s[_%s[_%s]].{npy|pt}`` = idx_filename_tag_label[_channel[_device]]
(/root/reference/preprocess.py:243-244). Native files are .npy; .pt files
written by the reference are loadable when torch is present.

Dataset coverage vs the reference:
- ASVspoof2019FeatureDataset       == ASVspoof2019 (/root/reference/dataset.py:18-102)
  incl. genuine_only mode (:40-51)
- AugmentedFeatureDataset          == ASVspoof2021{LA,DF}{,PA}_aug
  (/root/reference/dataset.py:105-466): original + augmented trees
  concatenated, channel (and device) parsed from the filename suffix
- EvalFeatureDataset               == ASVspoof2021{LA,DF}eval
  (/root/reference/dataset.py:284-325, 469-510)
- RawAudioDataset                  == ASVspoof2019Raw et al.
  (/root/reference/raw_dataset.py) for the on-device LFCC path
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from asvspoof2021_air_tpu.data import protocol as proto
from asvspoof2021_air_tpu.data.audio_io import load_audio


def _find_feature_files(root: str) -> List[str]:
    """Sorted recursive scan for .npy/.pt feature files (librosa
    find_files equivalent, sorted for determinism)."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.endswith(".npy") or fn.endswith(".pt"):
                out.append(os.path.join(dirpath, fn))
    out.sort()
    return out


def load_feature_file(path: str) -> np.ndarray:
    """Load a cached feature tensor (1, T, D) from .npy or torch .pt."""
    if path.endswith(".npy"):
        arr = np.load(path)
    else:
        import torch  # optional, only for reference-produced caches

        arr = torch.load(path, map_location="cpu", weights_only=False)
        arr = arr.detach().cpu().numpy()
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 2:
        arr = arr[None]
    return arr


def _basename_fields(path: str) -> List[str]:
    base = os.path.basename(path)
    for ext in (".npy", ".pt"):
        if base.endswith(ext):
            base = base[: -len(ext)]
            break
    return base.split("_")


class ASVspoof2019FeatureDataset:
    """Cached-feature dataset over one part (train/dev/eval).

    Items: (feat (1, T, D) float32, filename, tag_id, label_id).
    """

    def __init__(
        self,
        access_type: str,
        path_to_features: str,
        part: str = "train",
        feature: str = "LFCC",
        genuine_only: bool = False,
    ):
        if access_type == "LA":
            self.tag = proto.LA_TAGS
        elif access_type == "PA":
            self.tag = proto.PA_TAGS
        else:
            raise ValueError("access type should be LA or PA")
        self.label = proto.LABELS
        self.part = part
        root = os.path.join(path_to_features, part, feature)
        self.files = _find_feature_files(root)
        if genuine_only:
            if access_type != "LA":
                raise ValueError("genuine_only supported for LA only")
            if part in ("train", "dev"):
                # bona fide entries sort first in the reference cache layout
                # (/root/reference/dataset.py:42-44)
                num_bonafide = {"train": 2580, "dev": 2548}
                self.files = self.files[: num_bonafide[part]]
            else:
                self.files = [f for f in self.files if "bonafide" in f]

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int):
        path = self.files[idx]
        fields = _basename_fields(path)
        if len(fields) != 6:
            raise ValueError(f"unexpected feature filename: {path}")
        feat = load_feature_file(path)
        filename = "_".join(fields[1:4])
        return feat, filename, self.tag[fields[4]], self.label[fields[5]]


class AugmentedFeatureDataset:
    """Original + augmented feature trees with channel/device labels.

    variant: 'LA' (60-codec vocab), 'DF' (7-compression vocab); with
    with_device=True the item carries np.array([channel_id, device_id])
    like the reference LAPA/DFPA datasets (/root/reference/dataset.py:276-277).
    Index < len(original files) => channel 'no_channel'
    (/root/reference/dataset.py:142-154).
    """

    def __init__(
        self,
        path_to_ori: str,
        path_to_aug: str,
        part: str = "train",
        feature: str = "LFCC",
        variant: str = "LA",
        with_device: bool = False,
    ):
        self.tag = proto.LA_TRAIN_TAGS
        self.label = proto.LABELS
        self.channel = (
            list(proto.LA_CHANNELS) if variant == "LA" else list(proto.DF_CHANNELS)
        )
        self.channel_dict = {c: i for i, c in enumerate(self.channel)}
        self.with_device = with_device
        if with_device:
            self.devices = list(proto.DEVICES)
            self.device_dict = {d: i for i, d in enumerate(self.devices)}
        self.ori_files = _find_feature_files(os.path.join(path_to_ori, part, feature))
        self.aug_files = _find_feature_files(os.path.join(path_to_aug, part, feature))

    def __len__(self) -> int:
        return len(self.ori_files) + len(self.aug_files)

    @property
    def num_original(self) -> int:
        return len(self.ori_files)

    def __getitem__(self, idx: int):
        if idx < len(self.ori_files):
            path = self.ori_files[idx]
            fields = _basename_fields(path)
            if len(fields) != 6:
                raise ValueError(f"unexpected original feature filename: {path}")
            channel = "no_channel"
            device = ""
        else:
            path = self.aug_files[idx - len(self.ori_files)]
            fields = _basename_fields(path)
            expected = 8 if self.with_device else 7
            if len(fields) != expected:
                raise ValueError(f"unexpected augmented feature filename: {path}")
            channel = fields[6]
            device = fields[7] if self.with_device else ""
        feat = load_feature_file(path)
        filename = "_".join(fields[1:4])
        tag = self.tag[fields[4]]
        label = self.label[fields[5]]
        if self.with_device:
            ch = np.array(
                [self.channel_dict[channel], self.device_dict[device]], np.int32
            )
        else:
            ch = self.channel_dict[channel]
        return feat, filename, tag, label, ch


class EvalFeatureDataset:
    """Unlabeled challenge eval features; items (feat, filename)
    (filename schema idx_fname-parts, /root/reference/dataset.py:298-321)."""

    def __init__(self, path_to_features: str, feature: str = "LFCC"):
        self.files = _find_feature_files(os.path.join(path_to_features, feature))

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int):
        path = self.files[idx]
        fields = _basename_fields(path)
        if len(fields) != 4:
            raise ValueError(f"unexpected eval feature filename: {path}")
        return load_feature_file(path), "_".join(fields[1:])


class RawAudioDataset:
    """Protocol-driven raw-audio dataset (waveform path for the on-device
    front-end); items (waveform (L,), filename, tag, label)."""

    def __init__(
        self,
        access_type: str,
        path_to_database: str,
        part: str = "train",
        path_to_protocol: Optional[str] = None,
        sample_rate: int = 16000,
        audio_ext: str = ".flac",
    ):
        self.sample_rate = sample_rate
        self.audio_dir = os.path.join(
            path_to_database, access_type,
            f"ASVspoof2019_{access_type}_{part}", "flac",
        )
        if not os.path.isdir(self.audio_dir):
            # wav fallback layout
            alt = os.path.join(
                path_to_database, access_type,
                f"ASVspoof2019_{access_type}_{part}", "wav",
            )
            if os.path.isdir(alt):
                self.audio_dir = alt
                audio_ext = ".wav"
        self.audio_ext = audio_ext
        ppath = proto.protocol_path(path_to_database, access_type, part,
                                    path_to_protocol)
        self.entries = proto.parse_protocol(ppath)
        self.tag = proto.LA_TAGS if access_type == "LA" else proto.PA_TAGS
        self.label = proto.LABELS

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int):
        e = self.entries[idx]
        path = os.path.join(self.audio_dir, e.filename + self.audio_ext)
        wav, _sr = load_audio(path, self.sample_rate)
        return wav, e.filename, self.tag[e.tag], self.label[e.label]


class AugmentedRawAudioDataset:
    """Raw augmented wav trees with channel (and device) parsed from the
    filename suffix — capability of the reference's raw augmented datasets
    (ASVspoof2019LARaw_withTransmission at /root/reference/raw_dataset.py:149,
    ...TransmissionAndDevice at :187, ASVspoof2019DFRaw_withCompression at
    :226, ...CompressionAndDevice at :264). Labels come from the CM protocol;
    items are (waveform, filename, tag, label, channel[, device])."""

    def __init__(
        self,
        path_to_database: str,
        path_to_protocol: str,
        part: str = "train",
        with_device: bool = False,
        sample_rate: int = 16000,
    ):
        self.with_device = with_device
        self.sample_rate = sample_rate
        self.audio_dir = os.path.join(path_to_database, part)
        self.files = []
        for dirpath, _d, filenames in os.walk(self.audio_dir):
            for fn in filenames:
                if fn.endswith(".wav"):
                    self.files.append(os.path.join(dirpath, fn))
        self.files.sort()
        ppath = os.path.join(
            path_to_protocol, f"ASVspoof2019.LA.cm.{part}.trl.txt"
        )
        self.info = {e.filename: e for e in proto.parse_protocol(ppath)}
        # train/dev attack vocabulary (+A07 like the reference,
        # raw_dataset.py:160)
        self.tag = dict(proto.LA_TRAIN_TAGS, A07=7)
        self.label = proto.LABELS

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int):
        path = self.files[idx]
        base = os.path.basename(path)[:-4]
        parts = base.split("_")
        n_suffix = 2 if self.with_device else 1
        filename = "_".join(parts[:-n_suffix])
        wav, _sr = load_audio(path, self.sample_rate)
        entry = self.info[filename]
        tag = self.tag[entry.tag]
        label = self.label[entry.label]
        if self.with_device:
            return wav, filename, tag, label, parts[-2], parts[-1]
        return wav, filename, tag, label, parts[-1]


class ASVspoof2015RawDataset:
    """ASVspoof2015 protocol-driven raw dataset (capability of
    /root/reference/raw_dataset.py:103-128): per-speaker wav subdirs, tags
    human/S1..S10, labels human=0/spoof=1."""

    def __init__(self, path_to_database: str, path_to_protocol: str,
                 part: str = "train", sample_rate: int = 16000):
        self.sample_rate = sample_rate
        self.path_to_audio = os.path.join(path_to_database, part)
        pro = {"train": "cm_train.trn", "dev": "cm_develop.ndx",
               "eval": "cm_evaluation.ndx"}[part]
        self.tag = proto.ASVSPOOF2015_TAGS
        self.label = {"spoof": 1, "human": 0}
        with open(os.path.join(path_to_protocol, pro)) as f:
            self.all_info = [line.strip().split() for line in f if line.strip()]

    def __len__(self) -> int:
        return len(self.all_info)

    def __getitem__(self, idx: int):
        speaker, filename, tag, label = self.all_info[idx]
        path = os.path.join(self.path_to_audio, speaker, filename + ".wav")
        wav, _sr = load_audio(path, self.sample_rate)
        return wav, filename.replace("_", "-"), self.tag[tag], self.label[label]


class VCC2020RawDataset:
    """VCC2020 bonafide/spoof raw dataset (capability of
    /root/reference/raw_dataset.py:70-100): bona fide from the database tree,
    spoof from the listening-test tree (tag = conversion system dir)."""

    def __init__(self, path_to_spoof: str, path_to_bonafide: str,
                 sample_rate: int = 16000):
        self.sample_rate = sample_rate

        def find_wavs(root):
            out = []
            for dirpath, _d, files in os.walk(root):
                out.extend(os.path.join(dirpath, f) for f in files
                           if f.endswith(".wav"))
            return sorted(out)

        self.all_spoof = find_wavs(path_to_spoof)
        self.all_bonafide = find_wavs(path_to_bonafide)

    def __len__(self) -> int:
        return len(self.all_spoof) + len(self.all_bonafide)

    def __getitem__(self, idx: int):
        if idx < len(self.all_bonafide):
            path = self.all_bonafide[idx]
            label, tag = "bonafide", "-"
            filename = "_".join(path.split(os.sep)[-3:])[:-4]
        else:
            path = self.all_spoof[idx - len(self.all_bonafide)]
            label = "spoof"
            tag = path.split(os.sep)[-3]
            filename = os.path.basename(path)[:-4]
        wav, _sr = load_audio(path, self.sample_rate)
        return wav, filename, tag, label


class ASVspoof2021EvalRawDataset:
    """Unlabeled ASVspoof2021 eval raw audio (capability of
    /root/reference/raw_dataset.py:131-146); items (waveform, filename)."""

    def __init__(self, path_to_database: str, sample_rate: int = 16000,
                 ext: str = ".wav"):
        self.sample_rate = sample_rate
        self.files = []
        for dirpath, _d, files in os.walk(path_to_database):
            self.files.extend(os.path.join(dirpath, f) for f in files
                              if f.endswith((".wav", ".flac")))
        self.files.sort()

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int):
        path = self.files[idx]
        wav, _sr = load_audio(path, self.sample_rate)
        return wav, os.path.splitext(os.path.basename(path))[0]
