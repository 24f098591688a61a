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
