"""Shared helpers for the AMR-WB (mode 2, 12.65 kbps) black-box
recovery campaign against the in-image lavc `amrwb` decoder — the same
route that closed AMR-NB (tools/amr_tables/, FACTS.md there).

Frame facts (first-light probes, see FACTS.md here):
- mode 2 storage frame: TOC (2<<3)|4 + 32 payload bytes (253 bits);
- 320 float samples per frame (20 ms at 16 kHz; the codec runs at
  12.8 kHz internally, 4 subframes of 64 -> upsampled 80 each);
- fully deterministic incl. the high-band noise generation;
- all-zero frame decodes to near-silence (HB noise floor ~8e-5 rms).

TS 26.201's published 12.65k bit allocation (the structural hypothesis
the probes test): VAD 1 + ISF 46 (8+8+6+7+7+5+5 MSVQ splits) + per
subframe {lag 9/6/9/6, LTP-filter flag 1, code 36, gain VQ 7}.
"""

from __future__ import annotations

import importlib.util as _ilu
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, "/root/repo")

_spec = _ilu.spec_from_file_location(
    "amr_oracle", "/root/repo/tools/amr_tables/oracle.py")
_amr_oracle = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_amr_oracle)

Decoder = _amr_oracle.Decoder
pack_frame = _amr_oracle.pack_frame

MODE = 2          # 12.65 kbps
BITS = 253
SAMPLES = 320     # per 20 ms frame at 16 kHz


def decode_bits(bit_frames) -> np.ndarray:
    return _amr_oracle.decode_bits(MODE, bit_frames, codec="amrwb")


def zero_frames(n=2):
    return [[0] * BITS for _ in range(n)]
