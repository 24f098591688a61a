"""Black-box oracle over the in-image lavc `g729` decoder, opening the
G.729A recovery campaign (the reference's `g729a` common-tier entry,
/root/reference/channel_simulation/simulated_channel.py:36-39) by the
same probe-tables route that closed mp3/aac/AMR-NB.

Only observable input/output behavior is used: 10-byte (80-bit, G.729 /
G.729A 8 kbps) or 8-byte (64-bit, G.729D 6.4 kbps) raw frames decode to
80 float samples (10 ms at 8 kHz) on a FRESH decoder instance.

Established behavior (probe_dec.py):
- packet sizes 10 and 8 accepted; anything else rejected;
- fully deterministic from a fresh context; zero frame -> silence;
- single-bit flips perturb the output => per-bit classification works.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "amr_oracle", "/root/repo/tools/amr_tables/oracle.py")
_amr_oracle = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_amr_oracle)
Decoder = _amr_oracle.Decoder  # shared lavc harness

FRAME_BYTES = 10   # G.729/A 8 kbps
FRAME_BITS = 80
SAMPLES = 80       # per 10 ms frame


def pack_frame(bits) -> bytes:
    """Pack an 80-entry bit list (MSB-first) into one raw frame."""
    bits = list(bits)
    assert len(bits) == FRAME_BITS
    payload = bytearray(FRAME_BYTES)
    for i, b in enumerate(bits):
        if b:
            payload[i >> 3] |= 0x80 >> (i & 7)
    return bytes(payload)


def decode_frames(frames) -> np.ndarray:
    d = Decoder("g729", 8000)
    return np.concatenate([d.decode(f) for f in frames])


def decode_bits(bit_frames) -> np.ndarray:
    return decode_frames([pack_frame(b) for b in bit_frames])
