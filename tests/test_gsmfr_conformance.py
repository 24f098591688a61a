"""Bit-exact conformance of the from-scratch GSM 06.10 codec
(native/augment/gsmfr.cc) against the canonical libgsm implementation —
the de-facto ETSI reference, present in-image as libgsm.so.1.

Both directions are pinned: our encoder's 33-byte bitstreams must equal
libgsm's byte-for-byte, and our decoder's PCM must equal libgsm's
sample-for-sample on libgsm-produced streams. Skipped when libgsm is not
available (the from-scratch codec itself has no external dependency;
tests/test_gsmfr.py covers oracle-free self-consistency)."""

import ctypes
import ctypes.util

import numpy as np
import pytest

from asvspoof2021_air_tpu.data.augment_host import gsmfr_decode, gsmfr_encode


def _libgsm():
    name = ctypes.util.find_library("gsm") or "libgsm.so.1"
    try:
        lg = ctypes.CDLL(name)
    except OSError:
        pytest.skip("libgsm not available")
    lg.gsm_create.restype = ctypes.c_void_p
    lg.gsm_destroy.argtypes = [ctypes.c_void_p]
    lg.gsm_encode.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_short),
                              ctypes.POINTER(ctypes.c_ubyte)]
    lg.gsm_decode.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
                              ctypes.POINTER(ctypes.c_short)]
    lg.gsm_decode.restype = ctypes.c_int
    return lg


def _lg_encode(lg, pcm: np.ndarray) -> bytes:
    h = lg.gsm_create()
    out = bytearray()
    for i in range(len(pcm) // 160):
        fr = (ctypes.c_ubyte * 33)()
        seg = pcm[i * 160:(i + 1) * 160].copy()
        lg.gsm_encode(h, seg.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
                      fr)
        out += bytes(fr)
    lg.gsm_destroy(h)
    return bytes(out)


def _lg_decode(lg, frames: bytes) -> np.ndarray:
    h = lg.gsm_create()
    out = []
    buf = np.frombuffer(frames, np.uint8)
    for i in range(len(buf) // 33):
        fr = (ctypes.c_ubyte * 33)(*buf[i * 33:(i + 1) * 33])
        pcm = (ctypes.c_short * 160)()
        assert lg.gsm_decode(h, fr, pcm) == 0
        out.append(np.frombuffer(pcm, np.int16).copy())
    lg.gsm_destroy(h)
    return np.concatenate(out)


def _cases(n=160 * 60):
    g = np.random.default_rng(42)
    t = np.arange(n) / 8000.0
    return {
        "silence": np.zeros(n),
        "loud_noise": 0.99 * g.uniform(-1, 1, n),
        "quiet_noise": 0.001 * g.standard_normal(n),
        "tone_1k": 0.8 * np.sin(2 * np.pi * 1000 * t),
        "impulses": np.where(g.random(n) < 0.01,
                             g.choice([-0.9, 0.9], n), 0.0),
        "chirp": 0.7 * np.sin(2 * np.pi * (100 + 1900 * t / t[-1]) * t),
        "speechish": np.convolve(
            0.5 * np.sin(2 * np.pi * 220 * t)
            * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
            + 0.1 * g.standard_normal(n), np.ones(6) / 6, "same"),
        "dc_pos": 0.5 * np.ones(n),
        "square_alt": np.tile([0.9, -0.9], n // 2),
    }


@pytest.mark.parametrize("name", sorted(_cases(160)))
def test_encoder_bitstream_matches_libgsm(name):
    lg = _libgsm()
    x = _cases()[name]
    pcm = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)
    ours = gsmfr_encode(pcm.astype(np.float32) / 32768.0)
    ref = _lg_encode(lg, pcm)
    assert ours[:len(ref)] == ref


@pytest.mark.parametrize("name", ["speechish", "loud_noise", "impulses"])
def test_decoder_pcm_matches_libgsm(name):
    lg = _libgsm()
    x = _cases()[name]
    pcm = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)
    frames = _lg_encode(lg, pcm)
    ref = _lg_decode(lg, frames).astype(np.int64)
    ours = np.round(gsmfr_decode(frames) * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(ours, ref)


def test_roundtrip_both_stacks_agree():
    """our encoder -> libgsm decoder == our encoder -> our decoder."""
    lg = _libgsm()
    x = _cases()["speechish"]
    pcm = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)
    frames = gsmfr_encode(pcm.astype(np.float32) / 32768.0)
    ref = _lg_decode(lg, frames).astype(np.int64)
    ours = np.round(gsmfr_decode(frames) * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(ours, ref)
