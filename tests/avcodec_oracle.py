"""Shim: the libavcodec ctypes harness now lives in the package
(asvspoof2021_air_tpu.interop.avcodec) so the opt-in system-fidelity
augmentation tier can use it at runtime; tests keep importing from here."""

from asvspoof2021_air_tpu.interop.avcodec import (  # noqa: F401
    AV_OPT_SEARCH_CHILDREN,
    AV_SAMPLE_FMT_S16,
    CTX_CH_LAYOUT,
    CTX_FRAME_SIZE,
    CTX_SAMPLE_FMT,
    FRM_CH_LAYOUT,
    FRM_DATA0,
    FRM_FORMAT,
    FRM_NB_SAMPLES,
    PKT_DATA,
    PKT_SIZE,
    OracleUnavailable,
    ff_decode,
    ff_decode_packets,
    ff_encode,
    ff_encode_packets,
    _get_i32,
    _get_ptr,
    _load,
    _set_i32,
)
