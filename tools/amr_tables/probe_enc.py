"""Round-trip check of the MR122 encoder prototype: encode synthetic
speech-like signals, decode with BOTH the replica and the lavc oracle,
report segmental SNR (decoded vs input) and replica-vs-oracle agreement.
The decoder chain includes the adaptive postfilter + HP, so we also
report SNR against the replica's PRE-postfilter synthesis (the quantity
the encoder actually controls)."""

from __future__ import annotations

import numpy as np

import amrnb_dec as D
import amrnb_enc as E
import oracle


def speechlike(n=1600, seed=0, f0=110.0):
    """Voiced pulse train through a slowly-varying 2-formant filter."""
    rng = np.random.default_rng(seed)
    exc = np.zeros(n)
    t = 0.0
    while t < n:
        exc[int(t)] = 1.0
        t += 8000.0 / f0 * (1.0 + 0.02 * np.sin(t / 700.0))
    exc += 0.02 * rng.standard_normal(n)
    out = np.zeros(n)
    y1 = np.zeros(2)
    y2 = np.zeros(2)
    for i in range(n):
        fa = 650 + 150 * np.sin(2 * np.pi * i / 1900.0)
        fb = 1800 + 300 * np.cos(2 * np.pi * i / 2300.0)
        o = exc[i]
        for (fc, bw, y) in ((fa, 120, y1), (fb, 180, y2)):
            r = np.exp(-np.pi * bw / 8000.0)
            c = 2 * r * np.cos(2 * np.pi * fc / 8000.0)
            o_new = o + c * y[0] - r * r * y[1]
            y[1] = y[0]
            y[0] = o_new
            o = o_new
        out[i] = o
    out = out / np.abs(out).max() * 0.35
    return out


def segsnr(ref, got, seg=160):
    n = min(len(ref), len(got))
    snrs = []
    for i in range(0, n - seg + 1, seg):
        e = ref[i:i + seg] - got[i:i + seg]
        pe = np.dot(e, e)
        ps = np.dot(ref[i:i + seg], ref[i:i + seg])
        if ps > 1e-9:
            snrs.append(10 * np.log10(max(ps, 1e-12) / max(pe, 1e-12)))
    return float(np.mean(snrs)) if snrs else float("nan")


def main():
    sig = speechlike()
    frames = E.encode(sig)
    got_replica = D.decode(frames)
    got_oracle = oracle.decode_bits(7, frames)
    n = min(len(sig), len(got_oracle))
    print(f"frames: {len(frames)}")
    print(f"replica vs oracle: max_abs="
          f"{np.abs(got_replica[:n] - got_oracle[:n]).max():.3e} "
          f"(oracle max {np.abs(got_oracle[:n]).max():.3e})")
    print(f"segSNR(input, oracle-decoded):  "
          f"{segsnr(sig[:n], got_oracle[:n]):.2f} dB")
    print(f"segSNR(input, replica-decoded): "
          f"{segsnr(sig[:n], got_replica[:n]):.2f} dB")
    # pre-postfilter synthesis SNR: rebuild synthesis from traced exc
    rec = []
    d = D.MR122Decoder(trace=rec)
    for b in frames:
        d.decode_frame(b)
    syn = []
    mem = np.zeros(10)
    for r in rec:
        y, mem = E.iir10(r["exc_syn"], r["a"], mem)
        syn.append(y)
    syn = np.concatenate(syn)
    print(f"segSNR(input, pre-postfilter synthesis): "
          f"{segsnr(sig[:len(syn)], syn):.2f} dB")


if __name__ == "__main__":
    main()
