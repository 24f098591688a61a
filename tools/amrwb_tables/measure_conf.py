"""Stream-conformance meter for the WB campaign: native encode ->
lavc decode, report best lag-searched waveform correlation and
per-second envelope correlation on the standard speechlike test
signal. Used to A/B table refits (FACTS 'Conformance diagnosis')."""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from asvspoof2021_air_tpu.data import augment_host as ah
from avcodec_oracle import ff_decode_packets


def speechlike(n=48000, seed=7):
    rng = np.random.default_rng(seed)
    exc = np.zeros(n)
    i = 0
    while i < n:
        exc[i] = 1.0
        i += 133 + int(8 * np.sin(i / 3000))
    exc += 0.02 * rng.standard_normal(n)
    y = exc
    for fc, bw in ((600, 120), (1400, 180), (2600, 260)):
        r = np.exp(-np.pi * bw / 16000)
        w = 2 * np.pi * fc / 16000
        b1, b2 = 2 * r * np.cos(w), -r * r
        out = np.zeros(n)
        y1 = y2 = 0.0
        for i in range(n):
            v = y[i] + b1 * y1 + b2 * y2
            out[i] = v
            y2, y1 = y1, v
        y = out
    return (0.25 * y / np.abs(y).max()).astype(np.float32)


def measure(sig, mode=2):
    bs = ah.amrwb_encode(sig, mode=mode)
    fsz = ah.AMRWB_MODE_BYTES[mode]
    pkts = [bs[i:i + fsz] for i in range(0, len(bs), fsz)]
    pcm = np.asarray(ff_decode_packets("amrwb", pkts, 16000))
    if pcm.dtype == np.int16:
        pcm = pcm.astype(np.float32) / 32768.0
    n = min(len(pcm), len(sig))
    best, bl = -1.0, 0
    for lag in range(0, 120):
        a = sig[: n - lag].astype(float)
        b = pcm[lag:n].astype(float)
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        if c > best:
            best, bl = c, lag
    # envelope correlation at 20ms resolution
    m = n // 320
    ea = np.sqrt((sig[: m * 320].reshape(m, 320).astype(float) ** 2).mean(1))
    eb = np.sqrt((pcm[: m * 320].reshape(m, 320).astype(float) ** 2).mean(1))
    ec = float(np.corrcoef(ea, eb)[0, 1])
    return best, bl, ec


if __name__ == "__main__":
    modes = [int(m) for m in sys.argv[1:]] or [2]
    for mode in modes:
        for seed in (7, 11, 23):
            c, lag, ec = measure(speechlike(48000, seed), mode)
            print(f"mode {mode} seed {seed}: waveform corr {c:.4f} "
                  f"(lag {lag})  envelope corr {ec:.4f}")
