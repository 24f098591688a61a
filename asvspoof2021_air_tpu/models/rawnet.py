"""RawNet2: end-to-end raw-waveform model with a fixed sinc-filter front-end,
FMS-attended residual blocks, and a GRU head.

Capability of the reference RawNet (/root/reference/model.py:642-893):
- SincConv: mel-spaced band-pass FIR bank, Hamming-windowed, non-learned
  (/root/reference/model.py:642-706)
- |.| + max-pool(3), BN, SELU stem (:822-825)
- six residual blocks, each followed by filter-wise feature-map scaling
  ("FMS": sigmoid(fc(avgpool)) gates, x*g + g) (:827-861)
- BN + SELU -> GRU (batch-first) -> last hidden -> two dense layers (:863-871)

Returns (pre-logits, log_softmax), matching the reference contract (:873).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from asvspoof2021_air_tpu.models.common import batch_norm

RAWNET2_DEFAULT_ARGS = {
    # ASVspoof 2021 RawNet2 baseline hyperparameters.
    "nb_samp": 64600,
    "first_conv": 1024,
    "in_channels": 1,
    "filts": [20, [20, 20], [20, 128], [128, 128]],
    "blocks": [2, 4],
    "nb_fc_node": 1024,
    "gru_node": 1024,
    "nb_gru_layer": 3,
    "nb_classes": 2,
}


def sinc_filterbank(out_channels: int, kernel_size: int, sample_rate: int = 16000) -> np.ndarray:
    """Mel-spaced band-pass sinc FIR bank, Hamming windowed
    (/root/reference/model.py:678-698). Returns (kernel, 1, out_channels)."""
    if kernel_size % 2 == 0:
        kernel_size += 1

    def to_mel(hz):
        return 2595.0 * np.log10(1.0 + hz / 700.0)

    def to_hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    nfft = 512
    f = int(sample_rate / 2) * np.linspace(0, 1, int(nfft / 2) + 1)
    fmel = to_mel(f)
    mel_points = np.linspace(fmel.min(), fmel.max(), out_channels + 1)
    hz_points = to_hz(mel_points)

    hsupp = np.arange(-(kernel_size - 1) / 2, (kernel_size - 1) / 2 + 1)
    window = np.hamming(kernel_size)
    bank = np.zeros((out_channels, kernel_size), dtype=np.float64)
    for i in range(out_channels):
        fmin, fmax = hz_points[i], hz_points[i + 1]
        h_high = (2 * fmax / sample_rate) * np.sinc(2 * fmax * hsupp / sample_rate)
        h_low = (2 * fmin / sample_rate) * np.sinc(2 * fmin * hsupp / sample_rate)
        bank[i] = window * (h_high - h_low)
    # (kernel, in=1, out) layout for lax conv via flax semantics
    return bank.T[:, None, :].astype(np.float32)


def sinc_conv_fft(x, bank):
    """VALID cross-correlation of (B, L, 1) waveforms with the fixed sinc
    bank (K, 1, C) as one FFT pair — numerically the frequency-domain
    identity of `lax.conv_general_dilated(..., padding="VALID")`.

    On this TPU backend a 1025-tap time-domain conv over 64.6 k samples
    compiles for minutes and runs ~25 ms; the rfft/irfft pair is
    microseconds (.claude/skills/verify/SKILL.md). The bank's spectrum is
    precomputed with NUMPY (eager device FFT is unimplemented here) and
    carried as two real planes: conj(rfft(k)) turns circular convolution
    into the correlation lax.conv computes (no kernel flip). N = next
    pow2 >= L, and since t+j <= L-1 < N the circular wrap never touches
    the valid range, so no extra padding beyond N >= L is needed.
    """
    L = x.shape[1]
    K, _, C = bank.shape
    n = 1 << (L - 1).bit_length()
    spec = np.conj(np.fft.rfft(np.asarray(bank)[:, 0, :], n=n, axis=0))
    spec_re = jnp.asarray(spec.real.astype(np.float32))
    spec_im = jnp.asarray(spec.imag.astype(np.float32))
    xs = jnp.fft.rfft(x[..., 0].astype(jnp.float32), n=n, axis=1)
    ys = xs[:, :, None] * jax.lax.complex(spec_re, spec_im)
    y = jnp.fft.irfft(ys, n=n, axis=1)
    return y[:, : L - K + 1, :]


class ResidualBlock(nn.Module):
    """(/root/reference/model.py:709-762); operates on (B, T, C)."""

    out_channels: int
    first: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = x
        if not self.first:
            out = batch_norm(train)(out)
            out = nn.leaky_relu(out, 0.3)
        # NOTE: the reference convolves the raw input x here, not the
        # normalized `out` (/root/reference/model.py:752) — preserved.
        out = nn.Conv(self.out_channels, (3,), padding=((1, 1),))(x)
        out = batch_norm(train)(out)
        out = nn.leaky_relu(out, 0.3)
        out = nn.Conv(self.out_channels, (3,), padding=((1, 1),))(out)
        if x.shape[-1] != self.out_channels:
            identity = nn.Conv(self.out_channels, (1,))(identity)
        out = out + identity
        # MaxPool1d(3): kernel 3, stride 3, floor mode.
        T = out.shape[1] - out.shape[1] % 3
        out = out[:, :T].reshape(out.shape[0], T // 3, 3, out.shape[-1]).max(axis=2)
        return out


class FMSAttention(nn.Module):
    """Filter-wise feature-map scaling: x * sigmoid(fc(avgpool(x))) + gate
    (/root/reference/model.py:828-831)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=1)
        g = nn.Dense(self.channels)(g)
        g = jax.nn.sigmoid(g)[:, None, :]
        return x * g + g


class GRULayer(nn.Module):
    """Single GRU layer over (B, T, C), torch nn.GRU gate math
    (/root/reference/model.py:803-806,866-868):

        r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
        z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
        n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
        h' = (1 - z) * n + z * h

    flax's GRUCell omits the input-side bias on the candidate gate (its
    i-dense is bias-free), so torch checkpoints cannot be transplanted
    exactly onto it; this cell keeps both bias vectors like torch. Gate
    blocks are ordered (r | z | n) in the stacked kernels, matching the
    torch weight layout."""

    features: int

    @nn.compact
    def __call__(self, x):
        H = self.features
        C = x.shape[-1]
        wi = self.param("wi", nn.initializers.lecun_normal(), (C, 3 * H))
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 3 * H))
        bi = self.param("bi", nn.initializers.zeros, (3 * H,))
        bh = self.param("bh", nn.initializers.zeros, (3 * H,))

        def step(h, xt):
            gi = xt @ wi + bi
            gh = h @ wh + bh
            ir, iz, inn = jnp.split(gi, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(ir + hr)
            z = jax.nn.sigmoid(iz + hz)
            n = jnp.tanh(inn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((x.shape[0], H), x.dtype)
        _, ys = jax.lax.scan(step, h0, jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(ys, 0, 1)


class RawNet(nn.Module):
    d_args: dict = None
    # fft_frontend: run the fixed 1025-tap sinc bank as an FFT
    # correlation (sinc_conv_fft) instead of a time-domain conv — same
    # math; on the TPU backend the time-domain form compiles for minutes
    # and runs ~25 ms vs microseconds for the FFT pair. time_domain=True
    # restores the lax.conv form (exactness cross-checks).
    fft_frontend: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = dict(RAWNET2_DEFAULT_ARGS if self.d_args is None else self.d_args)
        filts = [list(f) if isinstance(f, (list, tuple)) else f for f in d["filts"]]

        if x.ndim == 2:
            x = x[..., None]  # (B, L, 1)

        bank = sinc_filterbank(filts[0], d["first_conv"])
        if self.fft_frontend:
            x = sinc_conv_fft(x, bank)
        else:
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(bank), window_strides=(1,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        # |.| then MaxPool1d(3)
        x = jnp.abs(x)
        T = x.shape[1] - x.shape[1] % 3
        x = x[:, :T].reshape(x.shape[0], T // 3, 3, x.shape[-1]).max(axis=2)
        x = batch_norm(train)(x)
        x = nn.selu(x)

        block_filts = [filts[1], filts[1], filts[2], [filts[2][1], filts[2][1]],
                       [filts[2][1], filts[2][1]], [filts[2][1], filts[2][1]]]
        for i, bf in enumerate(block_filts):
            x = ResidualBlock(bf[1], first=(i == 0))(x, train)
            x = FMSAttention(bf[1])(x)

        x = batch_norm(train)(x)
        x = nn.selu(x)

        # Multi-layer GRU, batch-first; keep only the last time step
        # (/root/reference/model.py:866-868).
        for _ in range(d["nb_gru_layer"]):
            x = GRULayer(features=d["gru_node"])(x)
        x = x[:, -1, :]
        x = nn.Dense(d["nb_fc_node"])(x)
        x = nn.Dense(d["nb_classes"])(x)
        return x, nn.log_softmax(x, axis=1)
