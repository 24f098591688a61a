"""Fused Pallas LFCC front-end kernel.

One kernel fuses the whole per-frame chain of the LFCC recipe
(/root/reference/feature_extraction.py:93-138 semantics): frame extraction ->
windowed DFT (as two MXU matmuls, window + centering phase folded into the
matrices) -> power -> linear filterbank -> log10 -> ortho DCT-II. The frame
stream never round-trips HBM and no overlapped copy of the waveform is ever
materialized:

- the padded signal is viewed as hop-sample rows (free reshape);
- frame i spans rows i and i+1 (win == 2*hop in the canonical config), so
  instead of building the (tile, win) frame matrix, the DFT matrices are
  split at the hop boundary: frames @ M == rows[:t] @ M_top + rows[1:] @ M_bot;
- the one-row overlap between consecutive tiles is resolved by passing the
  SAME rows array through a second BlockSpec whose index map points at the
  next tile, and patching the rolled last row with a where().

Deltas are appended outside the kernel (cheap elementwise work XLA fuses
into consumers); pre-emphasis and length masking also run outside (O(L) VPU
work).

HBM traffic per utterance: read L samples (+ one extra tile row) + write
T * n_filters floats — the (T, 257) power/filterbank intermediates of the
unfused chain never exist.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asvspoof2021_air_tpu.ops import dsp
from asvspoof2021_air_tpu.ops.lfcc import LFCCConfig

_INV_LN10 = np.float32(1.0 / np.log(10.0))


def _lfcc_kernel(rows_ref, next_ref, cs_ref, fb_ref, dct_ref, out_ref,
                 *, tile_t, hop, n_eff, split_bf16):
    FB, DCT = fb_ref[...], dct_ref[...]
    s1 = rows_ref[0]           # (tile_t, hop): rows t*tile_t .. +tile_t
    boundary = next_ref[0, :1, :]  # first row of the NEXT tile

    # s2 = rows shifted by one: roll wraps row 0 into the last slot; patch
    # that slot with the next tile's first row.
    rolled = pltpu.roll(s1, shift=tile_t - 1, axis=0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_t, hop), 0)
    s2 = jnp.where(row_ids == tile_t - 1, boundary, rolled)

    # One (tile_t, 2*n_eff) matmul pair computes re‖im together: CS is
    # [cos | sin] side by side, Nyquist bin dropped when its filterbank
    # weight is exactly zero, so 2*n_eff = 512 for the canonical config —
    # an exact 4x128-lane MXU tiling (vs 257 padding to 384).
    if split_bf16:
        # Split-precision DFT: x ≈ hi + lo with both halves bf16 (the pair
        # carries ~16 mantissa bits — the waveform's entire int16 grid), and
        # the hi·hi + hi·lo + lo·hi products recover ~f32 accuracy (error
        # ~2^-16 relative; the dropped lo·lo term is ~2^-32) with every dot
        # eligible for the MXU's native bf16 rate. Measured on v5e
        # (2026-08-18, chained timing): NO faster than the f32 dots
        # (1.46 vs 1.47 ms/batch) — this kernel is not f32-MXU-rate-bound
        # (neither pure-bf16 dots nor tile-size changes move it), so f32
        # stays the default and this mode is kept as the measured
        # experiment (docs/PERFORMANCE.md "Front-end dtype experiment").
        CS = cs_ref[...]       # (2, win, 2*n_eff) bf16: [0]=hi, [1]=lo
        def dft(s, lo_row, hi_row):
            hi = s.astype(jnp.bfloat16)
            lo = (s - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            mh, ml = CS[0, lo_row:hi_row], CS[1, lo_row:hi_row]
            return (
                jnp.dot(hi, mh, preferred_element_type=jnp.float32)
                + jnp.dot(hi, ml, preferred_element_type=jnp.float32)
                + jnp.dot(lo, mh, preferred_element_type=jnp.float32)
            )
        z = dft(s1, 0, hop) + dft(s2, hop, 2 * hop)
    else:
        CS = cs_ref[...]       # (win, 2*n_eff) f32
        z = (
            jnp.dot(s1, CS[:hop], preferred_element_type=jnp.float32)
            + jnp.dot(s2, CS[hop:], preferred_element_type=jnp.float32)
        )
    re = z[:, :n_eff]
    im = z[:, n_eff:]
    power = re * re + im * im
    fb = jnp.log(
        jnp.dot(power, FB, preferred_element_type=jnp.float32) + dsp.FLOAT32_EPS
    ) * _INV_LN10
    out_ref[0, :, :] = jnp.dot(fb, DCT, preferred_element_type=jnp.float32)


def _lfcc_lane128_kernel(x_ref, m_ref, fb_ref, dct_ref, out_ref,
                         *, n_phase, n_o, rows_per_group, t_p, bs,
                         split_bf16):
    """128-lane-native DFT: frames of phase p are assembled from
    lane-aligned 128-sample rows, one K=128 MXU dot per (phase, row
    offset) — 16 dots for the canonical config, every one an exact
    (T/4, 128) @ (128, 512) tiling."""
    M, FB, DCT = m_ref[...], fb_ref[...], dct_ref[...]
    for p in range(n_phase):
        acc = None
        for o in range(n_o):
            j = bs[p] + o
            gs, jj = divmod(j, rows_per_group)
            xo = x_ref[0, gs:gs + t_p, jj, :]          # (t_p, 128)
            if split_bf16:
                hi = xo.astype(jnp.bfloat16)
                lo = (xo - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                term = (
                    jnp.dot(hi, M[0, p, o],
                            preferred_element_type=jnp.float32)
                    + jnp.dot(hi, M[1, p, o],
                              preferred_element_type=jnp.float32)
                    + jnp.dot(lo, M[0, p, o],
                              preferred_element_type=jnp.float32)
                )
            else:
                term = jnp.dot(xo, M[p, o],
                               preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        n_eff = acc.shape[-1] // 2
        re, im = acc[:, :n_eff], acc[:, n_eff:]
        power = re * re + im * im
        fb = jnp.log(
            jnp.dot(power, FB, preferred_element_type=jnp.float32)
            + dsp.FLOAT32_EPS
        ) * _INV_LN10
        out_ref[0, p] = jnp.dot(fb, DCT, preferred_element_type=jnp.float32)


class PallasLFCC:
    """Drop-in fused variant of :class:`~asvspoof2021_air_tpu.ops.lfcc.LFCC`.

    Requires win_length == 2 * hop_length (true for the canonical
    LFCC(320,160,512,16k,20)) and with_energy=False (energy needs the raw
    power spectrum; use the jnp LFCC for that path).

    Two kernel layouts:
    - ``lane128`` (default when the hop admits it): the waveform is
      viewed as lane-aligned 128-sample rows; frames recur in
      ``n_phase = lcm(hop,128)/hop`` phase classes, and each phase's DFT
      is ``n_o`` K=128-native MXU dots with the window embedded at the
      phase's sample offset. Measured 4.4x faster than the hop-rows
      kernel on v5e (0.27 vs 1.20 ms/batch device at B=64 T=750) — the
      hop-rows layout's 160-sample rows fight the 128-lane register
      file at every load and dot.
    - ``hoprows``: the original formulation (rows of ``hop`` samples,
      frame = two adjacent rows, one matmul pair per tile); kept as the
      fallback for hops with large phase periods and as the A/B
      reference.
    """

    TILE_T = 256
    LANE = 128

    def __init__(self, config: LFCCConfig = LFCCConfig(),
                 interpret: bool = False, dft_dot: str = "f32",
                 layout: str = "auto"):
        if config.win_length != 2 * config.hop_length:
            raise ValueError("PallasLFCC requires win_length == 2*hop_length")
        if config.with_energy:
            raise ValueError("with_energy unsupported in the fused kernel; "
                             "use the jnp LFCC")
        if dft_dot not in ("split_bf16", "f32"):
            raise ValueError("dft_dot must be 'split_bf16' or 'f32'")
        if layout not in ("auto", "lane128", "hoprows"):
            raise ValueError("layout must be 'auto', 'lane128' or 'hoprows'")
        self.config = config
        self.interpret = interpret
        self.dft_dot = dft_dot
        C, S = dsp.windowed_dft_matrices(config.win_length, config.n_fft)
        fb = dsp.linear_filterbank(config.n_fft, config.sample_rate,
                                   config.n_filters)
        dct = dsp.dct_matrix(config.n_filters, "dct", norm="ortho")
        # The top triangular filter's right edge sits ON Nyquist, so the
        # last bin's weight is exactly zero for the canonical filterbank:
        # drop it (numerically identical) so the fused cos‖sin matmul
        # width is 2*256 = 512 — an exact MXU lane tiling.
        n_bins = config.n_fft // 2 + 1
        if np.all(fb[-1] == 0.0):
            self._n_eff = n_bins - 1
        else:
            self._n_eff = n_bins
        cs = np.concatenate([C[:, :self._n_eff], S[:, :self._n_eff]], axis=1)
        if dft_dot == "split_bf16":
            hi = cs.astype(np.float32).astype(jnp.bfloat16)
            lo = (cs - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
            self._CS = jnp.stack([jnp.asarray(hi), jnp.asarray(lo)])
        else:
            self._CS = jnp.asarray(cs)
        self._FB = jnp.asarray(fb[:self._n_eff])
        self._DCT = jnp.asarray(dct)

        # lane128 layout constants (see class docstring).
        hop, win, lane = config.hop_length, config.win_length, self.LANE
        lcm = int(np.lcm(hop, lane))
        n_phase, rows_per_group = lcm // hop, lcm // lane
        b_p = [(hop * p) // lane for p in range(n_phase)]
        o_p = [(hop * p) % lane for p in range(n_phase)]
        n_o = -(-(win + max(o_p)) // lane)
        feasible = n_phase <= 8 and n_o <= 8 and rows_per_group <= 16
        if layout == "lane128" and not feasible:
            raise ValueError(
                f"lane128 infeasible for hop={hop} (period {n_phase}x"
                f"{rows_per_group})")
        self._lane128 = feasible and layout in ("auto", "lane128")
        if self._lane128:
            m = np.zeros((n_phase, n_o, lane, cs.shape[1]), np.float32)
            for p in range(n_phase):
                for o in range(n_o):
                    for j in range(lane):
                        src = j + lane * o - o_p[p]
                        if 0 <= src < win:
                            m[p, o, j] = cs[src]
            self._n_phase, self._n_o = n_phase, n_o
            self._rows_per_group, self._b_p = rows_per_group, b_p
            if dft_dot == "split_bf16":
                mhi = m.astype(jnp.bfloat16)
                mlo = (m - np.asarray(mhi, np.float32)).astype(jnp.bfloat16)
                self._M = jnp.stack([jnp.asarray(mhi), jnp.asarray(mlo)])
            else:
                self._M = jnp.asarray(m)

    def __call__(self, waveforms: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        hop, win = cfg.hop_length, cfg.win_length
        B, L = waveforms.shape
        T = dsp.num_frames(L, hop)

        x = waveforms.astype(jnp.float32)
        if cfg.with_emphasis:
            x = dsp.preemphasis(x, cfg.preemph_coef)
            if lengths is not None:
                mask = (
                    jnp.arange(L, dtype=jnp.int32)[None, :]
                    < lengths.astype(jnp.int32)[:, None]
                )
                x = jnp.where(mask, x, 0.0)

        if self._lane128:
            lfcc = self._call_lane128(x, B, L, T)
        else:
            lfcc = self._call_hoprows(x, B, L, T)

        if cfg.with_delta:
            flen = None if lengths is None else (1 + lengths // hop)
            d1 = dsp.delta(lfcc, flen)
            d2 = dsp.delta(d1, flen)
            lfcc = jnp.concatenate([lfcc, d1, d2], axis=-1)
        return lfcc

    def _call_lane128(self, x, B, L, T):
        """Lane-aligned layout: pad so frame t starts at padded sample
        t*hop (same centered-STFT shift as the hoprows path), view the
        signal as (groups, rows_per_group, 128) lane rows, emit
        phase-major frames, and restore time order with one cheap XLA
        transpose of the tiny (B, P, T/P, n_filters) output."""
        cfg = self.config
        lane, hop = self.LANE, cfg.hop_length
        P, R = self._n_phase, self._rows_per_group
        t_p = -(-T // P)                      # frames per phase
        max_gs = (max(self._b_p) + self._n_o - 1) // R
        n_groups = t_p + max_gs + 1           # +1: last frame's tail rows
        lpad = hop
        total = n_groups * R * lane
        xp = jnp.pad(x, ((0, 0), (lpad, max(total - L - lpad, 0))))
        rows = xp[:, :total].reshape(B, n_groups, R, lane)

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        split = self.dft_dot == "split_bf16"
        out = pl.pallas_call(
            functools.partial(_lfcc_lane128_kernel, n_phase=P, n_o=self._n_o,
                              rows_per_group=R, t_p=t_p, bs=tuple(self._b_p),
                              split_bf16=split),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n_groups, R, lane), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                const_spec(self._M.shape),
                const_spec((self._n_eff, cfg.n_filters)),
                const_spec((cfg.n_filters, cfg.n_filters)),
            ],
            out_specs=pl.BlockSpec((1, P, t_p, cfg.n_filters),
                                   lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, P, t_p, cfg.n_filters),
                                           jnp.float32),
            interpret=self.interpret,
        )(rows, self._M, self._FB, self._DCT)
        # phase-major (B, P, T/P, F) -> time order t = P*k + p
        lfcc = jnp.transpose(out, (0, 2, 1, 3)).reshape(
            B, P * t_p, cfg.n_filters)
        return lfcc[:, :T, :]

    def _call_hoprows(self, x, B, L, T):
        cfg = self.config
        hop, win = cfg.hop_length, cfg.win_length
        tile_t = min(self.TILE_T, T)
        n_tiles = -(-T // tile_t)
        t_padded = n_tiles * tile_t
        # Frame t starts at t*hop - hop in signal coordinates (centered
        # STFT, window centered in the n_fft frame; see dsp.frame_signal).
        # Shift by +hop via left padding; pad the right with one EXTRA tile
        # so the next-tile BlockSpec stays in bounds at the last tile.
        lpad = hop
        total = (n_tiles + 1) * tile_t * hop
        rpad = total - L - lpad
        xp = jnp.pad(x, ((0, 0), (lpad, max(rpad, 0))))
        rows = xp[:, :total].reshape(B, (n_tiles + 1) * tile_t, hop)

        n_eff = self._n_eff

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        split = self.dft_dot == "split_bf16"
        cs_shape = (2, win, 2 * n_eff) if split else (win, 2 * n_eff)
        out = pl.pallas_call(
            functools.partial(_lfcc_kernel, tile_t=tile_t, hop=hop,
                              n_eff=n_eff, split_bf16=split),
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, tile_t, hop), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_t, hop), lambda b, t: (b, t + 1, 0),
                             memory_space=pltpu.VMEM),
                const_spec(cs_shape),
                const_spec((n_eff, cfg.n_filters)),
                const_spec((cfg.n_filters, cfg.n_filters)),
            ],
            out_specs=pl.BlockSpec((1, tile_t, cfg.n_filters),
                                   lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, t_padded, cfg.n_filters),
                                           jnp.float32),
            interpret=self.interpret,
        )(rows, rows, self._CS, self._FB, self._DCT)
        return out[:, :T, :]

    def frame_lengths(self, lengths: jnp.ndarray) -> jnp.ndarray:
        return 1 + lengths // self.config.hop_length
