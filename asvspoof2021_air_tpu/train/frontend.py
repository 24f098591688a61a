"""On-device training front-end: augmentation + LFCC + padding policy fused
into the jitted train step.

This is the architectural replacement for the reference's offline
feature-cache hot loop (per-item torch.load at
/root/reference/main_train.py:311-321 + dataset.py:56-85): waveforms enter
the step as fixed (B, L_max) buffers with lengths, every utterance optionally
draws a fresh random channel (ops/augment.ChannelAugmenter), LFCC runs as
the fused Pallas kernel (or jnp fallback), and the reference's pad policies
are applied in feature space on device:

- 'repeat': frame t of a short utterance reads frame t mod T_valid
  (dataset.py:520-523 semantics)
- 'zero':   frames beyond T_valid are zeroed (dataset.py:514-518, trailing)
- 'silence': silence feature frames are PREPENDED and the valid frames
  shifted right, bit-matching the reference layout (dataset.py:525-528:
  silence_pad_value rows come first, then the utterance) via index
  arithmetic — output frame t reads valid frame t - (feat_len - T_valid),
  and the pad region is filled with the precomputed LFCC-of-silence vector.

Long utterances are random-cropped host-side when the batch buffer is
filled (WaveformIterator), matching the reference's per-epoch random crop.

Evaluation runs CLEAN (the reference validates/tests on unaugmented
features, /root/reference/main_train.py:489-668): use :meth:`eval_view`
to get an augmenter-free copy sharing the extractor for the eval step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from asvspoof2021_air_tpu.ops.augment import ChannelAugmenter
from asvspoof2021_air_tpu.ops.lfcc import LFCC, LFCCConfig


class OnDeviceFrontend:
    """fn(batch_dict, rng) -> (B, feat_len, D) features, jit-safe."""

    def __init__(
        self,
        feat_len: int = 750,
        padding: str = "repeat",
        config: LFCCConfig = LFCCConfig(),
        augmenter: Optional[ChannelAugmenter] = None,
        apply_ir: bool = False,
        use_pallas: bool = True,
        feature: str = "LFCC",
    ):
        self.feat_len = feat_len
        self.padding = padding
        self.augmenter = augmenter
        self.apply_ir = apply_ir
        self.extractor = None
        if feature == "CQCC":
            from asvspoof2021_air_tpu.ops.cqcc import CQCC, CQCCConfig

            self.extractor = CQCC(CQCCConfig())
            self.hop = self.extractor.config.hop_length
            self._silence_vec = None
            if padding == "silence":
                import numpy as np

                self._silence_vec = np.asarray(
                    jax.jit(self.extractor.__call__)(
                        jnp.zeros((1, 3200), jnp.float32)
                    )[0, 0]
                )
            return
        if feature != "LFCC":
            raise ValueError(f"on-the-fly front-end supports LFCC/CQCC, got {feature}")
        if use_pallas:
            try:
                from asvspoof2021_air_tpu.ops.lfcc_pallas import PallasLFCC

                if jax.devices()[0].platform in ("tpu", "axon"):
                    self.extractor = PallasLFCC(config)
            except Exception:
                self.extractor = None
        if self.extractor is None:
            self.extractor = LFCC(config)
        self.hop = config.hop_length
        self._silence_vec = None
        if padding == "silence":
            # LFCC of pure silence (first frame of 3200 zero samples,
            # /root/reference/dataset.py:13-16); numpy constant folded into
            # the HLO (not a closed-over device array — axon dispatch rule).
            self._silence_vec = LFCC(config).silence_frame()

    def min_samples(self) -> int:
        """Waveform buffer length that yields >= feat_len frames."""
        return (self.feat_len - 1) * self.hop

    @property
    def params(self):
        """Pytree of augmentation tables; pass through the jitted step as an
        argument (small closed-over constants trigger the axon backend's
        slow-dispatch path)."""
        return None if self.augmenter is None else self.augmenter.tables

    def __call__(self, batch, rng, params=None) -> jnp.ndarray:
        wave = batch["wave"]
        lengths = batch.get("length")
        if lengths is None:
            lengths = jnp.full((wave.shape[0],), wave.shape[1], jnp.int32)

        if self.augmenter is not None:
            wave, _fam, _ir = self.augmenter(wave, rng, apply_ir=self.apply_ir,
                                             tables=params)

        feats = self.extractor(wave, lengths)  # (B, T_max, D)
        B, T_max, D = feats.shape
        t_valid = jnp.maximum(1 + lengths // self.hop, 1)  # (B,)

        if T_max < self.feat_len:
            feats = jnp.pad(feats, ((0, 0), (0, self.feat_len - T_max), (0, 0)))
            T_max = self.feat_len
        t = jnp.arange(self.feat_len, dtype=jnp.int32)

        if self.padding == "repeat":
            idx = t[None, :] % t_valid[:, None]           # (B, feat_len)
            gather = jax.vmap(lambda f, i: f[i])
            out = gather(feats, idx)
        elif self.padding == "zero":
            out = feats[:, : self.feat_len, :]
            mask = (t[None, :] < t_valid[:, None]).astype(out.dtype)
            out = out * mask[..., None]
        elif self.padding == "silence":
            # Prepend layout: output frame t is silence for t < pad and
            # valid frame t - pad after, pad = feat_len - T_valid
            # (/root/reference/dataset.py:525-528).
            t_eff = jnp.minimum(t_valid, self.feat_len)
            pad = self.feat_len - t_eff                        # (B,) >= 0
            src = jnp.clip(t[None, :] - pad[:, None], 0, T_max - 1)
            gather = jax.vmap(lambda f, i: f[i])
            out = gather(feats, src)
            sil = jnp.asarray(self._silence_vec, out.dtype)
            is_pad = (t[None, :] < pad[:, None])[..., None]
            out = jnp.where(is_pad, sil[None, None, :], out)
        else:
            raise ValueError("padding should be zero, repeat, or silence")
        return out

    def eval_view(self) -> "OnDeviceFrontend":
        """Augmenter-free copy sharing the extractor and constants, for the
        eval/scoring steps (reference evaluates on clean features,
        /root/reference/main_train.py:489-668)."""
        import copy

        view = copy.copy(self)
        view.augmenter = None
        view.apply_ir = False
        return view


class WaveformFrontend:
    """Pass-through front-end for raw-waveform models (RawNet2): optional
    on-device channel augmentation, then repeat-tiling of short utterances to
    a fixed sample count (the ASVspoof RawNet2 baseline's waveform layout;
    the reference ships the model but never wires it into training —
    /root/reference/model.py:642-893, SURVEY C20)."""

    def __init__(
        self,
        n_samples: int = 64600,
        augmenter: Optional[ChannelAugmenter] = None,
        apply_ir: bool = False,
    ):
        self.n_samples = n_samples
        self.augmenter = augmenter
        self.apply_ir = apply_ir

    def min_samples(self) -> int:
        return self.n_samples

    @property
    def params(self):
        return None if self.augmenter is None else self.augmenter.tables

    def __call__(self, batch, rng, params=None) -> jnp.ndarray:
        wave = batch["wave"]
        lengths = batch.get("length")
        if lengths is None:
            lengths = jnp.full((wave.shape[0],), wave.shape[1], jnp.int32)
        if self.augmenter is not None:
            wave, _f, _i = self.augmenter(wave, rng, apply_ir=self.apply_ir,
                                          tables=params)
        # repeat-tile short utterances: sample t reads t mod length
        t = jnp.arange(self.n_samples, dtype=jnp.int32)
        idx = t[None, :] % jnp.maximum(lengths[:, None], 1)
        return jax.vmap(lambda w, i: w[i])(wave, idx)

    def eval_view(self) -> "WaveformFrontend":
        import copy

        view = copy.copy(self)
        view.augmenter = None
        view.apply_ir = False
        return view
