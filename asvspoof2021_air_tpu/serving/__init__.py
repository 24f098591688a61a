from asvspoof2021_air_tpu.serving.ecapa_fused import ecapa_apply_fused

__all__ = ["ecapa_apply_fused"]
