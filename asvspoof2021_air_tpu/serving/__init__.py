from asvspoof2021_air_tpu.serving.ecapa_fused import ecapa_apply_fused
from asvspoof2021_air_tpu.serving.ecapa_int8 import ecapa_apply_int8
from asvspoof2021_air_tpu.serving.stream import make_scanned_infer

__all__ = ["ecapa_apply_fused", "ecapa_apply_int8", "make_scanned_infer"]
