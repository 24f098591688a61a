"""Utilities: seeding, flags, logging."""

from asvspoof2021_air_tpu.utils.seed import setup_seed, str2bool

__all__ = ["setup_seed", "str2bool"]
