"""Interoperability with the PyTorch reference implementation."""

from asvspoof2021_air_tpu.interop.torch_port import (  # noqa: F401
    load_torch_checkpoint,
    port_channel_classifier,
    port_convnet,
    port_ecapa,
    port_lcnn,
    port_rawnet,
    port_resnet,
    port_se_res2net50,
    port_subband,
)
