"""Port reference PyTorch checkpoints to flax parameter pytrees.

The reference saves whole pickled torch modules
(/root/reference/main_train.py:674-706). These functions map a torch
``state_dict`` (names -> numpy arrays) onto this framework's flax variable
trees so existing reference checkpoints keep working after switching
frameworks — and they double as the strongest data-free architecture-parity
check: transplanted weights must produce identical (embedding, logits).

Layout conventions translated here:
- torch Conv1d weight (O, I, K)    -> flax Conv kernel (K, I, O)
- torch Conv2d weight (O, I, H, W) -> flax Conv kernel (H, W, I, O)
- torch Linear weight (O, I)       -> flax Dense kernel (I, O)
- torch BatchNorm weight/bias/running_mean/running_var
                                   -> flax params scale/bias + batch_stats
- torch NCHW flatten (C-major)     -> flax NHWC flatten (C-minor): dense
  kernels following a flatten are permuted accordingly.

Model structure references: ECAPA /root/reference/ecapa_tdnn.py:97-198,
ResNet /root/reference/model.py:184-253, LCNN /root/reference/model.py:555-610.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    if name not in sd:
        raise KeyError(
            f"'{name}' missing from state_dict (have e.g. "
            f"{sorted(sd)[:5]}...)"
        )
    return np.asarray(sd[name], dtype=np.float32)


def _conv1d(sd, p):
    w = _np(sd, p + ".weight")
    out = {"kernel": w.transpose(2, 1, 0)}
    if p + ".bias" in sd:
        out["bias"] = _np(sd, p + ".bias")
    return out


def _conv2d(sd, p):
    w = _np(sd, p + ".weight")
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if p + ".bias" in sd:
        out["bias"] = _np(sd, p + ".bias")
    return out


def _dense(sd, p):
    out = {"kernel": _np(sd, p + ".weight").T}
    if p + ".bias" in sd:
        out["bias"] = _np(sd, p + ".bias")
    return out


def _dense_from_conv1d(sd, p):
    """Conv1d with kernel_size=1 used pointwise == Dense."""
    w = _np(sd, p + ".weight")[:, :, 0]
    out = {"kernel": w.T}
    if p + ".bias" in sd:
        out["bias"] = _np(sd, p + ".bias")
    return out


def _bn(sd, p):
    params = {}
    if p + ".weight" in sd:
        params = {"scale": _np(sd, p + ".weight"), "bias": _np(sd, p + ".bias")}
    stats = {"mean": _np(sd, p + ".running_mean"),
             "var": _np(sd, p + ".running_var")}
    return params, stats


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint (whole pickled module or state_dict) into
    a plain name->numpy mapping. Requires torch."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def port_ecapa(sd: Dict[str, np.ndarray], model_scale: int = 8) -> Dict:
    """state_dict of /root/reference/ecapa_tdnn.py Res2Net2 -> variables for
    models.ecapa.ECAPA_TDNN (params + batch_stats)."""
    params: Dict = {}
    stats: Dict = {}

    params["Conv_0"] = _conv1d(sd, "conv1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "bn1")

    for li in range(3):
        t = f"layer{li + 1}"
        f = f"Bottle2neck_{li}"
        bp: Dict = {}
        bs: Dict = {}
        bp["Conv_0"] = _conv1d(sd, t + ".conv1")
        bp["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, t + ".bn1")
        for j in range(model_scale - 1):
            bp[f"Conv_{j + 1}"] = _conv1d(sd, f"{t}.convs.{j}")
            bp[f"BatchNorm_{j + 1}"], bs[f"BatchNorm_{j + 1}"] = _bn(
                sd, f"{t}.bns.{j}"
            )
        bp[f"Conv_{model_scale}"] = _conv1d(sd, t + ".conv3")
        bp[f"BatchNorm_{model_scale}"], bs[f"BatchNorm_{model_scale}"] = _bn(
            sd, t + ".bn3"
        )
        # SEModule Sequential: 1=Conv1d(C->128), 3=BN(128), 4=Conv1d(128->C)
        se_p: Dict = {"Dense_0": _dense_from_conv1d(sd, t + ".se.se.1"),
                      "Dense_1": _dense_from_conv1d(sd, t + ".se.se.4")}
        se_bn_p, se_bn_s = _bn(sd, t + ".se.se.3")
        se_p["BatchNorm_0"] = se_bn_p
        bp["SEModule1D_0"] = se_p
        bs["SEModule1D_0"] = {"BatchNorm_0": se_bn_s}
        params[f] = bp
        stats[f] = bs

    params["mfa_kernel"] = _np(sd, "layer4.weight")[:, :, 0].T
    params["mfa_bias"] = _np(sd, "layer4.bias")
    params["attn_kernel"] = _np(sd, "attention.0.weight")[:, :, 0].T
    params["attn_bias"] = _np(sd, "attention.0.bias")
    params["BatchNorm_1"], stats["BatchNorm_1"] = _bn(sd, "attention.2")
    params["Conv_1"] = _conv1d(sd, "attention.3")
    params["BatchNorm_2"], stats["BatchNorm_2"] = _bn(sd, "bn5")
    params["Dense_0"] = _dense(sd, "fc6")
    params["Dense_1"] = _dense(sd, "fc7")
    params["BatchNorm_3"], stats["BatchNorm_3"] = _bn(sd, "bn7")
    return {"params": params, "batch_stats": stats}


def port_resnet(sd: Dict[str, np.ndarray], resnet_type: str = "18") -> Dict:
    """state_dict of /root/reference/model.py ResNet -> variables for
    models.resnet.ResNet. Supports the PreActBlock configs (18/28/34)."""
    layers = {"18": [2, 2, 2, 2], "28": [3, 4, 6, 3], "34": [3, 4, 6, 3]}[
        resnet_type
    ]
    params: Dict = {}
    stats: Dict = {}
    params["Conv_0"] = _conv2d(sd, "conv1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "bn1")

    flax_i = 0
    for si, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            t = f"layer{si + 1}.{b}"
            f = f"PreActBlock_{flax_i}"
            flax_i += 1
            bp: Dict = {}
            bs: Dict = {}
            bp["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, t + ".bn1")
            bp["BatchNorm_1"], bs["BatchNorm_1"] = _bn(sd, t + ".bn2")
            if t + ".shortcut.0.weight" in sd:
                # projection shortcut created first in the flax block
                bp["Conv_0"] = _conv2d(sd, t + ".shortcut.0")
                bp["Conv_1"] = _conv2d(sd, t + ".conv1")
                bp["Conv_2"] = _conv2d(sd, t + ".conv2")
            else:
                bp["Conv_0"] = _conv2d(sd, t + ".conv1")
                bp["Conv_1"] = _conv2d(sd, t + ".conv2")
            params[f] = bp
            stats[f] = bs

    params["Conv_1"] = _conv2d(sd, "conv5")
    params["BatchNorm_1"], stats["BatchNorm_1"] = _bn(sd, "bn5")
    params["SelfAttentionPooling_0"] = {
        "att_weights": _np(sd, "attention.att_weights").T
    }
    params["Dense_0"] = _dense(sd, "fc")
    params["Dense_1"] = _dense(sd, "fc_mu")
    return {"params": params, "batch_stats": stats}


def port_se_res2net50(sd: Dict[str, np.ndarray],
                      layers=(3, 4, 6, 3), scale: int = 4) -> Dict:
    """state_dict of /root/reference/model.py Res2Net (se_res2net50_v1b,
    :256-509) -> variables for models.res2net.SERes2Net50."""
    params: Dict = {}
    stats: Dict = {}
    # stem: conv1 Sequential indices 0/3/6 are convs, 1/4 BNs; bn1 outside
    stem_convs = ["conv1.0", "conv1.3", "conv1.6"]
    stem_bns = ["conv1.1", "conv1.4", "bn1"]
    for i, src in enumerate(stem_convs):
        params[f"Conv_{i}"] = _conv2d(sd, src)
    for i, src in enumerate(stem_bns):
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = _bn(sd, src)

    nums = 1 if scale == 1 else scale - 1
    flax_i = 0
    for si, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            t = f"layer{si + 1}.{b}"
            f = f"SEBottle2neck_{flax_i}"
            flax_i += 1
            bp: Dict = {}
            bs: Dict = {}
            bp["Conv_0"] = _conv2d(sd, t + ".conv1")
            bp["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, t + ".bn1")
            for j in range(nums):
                bp[f"Conv_{j + 1}"] = _conv2d(sd, f"{t}.convs.{j}")
                bp[f"BatchNorm_{j + 1}"], bs[f"BatchNorm_{j + 1}"] = _bn(
                    sd, f"{t}.bns.{j}"
                )
            bp[f"Conv_{nums + 1}"] = _conv2d(sd, t + ".conv3")
            bp[f"BatchNorm_{nums + 1}"], bs[f"BatchNorm_{nums + 1}"] = _bn(
                sd, t + ".bn3"
            )
            bp["SELayer2D_0"] = {"Dense_0": _dense(sd, t + ".se.fc.0"),
                                 "Dense_1": _dense(sd, t + ".se.fc.2")}
            if t + ".downsample.1.weight" in sd:
                bp[f"Conv_{nums + 2}"] = _conv2d(sd, t + ".downsample.1")
                (bp[f"BatchNorm_{nums + 2}"],
                 bs[f"BatchNorm_{nums + 2}"]) = _bn(sd, t + ".downsample.2")
            params[f] = bp
            stats[f] = bs

    params["Dense_0"] = _dense(sd, "cls_layer")
    return {"params": params, "batch_stats": stats}


def port_channel_classifier(sd: Dict[str, np.ndarray]) -> Dict:
    """state_dict of /root/reference/model.py ChannelClassifier (:1006-1023)
    -> variables for models.classifier.ChannelClassifier."""
    return {"params": {"Dense_0": _dense(sd, "classifier.0"),
                       "Dense_1": _dense(sd, "classifier.3")}}


def port_lcnn(sd: Dict[str, np.ndarray], num_nodes: int = 60,
              feat_len: int = 750) -> Dict:
    """state_dict of /root/reference/model.py LCNN -> variables for
    models.lcnn.LCNN. The flatten-facing dense kernel is permuted from the
    torch C-major layout to the flax NHWC C-minor layout."""
    params: Dict = {}
    stats: Dict = {}
    bn_sources = ["conv2.2", "conv3.3", "conv4.2", "conv6.2", "conv7.2",
                  "conv8.2"]
    for i in range(9):
        params[f"Conv_{i}"] = _conv2d(sd, f"conv{i + 1}.0")
    for i, src in enumerate(bn_sources):
        _p, s = _bn(sd, src)
        stats[f"BatchNorm_{i}"] = s

    H, W = num_nodes // 16, feat_len // 16
    w = _np(sd, "out.1.weight")            # (160, 32*H*W), C-major
    w = w.reshape(160, 32, H, W).transpose(2, 3, 1, 0).reshape(H * W * 32, 160)
    params["Dense_0"] = {"kernel": w, "bias": _np(sd, "out.1.bias")}
    params["Dense_1"] = _dense(sd, "out.3")
    params["Dense_2"] = _dense(sd, "fc_mu")
    return {"params": params, "batch_stats": stats}


def port_rawnet(sd: Dict[str, np.ndarray]) -> Dict:
    """state_dict of /root/reference/model.py RawNet (:765-893) -> variables
    for models.rawnet.RawNet.

    The sinc front-end is parameter-free on both sides (identical fixed
    mel-spaced bank). The GRU transplants exactly because GRULayer keeps
    torch's gate math incl. both bias vectors; torch stacks the gate blocks
    as rows (r|z|n) of weight_ih/weight_hh, transposed here into the
    (in, 3H) column layout."""
    params: Dict = {}
    stats: Dict = {}

    p, s = _bn(sd, "first_bn")
    params["BatchNorm_0"] = p
    stats["BatchNorm_0"] = s

    for i in range(6):
        tb = f"block{i}.0"
        bp: Dict = {}
        bs: Dict = {}
        if i == 0:  # first block: no bn1 (/root/reference/model.py:713-716)
            bp["Conv_0"] = _conv1d(sd, tb + ".conv1")
            p2, s2 = _bn(sd, tb + ".bn2")
            bp["BatchNorm_0"] = p2
            bs["BatchNorm_0"] = s2
            bp["Conv_1"] = _conv1d(sd, tb + ".conv2")
        else:
            p1, s1 = _bn(sd, tb + ".bn1")
            bp["BatchNorm_0"] = p1
            bs["BatchNorm_0"] = s1
            bp["Conv_0"] = _conv1d(sd, tb + ".conv1")
            p2, s2 = _bn(sd, tb + ".bn2")
            bp["BatchNorm_1"] = p2
            bs["BatchNorm_1"] = s2
            bp["Conv_1"] = _conv1d(sd, tb + ".conv2")
            if tb + ".conv_downsample.weight" in sd:
                bp["Conv_2"] = _conv1d(sd, tb + ".conv_downsample")
        params[f"ResidualBlock_{i}"] = bp
        stats[f"ResidualBlock_{i}"] = bs
        params[f"FMSAttention_{i}"] = {
            "Dense_0": _dense(sd, f"fc_attention{i}.0")
        }

    p, s = _bn(sd, "bn_before_gru")
    params["BatchNorm_1"] = p
    stats["BatchNorm_1"] = s

    k = 0
    while f"gru.weight_ih_l{k}" in sd:
        params[f"GRULayer_{k}"] = {
            "wi": _np(sd, f"gru.weight_ih_l{k}").T,
            "wh": _np(sd, f"gru.weight_hh_l{k}").T,
            "bi": _np(sd, f"gru.bias_ih_l{k}"),
            "bh": _np(sd, f"gru.bias_hh_l{k}"),
        }
        k += 1

    params["Dense_0"] = _dense(sd, "fc1_gru")
    params["Dense_1"] = _dense(sd, "fc2_gru")
    return {"params": params, "batch_stats": stats}


def port_convnet(sd: Dict[str, np.ndarray], subband_attention: bool = False,
                 flatten_hw=None) -> Dict:
    """state_dict of /root/reference/model.py ConvNet (:54-121) -> variables
    for models.convnet.ConvNet.

    Non-attention mode flattens the NCHW activations C-major into fc1;
    ``flatten_hw`` = (H, W) after layer4 permutes that kernel into the flax
    NHWC C-minor flatten order."""
    params: Dict = {}
    stats: Dict = {}
    n_layers = 5 if subband_attention else 4
    for i in range(n_layers):
        params[f"Conv_{i}"] = _conv2d(sd, f"layer{i + 1}.0")
        p, s = _bn(sd, f"layer{i + 1}.1")
        params[f"BatchNorm_{i}"] = p
        stats[f"BatchNorm_{i}"] = s
    if subband_attention:
        params["SelfAttentionPooling_0"] = {
            "att_weights": _np(sd, "attention.att_weights").T
        }
        params["Dense_0"] = _dense(sd, "fc2")
        params["Dense_1"] = _dense(sd, "fc3")
    else:
        H, W = flatten_hw
        w = _np(sd, "fc1.weight")            # (256, 64*H*W), C-major
        w = w.reshape(256, 64, H, W).transpose(2, 3, 1, 0).reshape(
            H * W * 64, 256
        )
        params["Dense_0"] = {"kernel": w, "bias": _np(sd, "fc1.bias")}
        params["Dense_1"] = _dense(sd, "fc2")
        params["Dense_2"] = _dense(sd, "fc3")
    return {"params": params, "batch_stats": stats}


def port_subband(sd: Dict[str, np.ndarray], band_nodes: int,
                 feat_len: int = 750, subband_num: int = 4) -> Dict:
    """state_dict of /root/reference/model.py Subband (:612-639) -> variables
    for models.subband.Subband: each per-band LCNN ports via port_lcnn.
    ``band_nodes`` is the per-band frequency width (the reference only runs
    when its num_nodes argument equals that width)."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(subband_num):
        prefix = f"sub{i + 1}."
        sub_sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
        v = port_lcnn(sub_sd, num_nodes=band_nodes, feat_len=feat_len)
        params[f"LCNN_{i}"] = v["params"]
        stats[f"LCNN_{i}"] = v["batch_stats"]
    return {"params": params, "batch_stats": stats}
