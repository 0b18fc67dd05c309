"""Reference-checkpoint translation: torch .pth state_dicts -> flax params.

The reference's weight layouts were preserved by design (SparseConv3d
(K, Ci, Co) — nn/modules/conv.py:36-38; Linear transposed vs torch;
BatchNorm1d / LayerNorm scale+bias), so translation is a name remap plus
the torch Linear/Conv transpose. Handles 'module.' prefixes
(checkpoint.py:166-233 tolerance).

Segmentation model name maps cover ELKUNet / ELKEncoder / MinkUNet.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def _seq_conv_bn(prefix_t: str, prefix_f: str, idx_conv: int = 0,
                 idx_bn: int = 1) -> Dict[str, Tuple[str, str]]:
    """torch Sequential(conv, bn, relu) -> our (conv kernel, bn params)."""
    m = {
        f"{prefix_t}.{idx_conv}.kernel": (f"{prefix_f}", "kernel"),
        f"{prefix_t}.{idx_bn}.weight": (f"{prefix_f}_bn", "scale"),
        f"{prefix_t}.{idx_bn}.bias": (f"{prefix_f}_bn", "bias"),
    }
    return m


def translate_elkunet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the reference ELKUNet state_dict (linkunet.py:188-385) onto our
    flax ELKUNet param/batch_stats trees. Returns {'params': ..,
    'batch_stats': ..} nested dicts."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _, linear = _translate_seg_encoder(sd, params, stats)

    for lvl in range(1, 5):
        params[f"up{lvl}_deconv"], stats[f"up{lvl}_deconv"] = \
            _conv_bn_block_sd(sd, f"up{lvl}.0")
        for bi in range(2):
            p, s = _res_block_sd(sd, f"up{lvl}.1.{bi}")
            params[f"up{lvl}_res{bi}"] = p
            stats[f"up{lvl}_res{bi}"] = s

    linear("classifier", "classifier.0")

    # flax alpha shape (1, C) matches torch
    return {"params": params, "batch_stats": stats}


def translate_elkencoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the reference ELKEncoder state_dict (linkencoder.py:188-330)
    onto our flax ELKEncoder trees. Same encoder layout as ELKUNet (the
    reference reuses the module names); the decoder weights the reference
    still *defines* (up1-up4, unused by its encoder forward) are ignored,
    and the classifier is the grouped Conv1d pair."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _translate_seg_encoder(sd, params, stats)

    def grouped(mod_f, prefix_t, g):
        w = sd[prefix_t + ".weight"][:, :, 0]          # (Co, Ci/g)
        co, ci = w.shape
        kern = w.reshape(g, co // g, ci).transpose(0, 2, 1)   # (g, ci, co/g)
        params[mod_f] = {"kernel": kern,
                         "bias": sd[prefix_t + ".bias"].reshape(g, co // g)}

    grouped("head0", "classifier.0", 5)
    grouped("head1", "classifier.2", 1)
    return {"params": params, "batch_stats": stats}


def _translate_seg_encoder(sd, params, stats):
    """Shared stem + 4-level (down / stage / tail / ELK) encoder mapping —
    identical module names in linkunet.py and linkencoder.py."""
    def put(tree, module, name, value):
        tree.setdefault(module, {})[name] = value

    def conv(mod_f, key_t):
        put(params, mod_f, "kernel", sd[key_t])

    def bn(mod_f, prefix_t):
        put(params, mod_f, "scale", sd[prefix_t + ".weight"])
        put(params, mod_f, "bias", sd[prefix_t + ".bias"])
        put(stats, mod_f, "mean", sd[prefix_t + ".running_mean"])
        put(stats, mod_f, "var", sd[prefix_t + ".running_var"])

    def linear(mod_f, prefix_t, bias=True):
        put(params, mod_f, "kernel", sd[prefix_t + ".weight"].T)
        if bias and prefix_t + ".bias" in sd:
            put(params, mod_f, "bias", sd[prefix_t + ".bias"])

    def layernorm(mod_f, prefix_t):
        put(params, mod_f, "scale", sd[prefix_t + ".weight"])
        put(params, mod_f, "bias", sd[prefix_t + ".bias"])

    _stem_sd(sd, params, stats)

    def res_block(mod_f, prefix_t):
        return _res_block_sd(sd, prefix_t)

    for lvl in range(1, 5):
        # down block: Sequential(BasicConvolutionBlock) -> net.0 conv net.1 bn
        params[f"down{lvl}"], stats[f"down{lvl}"] = _conv_bn_block_sd(
            sd, f"down{lvl}.0")

        for bi in range(2):
            p, s = res_block(f"stage{lvl}.{bi}", f"stage{lvl}.{bi}")
            params[f"stage{lvl}_{bi}"] = p
            stats[f"stage{lvl}_{bi}"] = s
        conv(f"stage{lvl}_tail", f"stage{lvl}_tail.0.kernel")
        bn(f"stage{lvl}_tail_bn", f"stage{lvl}_tail.1")

        # ELK block
        ep: Dict[str, Any] = {}
        es: Dict[str, Any] = {}
        ep["pre_mix"] = {"kernel": sd[f"elk{lvl}.pre_mix.0.weight"].T}
        ep["pre_mix_norm"] = {"scale": sd[f"elk{lvl}.pre_mix.1.weight"],
                              "bias": sd[f"elk{lvl}.pre_mix.1.bias"]}
        ep["local_mix"] = {"kernel": sd[f"elk{lvl}.local_mix.0.kernel"]}
        ep["pos_weight"] = {"kernel": sd[f"elk{lvl}.pos_weight.0.weight"].T}
        if f"elk{lvl}.alpha" in sd:
            ep["alpha"] = sd[f"elk{lvl}.alpha"]
        ep["norm"] = {"scale": sd[f"elk{lvl}.norm.weight"],
                      "bias": sd[f"elk{lvl}.norm.bias"]}
        ep["norm_local"] = {"scale": sd[f"elk{lvl}.norm_local.weight"],
                            "bias": sd[f"elk{lvl}.norm_local.bias"]}
        params[f"elk{lvl}"] = ep
        stats[f"elk{lvl}"] = es
        conv(f"elk{lvl}_tail", f"elk{lvl}_tail.0.kernel")
        bn(f"elk{lvl}_tail_bn", f"elk{lvl}_tail.1")
    return res_block, linear


def _res_block_sd(sd, prefix):
    """ResidualBlock mapping (net.0 conv, net.1 bn, net.3 conv, net.4 bn,
    optional downsample.{0,1}) -> our ResidualBlock submodule names."""
    p = {"SparseConv3d_0": {"kernel": sd[f"{prefix}.net.0.kernel"]},
         "SparseBatchNorm_0": {"scale": sd[f"{prefix}.net.1.weight"],
                               "bias": sd[f"{prefix}.net.1.bias"]},
         "SparseConv3d_1": {"kernel": sd[f"{prefix}.net.3.kernel"]},
         "SparseBatchNorm_1": {"scale": sd[f"{prefix}.net.4.weight"],
                               "bias": sd[f"{prefix}.net.4.bias"]}}
    s = {"SparseBatchNorm_0": {"mean": sd[f"{prefix}.net.1.running_mean"],
                               "var": sd[f"{prefix}.net.1.running_var"]},
         "SparseBatchNorm_1": {"mean": sd[f"{prefix}.net.4.running_mean"],
                               "var": sd[f"{prefix}.net.4.running_var"]}}
    if f"{prefix}.downsample.0.kernel" in sd:
        p["SparseConv3d_2"] = {"kernel": sd[f"{prefix}.downsample.0.kernel"]}
        p["SparseBatchNorm_2"] = {
            "scale": sd[f"{prefix}.downsample.1.weight"],
            "bias": sd[f"{prefix}.downsample.1.bias"]}
        s["SparseBatchNorm_2"] = {
            "mean": sd[f"{prefix}.downsample.1.running_mean"],
            "var": sd[f"{prefix}.downsample.1.running_var"]}
    return p, s


def _conv_bn_block_sd(sd, prefix):
    """Basic(De)ConvolutionBlock mapping (net.0 conv, net.1 bn)."""
    p = {"SparseConv3d_0": {"kernel": sd[f"{prefix}.net.0.kernel"]},
         "SparseBatchNorm_0": {"scale": sd[f"{prefix}.net.1.weight"],
                               "bias": sd[f"{prefix}.net.1.bias"]}}
    s = {"SparseBatchNorm_0": {"mean": sd[f"{prefix}.net.1.running_mean"],
                               "var": sd[f"{prefix}.net.1.running_var"]}}
    return p, s


def _stem_sd(sd, params, stats):
    params["stem0"] = {"kernel": sd["stem.0.kernel"]}
    params["stem0_bn"] = {"scale": sd["stem.1.weight"],
                          "bias": sd["stem.1.bias"]}
    stats["stem0_bn"] = {"mean": sd["stem.1.running_mean"],
                         "var": sd["stem.1.running_var"]}
    params["stem1"] = {"kernel": sd["stem.3.kernel"]}
    params["stem1_bn"] = {"scale": sd["stem.4.weight"],
                          "bias": sd["stem.4.bias"]}
    stats["stem1_bn"] = {"mean": sd["stem.4.running_mean"],
                         "var": sd["stem.4.running_var"]}


def _unet_body_sd(sd, params, stats):
    """Shared MinkUNet/SPVCNN body: stage{l} = Sequential(down, res, res)
    (minkunet.py:109-131, spvcnn.py:103-125) and up{l} = [deconv,
    Sequential(res, res)]."""
    _stem_sd(sd, params, stats)
    for lvl in range(1, 5):
        params[f"down{lvl}"], stats[f"down{lvl}"] = _conv_bn_block_sd(
            sd, f"stage{lvl}.0")
        for bi in range(2):
            p, s = _res_block_sd(sd, f"stage{lvl}.{bi + 1}")
            params[f"stage{lvl}_{bi}"] = p
            stats[f"stage{lvl}_{bi}"] = s
    for lvl in range(1, 5):
        params[f"up{lvl}_deconv"], stats[f"up{lvl}_deconv"] = \
            _conv_bn_block_sd(sd, f"up{lvl}.0")
        for bi in range(2):
            p, s = _res_block_sd(sd, f"up{lvl}.1.{bi}")
            params[f"up{lvl}_res{bi}"] = p
            stats[f"up{lvl}_res{bi}"] = s


def translate_minkunet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference MinkUNet (minkunet.py:91-254) -> our flax MinkUNet. The
    unused point_transforms weights the reference defines are ignored."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _unet_body_sd(sd, params, stats)
    params["classifier"] = {"kernel": sd["classifier.0.weight"].T,
                            "bias": sd["classifier.0.bias"]}
    return {"params": params, "batch_stats": stats}


def translate_spvcnn(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference SPVCNN (spvcnn.py:82-235) -> our flax SPVCNN: the UNet
    body plus the three point-transform MLPs (Linear + BatchNorm1d)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _unet_body_sd(sd, params, stats)
    for i in range(3):
        pre = f"point_transforms.{i}"
        params[f"pt{i}"] = {
            "Linear_0": {"kernel": sd[f"{pre}.0.weight"].T,
                         "bias": sd[f"{pre}.0.bias"]},
            "SparseBatchNorm_0": {"scale": sd[f"{pre}.1.weight"],
                                  "bias": sd[f"{pre}.1.bias"]}}
        stats[f"pt{i}"] = {
            "SparseBatchNorm_0": {"mean": sd[f"{pre}.1.running_mean"],
                                  "var": sd[f"{pre}.1.running_var"]}}
    params["classifier"] = {"kernel": sd["classifier.0.weight"].T,
                            "bias": sd["classifier.0.bias"]}
    return {"params": params, "batch_stats": stats}
