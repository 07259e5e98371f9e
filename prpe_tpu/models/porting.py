"""Torch-checkpoint -> flax-pytree porting utilities.

The reference builds its combined model by surgically loading four pretrained
torch checkpoints (reference: training/modify_models.py:156-205,254-275,
388-407,440-452). Our equivalents consume the *same* checkpoint files (read as
``{name: numpy array}`` state dicts — no torch required at runtime) and emit
flax variable trees for the clean-room NHWC models in ``prpe_tpu.nn``.

Layout conversions:
  * conv weight  (O, I, kh, kw)  -> (kh, kw, I, O)
  * dense weight (O, I)          -> (I, O)
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var
  * IR-Net output linear: torch flattens (C, H, W); NHWC flattens (H, W, C) —
    the weight rows are permuted accordingly
  * ViTPose position embeddings: HF stores (1, P+1, C) and adds
    pos[1:] + pos[:1]; we fold the extra token into a single (P, C) table
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def to_numpy_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    return {k: _np(v) for k, v in state_dict.items()}


def conv_w(sd, key):
    return _np(sd[key]).transpose(2, 3, 1, 0)


def dense_w(sd, key):
    return _np(sd[key]).T


def _bn(sd, prefix, affine: bool = True):
    """Returns (params, stats) dicts for a torch BatchNorm prefix."""
    params = {}
    if affine:
        params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


# --------------------------------------------------------------------------
# ResNet-50 trunk  (torchvision resnet50 state dict)
# --------------------------------------------------------------------------

def port_resnet50(
    sd: Mapping[str, Any], stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
) -> Dict[str, Any]:
    """torchvision resnet50 -> ResNetTrunk variables (fc/avgpool ignored,
    matching the truncation at reference training/modify_models.py:413-437).
    ``stage_sizes`` supports reduced-depth trunks in tests."""
    params: Dict[str, Any] = {"conv1": {"kernel": conv_w(sd, "conv1.weight")}}
    stats: Dict[str, Any] = {}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s
    for stage, n in enumerate(stage_sizes):
        for block in range(n):
            t = f"layer{stage + 1}.{block}"
            name = f"layer{stage + 1}_{block}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = {"kernel": conv_w(sd, f"{t}.conv{i}.weight")}
                p, s = _bn(sd, f"{t}.bn{i}")
                bp[f"bn{i}"], bs[f"bn{i}"] = p, s
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": conv_w(sd, f"{t}.downsample.0.weight")}
                p, s = _bn(sd, f"{t}.downsample.1")
                bp["downsample_bn"], bs["downsample_bn"] = p, s
            params[name], stats[name] = bp, bs
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# ViTPose (HF VitPoseForPoseEstimation state dict)
# --------------------------------------------------------------------------

def port_vitpose(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """HF VitPose (simple decoder) -> ViTPose variables."""
    params: Dict[str, Any] = {}
    bb: Dict[str, Any] = {}

    bb["patch_embed"] = {
        "kernel": conv_w(sd, "backbone.embeddings.patch_embeddings.projection.weight"),
        "bias": _np(sd["backbone.embeddings.patch_embeddings.projection.bias"]),
    }
    pos = _np(sd["backbone.embeddings.position_embeddings"])[0]  # (P+1, C)
    bb["pos_embed"] = pos[1:] + pos[:1]  # fold the extra token

    layer = 0
    while f"backbone.encoder.layer.{layer}.layernorm_before.weight" in sd:
        t = f"backbone.encoder.layer.{layer}"
        blk: Dict[str, Any] = {"ln1": _ln(sd, f"{t}.layernorm_before"),
                               "ln2": _ln(sd, f"{t}.layernorm_after")}
        attn = {}
        for mine, theirs in (("q", "query"), ("k", "key"), ("v", "value")):
            attn[mine] = {
                "kernel": dense_w(sd, f"{t}.attention.attention.{theirs}.weight"),
                "bias": _np(sd[f"{t}.attention.attention.{theirs}.bias"]),
            }
        attn["proj"] = {
            "kernel": dense_w(sd, f"{t}.attention.output.dense.weight"),
            "bias": _np(sd[f"{t}.attention.output.dense.bias"]),
        }
        blk["attn"] = attn
        blk["fc1"] = {"kernel": dense_w(sd, f"{t}.mlp.fc1.weight"),
                      "bias": _np(sd[f"{t}.mlp.fc1.bias"])}
        blk["fc2"] = {"kernel": dense_w(sd, f"{t}.mlp.fc2.weight"),
                      "bias": _np(sd[f"{t}.mlp.fc2.bias"])}
        bb[f"block{layer}"] = blk
        layer += 1

    bb["ln_final"] = _ln(sd, "backbone.layernorm")
    params["backbone"] = bb
    params["head"] = {
        "conv": {"kernel": conv_w(sd, "head.conv.weight"),
                 "bias": _np(sd["head.conv.bias"])}
    }
    return {"params": params}


# --------------------------------------------------------------------------
# IR-Net (AdaFace checkpoint state dict, 'model.' / 'module.' prefixes
# stripped by the caller; reference: training/modify_models.py:257-268)
# --------------------------------------------------------------------------

def port_irnet(
    sd: Mapping[str, Any],
    num_layers: int = 50,
    mode: str = "ir",
    skip_input_layer: bool = False,
) -> Dict[str, Any]:
    """AdaFace IR backbone -> IRNet variables.

    ``skip_input_layer=True`` reproduces the graft that drops the pretrained
    input layer (reference: training/modify_models.py:266-275); the caller
    then initializes a fresh 64-channel input layer.
    """
    from prpe_tpu.nn.irnet import _BLOCKS  # stage table

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if not skip_input_layer:
        params["input_conv"] = {"kernel": conv_w(sd, "input_layer.0.weight")}
        p, s = _bn(sd, "input_layer.1")
        params["input_bn"], stats["input_bn"] = p, s
        params["input_prelu"] = {"alpha": _np(sd["input_layer.2.weight"])}

    basic = num_layers <= 100
    idx = 0
    in_ch = 64
    for depth, num_units in _BLOCKS[num_layers]:
        for u in range(num_units):
            t = f"body.{idx}"
            name = f"body{idx}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if in_ch != depth:
                bp["shortcut_conv"] = {"kernel": conv_w(sd, f"{t}.shortcut_layer.0.weight")}
                p, s = _bn(sd, f"{t}.shortcut_layer.1")
                bp["shortcut_bn"], bs["shortcut_bn"] = p, s
            if basic:
                # res_layer: 0 BN, 1 conv, 2 BN, 3 PReLU, 4 conv, 5 BN
                p, s = _bn(sd, f"{t}.res_layer.0"); bp["bn0"], bs["bn0"] = p, s
                bp["conv1"] = {"kernel": conv_w(sd, f"{t}.res_layer.1.weight")}
                p, s = _bn(sd, f"{t}.res_layer.2"); bp["bn1"], bs["bn1"] = p, s
                bp["prelu"] = {"alpha": _np(sd[f"{t}.res_layer.3.weight"])}
                bp["conv2"] = {"kernel": conv_w(sd, f"{t}.res_layer.4.weight")}
                p, s = _bn(sd, f"{t}.res_layer.5"); bp["bn2"], bs["bn2"] = p, s
            else:
                # bottleneck res_layer: 0 BN, 1 conv, 2 BN, 3 PReLU, 4 conv,
                # 5 BN, 6 PReLU, 7 conv, 8 BN
                p, s = _bn(sd, f"{t}.res_layer.0"); bp["bn0"], bs["bn0"] = p, s
                bp["conv1"] = {"kernel": conv_w(sd, f"{t}.res_layer.1.weight")}
                p, s = _bn(sd, f"{t}.res_layer.2"); bp["bn1"], bs["bn1"] = p, s
                bp["prelu1"] = {"alpha": _np(sd[f"{t}.res_layer.3.weight"])}
                bp["conv2"] = {"kernel": conv_w(sd, f"{t}.res_layer.4.weight")}
                p, s = _bn(sd, f"{t}.res_layer.5"); bp["bn2"], bs["bn2"] = p, s
                bp["prelu2"] = {"alpha": _np(sd[f"{t}.res_layer.6.weight"])}
                bp["conv3"] = {"kernel": conv_w(sd, f"{t}.res_layer.7.weight")}
                p, s = _bn(sd, f"{t}.res_layer.8"); bp["bn3"], bs["bn3"] = p, s
            if mode == "ir_se":
                se_base = f"{t}.res_layer.se_block"
                bp["se"] = {
                    "fc1": {"kernel": conv_w(sd, f"{se_base}.fc1.weight")},
                    "fc2": {"kernel": conv_w(sd, f"{se_base}.fc2.weight")},
                }
            params[name], stats[name] = bp, bs
            in_ch = depth
            idx += 1

    # output layer: 0 BN2d, 1 dropout, 2 flatten, 3 linear, 4 BN1d(affine=False)
    p, s = _bn(sd, "output_layer.0")
    params["output_bn"], stats["output_bn"] = p, s
    w = _np(sd["output_layer.3.weight"])  # (512, C*H*W), C-major flatten
    out_ch = 512 if basic else 2048
    # infer the output grid from the weight itself: 7x7 for 112-px
    # checkpoints, 14x14 for 224-px ones (both supported by nn/irnet.py)
    spatial = int(round((w.shape[1] // out_ch) ** 0.5))
    assert spatial * spatial * out_ch == w.shape[1], (
        f"output_layer.3.weight in-dim {w.shape[1]} is not {out_ch}*s^2")
    w = w.reshape(w.shape[0], out_ch, spatial, spatial).transpose(0, 2, 3, 1)
    params["output_linear"] = {
        "kernel": w.reshape(w.shape[0], -1).T,
        "bias": np.zeros((512,), np.float32) if "output_layer.3.bias" not in sd
        else _np(sd["output_layer.3.bias"]),
    }
    _, s = _bn(sd, "output_layer.4", affine=False)
    stats["output_bn1d"] = s
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# YOLOv11 (yolopt-style state dict; reference: training/yolopt/nets/nn.py)
# --------------------------------------------------------------------------

def _convbn(sd, t):
    """yolopt Conv module (conv + norm) -> ConvBN params/stats."""
    p = {"conv": {"kernel": conv_w(sd, f"{t}.conv.weight")}}
    bnp, bns = _bn(sd, f"{t}.norm")
    p["bn"] = bnp
    return p, {"bn": bns}


def _residual(sd, t):
    p1, s1 = _convbn(sd, f"{t}.conv1")
    p2, s2 = _convbn(sd, f"{t}.conv2")
    return {"conv1": p1, "conv2": p2}, {"conv1": s1, "conv2": s2}


def _cspmodule(sd, t):
    p, s = {}, {}
    for name in ("conv1", "conv2", "conv3"):
        p[name], s[name] = _convbn(sd, f"{t}.{name}")
    for i in (0, 1):
        p[f"res{i}"], s[f"res{i}"] = _residual(sd, f"{t}.res_m.{i}")
    return p, s


def _csp(sd, t, n, csp_inner):
    p, s = {}, {}
    p["conv1"], s["conv1"] = _convbn(sd, f"{t}.conv1")
    p["conv2"], s["conv2"] = _convbn(sd, f"{t}.conv2")
    for i in range(n):
        sub = f"{t}.res_m.{i}"
        if csp_inner:
            p[f"m{i}"], s[f"m{i}"] = _cspmodule(sd, sub)
        else:
            p[f"m{i}"], s[f"m{i}"] = _residual(sd, sub)
    return p, s


def _attention(sd, t):
    p, s = {}, {}
    p["qkv"], s["qkv"] = _convbn(sd, f"{t}.qkv")
    p["pe"], s["pe"] = _convbn(sd, f"{t}.conv1")
    p["proj"], s["proj"] = _convbn(sd, f"{t}.conv2")
    return p, s


def _psa(sd, t, n):
    p, s = {}, {}
    p["conv1"], s["conv1"] = _convbn(sd, f"{t}.conv1")
    p["conv2"], s["conv2"] = _convbn(sd, f"{t}.conv2")
    for i in range(n):
        blk_t = f"{t}.res_m.{i}"
        bp, bs = {}, {}
        bp["attn"], bs["attn"] = _attention(sd, f"{blk_t}.conv1")
        bp["ffn1"], bs["ffn1"] = _convbn(sd, f"{blk_t}.conv2.0")
        bp["ffn2"], bs["ffn2"] = _convbn(sd, f"{blk_t}.conv2.1")
        p[f"blk{i}"], s[f"blk{i}"] = bp, bs
    return p, s


def port_yolo(sd: Mapping[str, Any], variant: str = "n") -> Dict[str, Any]:
    """yolopt YOLO state dict -> YOLO variables.

    The reference's head surgery (nc=80 -> nc=1, keeping everything except the
    final cls conv; training/modify_models.py:156-180) is expressed by porting
    into a model whose ``cls{i}_out`` is freshly initialized — see
    :func:`port_yolo_surgery`.
    """
    from prpe_tpu.nn.yolo import VARIANTS

    spec = VARIANTS[variant]
    d = spec["depth"]
    ci = spec["csp"]

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    net_p: Dict[str, Any] = {}
    net_s: Dict[str, Any] = {}
    net_p["p1_conv"], net_s["p1_conv"] = _convbn(sd, "net.p1.0")
    net_p["p2_conv"], net_s["p2_conv"] = _convbn(sd, "net.p2.0")
    net_p["p2_csp"], net_s["p2_csp"] = _csp(sd, "net.p2.1", d[0], ci[0])
    net_p["p3_conv"], net_s["p3_conv"] = _convbn(sd, "net.p3.0")
    net_p["p3_csp"], net_s["p3_csp"] = _csp(sd, "net.p3.1", d[1], ci[0])
    net_p["p4_conv"], net_s["p4_conv"] = _convbn(sd, "net.p4.0")
    net_p["p4_csp"], net_s["p4_csp"] = _csp(sd, "net.p4.1", d[2], ci[1])
    net_p["p5_conv"], net_s["p5_conv"] = _convbn(sd, "net.p5.0")
    net_p["p5_csp"], net_s["p5_csp"] = _csp(sd, "net.p5.1", d[3], ci[1])
    spp_p, spp_s = {}, {}
    spp_p["conv1"], spp_s["conv1"] = _convbn(sd, "net.p5.2.conv1")
    spp_p["conv2"], spp_s["conv2"] = _convbn(sd, "net.p5.2.conv2")
    net_p["p5_spp"], net_s["p5_spp"] = spp_p, spp_s
    net_p["p5_psa"], net_s["p5_psa"] = _psa(sd, "net.p5.3", d[4])
    params["net"], stats["net"] = net_p, net_s

    fpn_p: Dict[str, Any] = {}
    fpn_s: Dict[str, Any] = {}
    for name, is_csp, inner in (
        ("h1", True, ci[0]), ("h2", True, ci[0]), ("h3", False, None),
        ("h4", True, ci[0]), ("h5", False, None), ("h6", True, ci[1]),
    ):
        if is_csp:
            fpn_p[name], fpn_s[name] = _csp(sd, f"fpn.{name}", d[5], inner)
        else:
            fpn_p[name], fpn_s[name] = _convbn(sd, f"fpn.{name}")
    params["fpn"], stats["fpn"] = fpn_p, fpn_s

    head_p: Dict[str, Any] = {}
    head_s: Dict[str, Any] = {}
    for l in range(3):
        for j in (0, 1):
            head_p[f"box{l}_{j}"], head_s[f"box{l}_{j}"] = _convbn(sd, f"head.box.{l}.{j}")
        head_p[f"box{l}_out"] = {
            "kernel": conv_w(sd, f"head.box.{l}.2.weight"),
            "bias": _np(sd[f"head.box.{l}.2.bias"]),
        }
        for j in range(4):
            head_p[f"cls{l}_{j}"], head_s[f"cls{l}_{j}"] = _convbn(sd, f"head.cls.{l}.{j}")
        if f"head.cls.{l}.4.weight" in sd:
            head_p[f"cls{l}_out"] = {
                "kernel": conv_w(sd, f"head.cls.{l}.4.weight"),
                "bias": _np(sd[f"head.cls.{l}.4.bias"]),
            }
    params["head"], stats["head"] = head_p, head_s
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# Combined-model component porting: consumes the state dicts the reference's
# build step saves (custom_yolo.pth / custom_ada_face.pth / custom_vit_pose.pth
# / resnet_feature_extractor.pth / combined_model.pth — reference:
# training/modify_models.py:201-204,327-329,404-406,449-451,531-532)
# --------------------------------------------------------------------------

# torch Sequential conv indices -> flax _ConvBNAct child names, per adapter
# flavor (reference: training/modify_models.py:40-71 yolo, :230-252 adaface,
# :352-374 vitpose; adaface/vitpose share one index layout)
_ADAPTER_LAYOUT = {
    "yolo": ((0, "reduce"), (4, "spatial"), (7, "down1"), (10, "down2"),
             (13, "down3"), (16, "out")),
    "simple": ((0, "reduce"), (4, "down1"), (7, "down2"), (10, "out")),
}


def port_adapter(
    sd: Mapping[str, Any], prefix: str = "adapter",
    flavor: str = "simple", prelu: bool = False,
) -> Dict[str, Any]:
    """torch adapter ``nn.Sequential`` -> flax adapter variables.

    The adapters are new modules in the reference too (initialized at graft
    time), so this path only matters when round-tripping the reference's
    saved ``custom_*.pth`` component snapshots.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for idx, name in _ADAPTER_LAYOUT[flavor]:
        p: Dict[str, Any] = {"conv": {
            "kernel": conv_w(sd, f"{prefix}.{idx}.weight"),
            "bias": _np(sd[f"{prefix}.{idx}.bias"]),
        }}
        bnp, bns = _bn(sd, f"{prefix}.{idx + 1}")
        p["bn"] = bnp
        if prelu:
            p["prelu"] = {"alpha": _np(sd[f"{prefix}.{idx + 2}.weight"])}
        params[name] = p
        stats[name] = {"bn": bns}
    return {"params": params, "batch_stats": stats}


def _subdict(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    pl = len(prefix) + 1
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix + ".")}


def port_combined(
    sd: Mapping[str, Any],
    num_layers: int = 50,
    mode: str = "ir",
    variant: str = "n",
    backbone_stages: Tuple[int, ...] = (3, 4, 6, 3),
) -> Dict[str, Any]:
    """Reference ``CombinedModel.state_dict()`` -> flax CombinedModel variables.

    Key prefixes follow the reference's attribute names
    (training/modify_models.py:462-480): ``backbone.*``,
    ``yolo_{person,face}.{adapter,yolo}.*``,
    ``ada_face.{adapter,adaface_model,head}.*``,
    ``vit_pose.{adapter,vit_pose}.*``. The AdaFace margin head contributes
    the ``face_kernel`` param and the margin EMA buffers
    (libs/head_adaface.py:56-69).
    """
    sd = to_numpy_state_dict(sd)
    out_p: Dict[str, Any] = {}
    out_s: Dict[str, Any] = {}

    bb = port_resnet50(_subdict(sd, "backbone"), backbone_stages)
    out_p["backbone"], out_s["backbone"] = bb["params"], bb["batch_stats"]

    for branch in ("yolo_person", "yolo_face"):
        bsd = _subdict(sd, branch)
        ad = port_adapter(bsd, "adapter", "yolo")
        yo = port_yolo(_subdict(bsd, "yolo"), variant)
        out_p[f"{branch}_adapter"] = ad["params"]
        out_s[f"{branch}_adapter"] = ad["batch_stats"]
        out_p[branch], out_s[branch] = yo["params"], yo["batch_stats"]

    fsd = _subdict(sd, "ada_face")
    ad = port_adapter(fsd, "adapter", "simple", prelu=True)
    ir = port_irnet(_subdict(fsd, "adaface_model"), num_layers, mode)
    out_p["ada_face_adapter"], out_s["ada_face_adapter"] = ad["params"], ad["batch_stats"]
    out_p["ada_face"], out_s["ada_face"] = ir["params"], ir["batch_stats"]
    out_p["face_kernel"] = _np(fsd["head.kernel"])
    out_s["margin_mean"] = _np(fsd["head.batch_mean"]).reshape(()).astype(np.float32)
    out_s["margin_std"] = _np(fsd["head.batch_std"]).reshape(()).astype(np.float32)

    psd = _subdict(sd, "vit_pose")
    ad = port_adapter(psd, "adapter", "simple")
    vp = port_vitpose(_subdict(psd, "vit_pose"))
    out_p["vit_pose_adapter"], out_s["vit_pose_adapter"] = ad["params"], ad["batch_stats"]
    out_p["vit_pose"] = vp["params"]

    return {"params": out_p, "batch_stats": out_s}


def merge_variables(base: Dict[str, Any], ported: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively overlay ``ported`` leaves onto ``base`` (freshly-initialized)
    variables — the equivalent of torch ``load_state_dict(strict=False)``."""

    def _merge(b, p):
        if isinstance(b, dict) and isinstance(p, dict):
            out = dict(b)
            for k, v in p.items():
                out[k] = _merge(b[k], v) if k in b else v
            return out
        return p

    merged = _merge(base, ported)

    def _check(path, b, m):
        if isinstance(b, dict):
            for k in b:
                _check(path + (k,), b[k], m[k])
        else:
            if tuple(np.shape(b)) != tuple(np.shape(m)):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: "
                    f"{np.shape(b)} vs ported {np.shape(m)}"
                )

    _check((), base, merged)
    return merged
