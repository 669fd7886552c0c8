"""Port torch checkpoints of the perceptual/encoder model zoo.

Covers:
  * IR-SE-50 trunks (InsightFace layout: ``input_layer.*``,
    ``body.{i}.shortcut_layer/res_layer.*``) -> models/irse.py trees,
  * the full ArcFace recognition backbone (``output_layer.*`` head),
  * the pSp GradualStyleEncoder (``styles.{j}``/``spatials.{j}`` heads,
    ``latlayer1/2``, ``adjust_style``) -> models/psp.py trees.

Returns flax variable dicts {'params': ..., 'batch_stats': ...}.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from transeditor_tpu.models.irse import unit_list


def _conv_hwio(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _bn(sd, prefix):
    params = {"bn": {"scale": sd[f"{prefix}.weight"],
                     "bias": sd[f"{prefix}.bias"]}}
    stats = {"bn": {"mean": sd[f"{prefix}.running_mean"],
                    "var": sd[f"{prefix}.running_var"]}}
    return params, stats


def port_irse_backbone(sd: Dict[str, np.ndarray], prefix: str = "",
                       num_layers: int = 50,
                       use_se: bool = True) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for IRSEBackbone."""
    g = lambda k: sd[f"{prefix}{k}"]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["input_conv"] = {"conv": {"kernel": _conv_hwio(
        g("input_layer.0.weight"))}}
    p, s = _bn(sd, f"{prefix}input_layer.1")
    params["input_bn"], stats["input_bn"] = p, s
    params["input_prelu"] = {"alpha": g("input_layer.2.weight")}

    for i, (in_ch, depth, stride) in enumerate(unit_list(num_layers)):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        base = f"{prefix}body.{i}"
        if in_ch != depth:
            bp["shortcut_conv"] = {"conv": {"kernel": _conv_hwio(
                sd[f"{base}.shortcut_layer.0.weight"])}}
            p, s = _bn(sd, f"{base}.shortcut_layer.1")
            bp["shortcut_bn"], bs["shortcut_bn"] = p, s
        p, s = _bn(sd, f"{base}.res_layer.0")
        bp["res_bn1"], bs["res_bn1"] = p, s
        bp["res_conv1"] = {"conv": {"kernel": _conv_hwio(
            sd[f"{base}.res_layer.1.weight"])}}
        bp["res_prelu"] = {"alpha": sd[f"{base}.res_layer.2.weight"]}
        bp["res_conv2"] = {"conv": {"kernel": _conv_hwio(
            sd[f"{base}.res_layer.3.weight"])}}
        p, s = _bn(sd, f"{base}.res_layer.4")
        bp["res_bn2"], bs["res_bn2"] = p, s
        if use_se:
            bp["se"] = {
                "fc1": {"conv": {"kernel": _conv_hwio(
                    sd[f"{base}.res_layer.5.fc1.weight"])}},
                "fc2": {"conv": {"kernel": _conv_hwio(
                    sd[f"{base}.res_layer.5.fc2.weight"])}},
            }
        params[f"body_{i}"] = bp
        stats[f"body_{i}"] = bs
    return params, stats


def port_arcface(sd: Dict[str, np.ndarray], num_layers: int = 50,
                 use_se: bool = True) -> Dict[str, Any]:
    """Full ArcFace Backbone (model_irse.py) -> ArcFaceBackbone vars.

    ``num_layers=100, use_se=False`` ports the IR-101 CurricularFace
    net used by ``pSp/scripts/calc_id_loss_parallel.py:29-30``.
    """
    trunk_p, trunk_s = port_irse_backbone(sd, num_layers=num_layers,
                                          use_se=use_se)
    params: Dict[str, Any] = {"trunk": trunk_p}
    stats: Dict[str, Any] = {"trunk": trunk_s}

    p, s = _bn(sd, "output_layer.0")
    params["out_bn1"], stats["out_bn1"] = p, s
    params["out_linear"] = {"kernel": sd["output_layer.3.weight"].T,
                            "bias": sd["output_layer.3.bias"]}
    params["out_bn2"] = {"scale": sd["output_layer.4.weight"],
                         "bias": sd["output_layer.4.bias"]}
    stats["out_bn2"] = {"mean": sd["output_layer.4.running_mean"],
                        "var": sd["output_layer.4.running_var"]}
    return {"params": params, "batch_stats": stats}


def _gradual_style_block(sd, prefix):
    out: Dict[str, Any] = {}
    conv_indices = sorted({int(k.split(".")[-2]) for k in sd
                           if k.startswith(f"{prefix}.convs.")
                           and k.endswith(".weight")})
    for n, idx in enumerate(conv_indices):
        out[f"conv{n}"] = {
            "kernel": _conv_hwio(sd[f"{prefix}.convs.{idx}.weight"]),
            "bias": sd[f"{prefix}.convs.{idx}.bias"],
        }
    out["linear"] = {"kernel": sd[f"{prefix}.linear.weight"].T,
                     "bias": sd[f"{prefix}.linear.bias"]}
    return out


def port_gradual_style_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """pSp GradualStyleEncoder state dict -> our variable dict."""
    trunk_p, trunk_s = port_irse_backbone(sd)
    params: Dict[str, Any] = {"trunk": trunk_p}
    stats: Dict[str, Any] = {"trunk": trunk_s}

    for j in range(14):
        params[f"style_{j}"] = _gradual_style_block(sd, f"styles.{j}")
    for j in range(16):
        params[f"spatial_{j}"] = _gradual_style_block(sd, f"spatials.{j}")
    params["latlayer1"] = {"conv": {
        "kernel": _conv_hwio(sd["latlayer1.weight"]),
        "bias": sd["latlayer1.bias"]}}
    params["latlayer2"] = {"conv": {
        "kernel": _conv_hwio(sd["latlayer2.weight"]),
        "bias": sd["latlayer2.bias"]}}
    params["adjust_style"] = {"kernel": sd["adjust_style.weight"].T,
                              "bias": sd["adjust_style.bias"]}
    return {"params": params, "batch_stats": stats}


def port_backbone_encoder_into_w(sd: Dict[str, np.ndarray],
                                 num_layers: int = 50,
                                 use_se: bool = True) -> Dict[str, Any]:
    """BackboneEncoderUsingLastLayerIntoW (psp_encoders_new.py:143-173)
    -> models/psp.py::BackboneEncoderIntoW variables."""
    trunk_p, trunk_s = port_irse_backbone(sd, num_layers=num_layers,
                                          use_se=use_se)
    params = {"trunk": trunk_p,
              "linear": {"kernel": sd["linear.weight"].T,
                         "bias": sd["linear.bias"]}}
    return {"params": params, "batch_stats": {"trunk": trunk_s}}


def port_backbone_encoder_into_wplus(sd: Dict[str, np.ndarray],
                                     num_layers: int = 50,
                                     use_se: bool = True
                                     ) -> Dict[str, Any]:
    """BackboneEncoderUsingLastLayerIntoWPlus
    (psp_encoders_new.py:176-209) ->
    models/psp.py::BackboneEncoderIntoWPlus variables.  The torch
    Flatten on [B,512,7,7] is channel-major, matching our NCHW-ordered
    reshape, so the 25088->512 Linear ports with a plain transpose."""
    trunk_p, trunk_s = port_irse_backbone(sd, num_layers=num_layers,
                                          use_se=use_se)
    bn_p, bn_s = _bn(sd, "output_layer_2.0")
    params = {
        "trunk": trunk_p,
        "out_bn": bn_p,
        "out_linear": {"kernel": sd["output_layer_2.3.weight"].T,
                       "bias": sd["output_layer_2.3.bias"]},
        "linear": {"kernel": sd["linear.weight"].T,
                   "bias": sd["linear.bias"]},
    }
    return {"params": params,
            "batch_stats": {"trunk": trunk_s, "out_bn": bn_s}}
