"""Port reference PyTorch checkpoints into our Flax parameter trees.

The reference ships ``790000.pt`` (FFHQ) / ``370000.pt`` (CelebA-HQ)
saved as ``{'g','d','g_ema','g_optim','d_optim'}`` state-dict bundles
(train_spatial_query.py:361-371).  This module maps those tensors onto
the TPU-native parameter layout:

  torch                         ours
  ----------------------------- ---------------------------------
  Linear weight [out, in]       kernel [in, out]           (transpose)
  Conv weight [O, I, kh, kw]    weight [kh, kw, I, O]      (HWIO)
  ModConv weight [1,O,I,kh,kw]  weight [kh, kw, I, O]
  16 per-token mapping layers   one stacked [16, in, out] kernel
  FusedLeakyReLU.bias           parent module 'bias'
  ToRGB.bias [1,3,1,1]          bias [3]

Uses torch (CPU build is available in this image) when installed; falls
back to a pure-Python zipfile+pickle reader otherwise.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np

from transeditor_tpu.config import ModelConfig


# ---------------------------------------------------------------------------
# checkpoint reading


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch-saved checkpoint to a tree of numpy arrays."""
    try:
        import torch  # noqa: F401
        return _load_with_torch(path)
    except ImportError:
        return _load_zip_pickle(path)


def _load_with_torch(path):
    import torch

    def to_np(obj):
        if isinstance(obj, torch.Tensor):
            return obj.detach().cpu().numpy()
        if isinstance(obj, dict):
            return {k: to_np(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(to_np(v) for v in obj)
        return obj

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return to_np(ckpt)


_DTYPES = {
    "FloatStorage": np.float32, "DoubleStorage": np.float64,
    "HalfStorage": np.float16, "LongStorage": np.int64,
    "IntStorage": np.int32, "ShortStorage": np.int16,
    "CharStorage": np.int8, "ByteStorage": np.uint8,
    "BoolStorage": np.bool_, "BFloat16Storage": np.uint16,  # raw bits
}


class _StorageStub:
    def __init__(self, key, dtype):
        self.key = key
        self.dtype = dtype


def _storage_dtype(name: str):
    for k, v in _DTYPES.items():
        if k == name:
            return v
    return np.float32  # UntypedStorage / unknown: bytes-compatible guess


def _load_zip_pickle(path):
    """Minimal torch-zip reader: unpickle with storage stubs backed by
    the archive's ``data/<key>`` blobs (no torch dependency)."""
    zf = zipfile.ZipFile(path)
    prefix = zf.namelist()[0].split("/", 1)[0]
    blobs: Dict[str, np.ndarray] = {}

    def rebuild_tensor_v2(storage, offset, size, stride, *_args):
        if storage.key not in blobs:
            blobs[storage.key] = np.frombuffer(
                zf.read(f"{prefix}/data/{storage.key}"),
                dtype=storage.dtype)
        blob = blobs[storage.key]
        if not size:
            return np.array(blob[offset])
        flat = np.lib.stride_tricks.as_strided(
            blob[offset:], shape=tuple(size),
            strides=tuple(s * blob.itemsize for s in stride))
        return np.array(flat)

    def rebuild_parameter(data, *_args):
        return data

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith("torch"):
                if name == "_rebuild_tensor_v2":
                    return rebuild_tensor_v2
                if name == "_rebuild_parameter":
                    return rebuild_parameter
                if name.endswith("Storage"):
                    return name  # sentinel carrying the dtype name
                # dtypes / misc torch symbols: return a harmless stub
                return lambda *a, **k: None
            return super().find_class(module, name)

        def persistent_load(self, saved_id):
            typename, storage_type, key = saved_id[0], saved_id[1], \
                saved_id[2]
            assert typename == "storage", typename
            name = (storage_type if isinstance(storage_type, str)
                    else getattr(storage_type, "__name__", "FloatStorage"))
            return _StorageStub(key, _storage_dtype(name))

    with zf.open(f"{prefix}/data.pkl") as f:
        return Unpickler(io.BytesIO(f.read())).load()


# ---------------------------------------------------------------------------
# name mapping


def _lin(sd, prefix):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv_hwio(w):
    # [O, I, kh, kw] -> [kh, kw, I, O]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _modconv(sd, prefix):
    w = sd[f"{prefix}.weight"]
    if w.ndim == 5:          # [1, O, I, kh, kw]
        w = w[0]
    return {
        "weight": _conv_hwio(w),
        "modulation": _lin(sd, f"{prefix}.modulation"),
    }


def _styled_conv(sd, prefix, noise_injection=False):
    out = {
        "conv": _modconv(sd, f"{prefix}.conv"),
        "bias": sd[f"{prefix}.activate.bias"],
    }
    if noise_injection:
        out["noise_weight"] = np.asarray(sd[f"{prefix}.noise.weight"]
                                         ).reshape(())
    return out


def _to_rgb(sd, prefix):
    return {
        "conv": _modconv(sd, f"{prefix}.conv"),
        "bias": sd[f"{prefix}.bias"].reshape(3),
    }


def _token_mapping(sd, prefix, n):
    # layers 1..n are EqualLinear (layer 0 is the param-free PixelNorm)
    ks = np.stack([sd[f"{prefix}.{i}.weight"].T for i in range(1, n + 1)])
    bs = np.stack([sd[f"{prefix}.{i}.bias"] for i in range(1, n + 1)])
    return {"kernel": np.ascontiguousarray(ks), "bias": bs}


def generator_params_from_torch(sd: Dict[str, np.ndarray],
                                cfg: ModelConfig) -> Dict[str, Any]:
    """Map a reference Generator state_dict to our param tree."""
    p: Dict[str, Any] = {}
    n_map = cfg.num_mappings

    p["style_mapping"] = _token_mapping(sd, "style_mapping_network", n_map)
    if cfg.use_spatial_mapping:
        p["spatial_mapping"] = _token_mapping(
            sd, "spatial_mapping_network", n_map)

    if not cfg.no_trans:
        for i in range(cfg.n_trans):
            blk = {
                "atten": {
                    "q": _lin(sd, f"interact.{i}.atten.q_transform"),
                    "k": _lin(sd, f"interact.{i}.atten.k_transform"),
                    "v": _lin(sd, f"interact.{i}.atten.v_transform"),
                    "proj": _lin(sd, f"interact.{i}.atten.proj"),
                },
                "mlp_0": _lin(sd, f"interact.{i}.mlp.0"),
                "mlp_1": _lin(sd, f"interact.{i}.mlp.2"),
            }
            if f"interact.{i}.proj.weight" in sd:
                blk["proj"] = _lin(sd, f"interact.{i}.proj")
            p[f"interact_{i}"] = blk

    p["adjust_style"] = _lin(sd, "adjust_style")

    inj = cfg.layer_noise_injection
    p["conv1"] = _styled_conv(sd, "conv1", inj)
    p["to_rgb1"] = _to_rgb(sd, "to_rgb1")

    for idx, i in enumerate(range(3, cfg.log_size + 1)):
        p[f"conv_up_{i}"] = _styled_conv(sd, f"convs.{2 * idx}", inj)
        p[f"conv_{i}"] = _styled_conv(sd, f"convs.{2 * idx + 1}", inj)
        p[f"to_rgb_{i}"] = _to_rgb(sd, f"to_rgbs.{idx}")

    return {"params": p}


def _conv_layer(sd, prefix, downsample=False, activate=True, bias=True):
    """Reference ConvLayer is an nn.Sequential: [Blur,] EqualConv2d
    [, FusedLeakyReLU] (model_spatial_query.py:731-777)."""
    idx = 1 if downsample else 0
    out = {"conv": {"weight": _conv_hwio(sd[f"{prefix}.{idx}.weight"])}}
    if activate and bias:
        out["bias"] = sd[f"{prefix}.{idx + 1}.bias"]
    elif bias and not activate and f"{prefix}.{idx}.bias" in sd:
        out["conv"]["bias"] = sd[f"{prefix}.{idx}.bias"]
    return out


def discriminator_params_from_torch(sd: Dict[str, np.ndarray],
                                    cfg: ModelConfig) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    p["from_rgb"] = _conv_layer(sd, "convs.0")
    for j, i in enumerate(range(cfg.log_size, 2, -1)):
        pref = f"convs.{j + 1}"
        p[f"res_{i}"] = {
            "conv1": _conv_layer(sd, f"{pref}.conv1"),
            "conv2": _conv_layer(sd, f"{pref}.conv2", downsample=True),
            "skip": _conv_layer(sd, f"{pref}.skip", downsample=True,
                                activate=False, bias=False),
        }
    p["final_conv"] = _conv_layer(sd, "final_conv")
    p["final_linear_0"] = _lin(sd, "final_linear.0")
    p["final_linear_1"] = _lin(sd, "final_linear.1")
    return {"params": p}
