"""Export our parameter trees back to reference-format torch ``.pt``
checkpoints (the reverse of ``torch_port``) — ecosystem interop: a
model trained here can be loaded by the reference code with
``Generator(...).load_state_dict(ckpt['g_ema'])`` (strict).

Two pieces:
  * inverse name mapping (``generator_state_dict`` /
    ``discriminator_state_dict``), including the reference's registered
    buffers (``token``/``token_spatial`` eyes, blur ``kernel``s, noise
    buffers — model_spatial_query.py:101,122,146,507,537-539) so that
    strict ``load_state_dict`` succeeds;
  * a torch-free writer for the torch zip serialization format
    (``save_torch_checkpoint``): standard zip of ``data.pkl`` (pickle
    protocol 2 with ``('storage', <Type>, key, 'cpu', numel)``
    persistent IDs) + raw little-endian ``data/<key>`` blobs —
    validated against ``torch.load`` in tests.
"""

from __future__ import annotations

import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np

from transeditor_tpu.config import ModelConfig

# ---------------------------------------------------------------------------
# torch-free torch.save


_STORAGE_BY_DTYPE = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}


class _PickleWriter:
    """Hand-rolled pickle (protocol 2) emitter for {str: ndarray|dict}
    trees with torch persistent-id tensors.  The stdlib pickler can't
    emit ``torch.FloatStorage`` globals without torch importable, so we
    write the opcode stream directly."""

    def __init__(self):
        self.out = bytearray(b"\x80\x02")          # PROTO 2
        self.storages = []                          # (key, ndarray)

    def _str(self, s: str):
        b = s.encode("utf-8")
        self.out += b"X" + struct.pack("<I", len(b)) + b   # BINUNICODE

    def _int(self, i: int):
        self.out += b"J" + struct.pack("<i", i)            # BININT

    def _global(self, module: str, name: str):
        self.out += b"c" + module.encode() + b"\n" + name.encode() + b"\n"

    def _tuple(self, emit_items):
        self.out += b"("                                   # MARK
        emit_items()
        self.out += b"t"                                   # TUPLE

    def _tensor(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in _STORAGE_BY_DTYPE:
            raise TypeError(f"unsupported dtype {arr.dtype}")
        key = str(len(self.storages))
        self.storages.append((key, arr))

        self._global("torch._utils", "_rebuild_tensor_v2")
        self.out += b"("                                   # args MARK
        # persistent id ('storage', Type, key, 'cpu', numel) -> BINPERSID
        def pid_items():
            self._str("storage")
            self._global("torch", _STORAGE_BY_DTYPE[arr.dtype])
            self._str(key)
            self._str("cpu")
            self._int(arr.size)
        self._tuple(pid_items)
        self.out += b"Q"                                   # BINPERSID
        self._int(0)                                       # storage offset
        self._tuple(lambda: [self._int(s) for s in arr.shape])
        strides = [st // arr.itemsize for st in arr.strides]
        self._tuple(lambda: [self._int(s) for s in strides])
        self.out += b"\x89"                                # NEWFALSE
        self._global("collections", "OrderedDict")
        self.out += b")R"                                  # (), REDUCE
        self.out += b"tR"                                  # TUPLE, REDUCE

    def _value(self, v):
        if isinstance(v, dict):
            self.out += b"}("                              # EMPTY_DICT MARK
            for k, item in v.items():
                self._str(str(k))
                self._value(item)
            self.out += b"u"                               # SETITEMS
        elif isinstance(v, np.ndarray):
            self._tensor(v)
        elif isinstance(v, (bool, int, float, str)) or v is None:
            self.out += pickle.dumps(v, protocol=2)[2:-1]  # strip PROTO/STOP
        else:
            self._tensor(np.asarray(v))

    def dumps(self, obj) -> bytes:
        self._value(obj)
        self.out += b"."                                   # STOP
        return bytes(self.out)


def save_torch_checkpoint(path: str, obj: Any,
                          archive_name: str = "archive") -> None:
    """Write ``obj`` (a tree of dicts / numpy arrays / scalars) in the
    torch zip ``.pt`` format, loadable by ``torch.load``."""
    w = _PickleWriter()
    data_pkl = w.dumps(_numpyfy(obj))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive_name}/data.pkl", data_pkl)
        for key, arr in w.storages:
            zf.writestr(f"{archive_name}/data/{key}", arr.tobytes())
        zf.writestr(f"{archive_name}/version", "3\n")
        zf.writestr(f"{archive_name}/byteorder", "little")


def _numpyfy(obj):
    if isinstance(obj, dict):
        return {k: _numpyfy(v) for k, v in obj.items()}
    if isinstance(obj, (bool, int, float, str)) or obj is None:
        return obj
    return np.asarray(obj)


# ---------------------------------------------------------------------------
# inverse name mapping (see torch_port.py for the forward direction)


def _blur_kernel(scale: int = 1) -> np.ndarray:
    k = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
    k = np.outer(k, k)
    return (k / k.sum() * scale).astype(np.float32)


def _rev_lin(sd, prefix, tree):
    sd[f"{prefix}.weight"] = np.ascontiguousarray(
        np.asarray(tree["kernel"], np.float32).T)
    if "bias" in tree:
        sd[f"{prefix}.bias"] = np.asarray(tree["bias"], np.float32)


def _rev_modconv(sd, prefix, tree, blur_scale=None):
    w = np.transpose(np.asarray(tree["weight"], np.float32),
                     (3, 2, 0, 1))                 # HWIO -> OIHW
    sd[f"{prefix}.weight"] = np.ascontiguousarray(w[None])
    _rev_lin(sd, f"{prefix}.modulation", tree["modulation"])
    if blur_scale is not None:
        sd[f"{prefix}.blur.kernel"] = _blur_kernel(blur_scale)


def _rev_styled_conv(sd, prefix, tree, upsample=False):
    _rev_modconv(sd, f"{prefix}.conv", tree["conv"],
                 blur_scale=4 if upsample else None)
    sd[f"{prefix}.activate.bias"] = np.asarray(tree["bias"], np.float32)
    # NoiseInjection is constructed unconditionally in the reference
    # (its zero-init weight is only USED when injection is on)
    nw = np.asarray(tree.get("noise_weight", 0.0), np.float32)
    sd[f"{prefix}.noise.weight"] = nw.reshape(1)


def _rev_to_rgb(sd, prefix, tree, upsample=True):
    _rev_modconv(sd, f"{prefix}.conv", tree["conv"])
    sd[f"{prefix}.bias"] = np.asarray(tree["bias"],
                                      np.float32).reshape(1, 3, 1, 1)
    if upsample:
        sd[f"{prefix}.upsample.kernel"] = _blur_kernel(4)


def _rev_token_mapping(sd, prefix, tree):
    ks = np.asarray(tree["kernel"], np.float32)    # [n, in, out]
    bs = np.asarray(tree["bias"], np.float32)      # [n, out]
    for i in range(ks.shape[0]):
        sd[f"{prefix}.{i + 1}.weight"] = np.ascontiguousarray(ks[i].T)
        sd[f"{prefix}.{i + 1}.bias"] = bs[i]


def generator_state_dict(params: Dict[str, Any], cfg: ModelConfig,
                         noise_seed: int = 0) -> Dict[str, np.ndarray]:
    """Our Generator param tree -> reference state_dict (incl. buffers,
    so the reference's strict ``load_state_dict`` accepts it)."""
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}

    sd["token"] = np.eye(cfg.token_dim, dtype=np.float32)
    sd["token_spatial"] = np.eye(16, dtype=np.float32)

    _rev_token_mapping(sd, "style_mapping_network", p["style_mapping"])
    if cfg.use_spatial_mapping:
        _rev_token_mapping(sd, "spatial_mapping_network",
                           p["spatial_mapping"])

    if not cfg.no_trans:
        for i in range(cfg.n_trans):
            blk = p[f"interact_{i}"]
            _rev_lin(sd, f"interact.{i}.atten.q_transform",
                     blk["atten"]["q"])
            _rev_lin(sd, f"interact.{i}.atten.k_transform",
                     blk["atten"]["k"])
            _rev_lin(sd, f"interact.{i}.atten.v_transform",
                     blk["atten"]["v"])
            _rev_lin(sd, f"interact.{i}.atten.proj", blk["atten"]["proj"])
            _rev_lin(sd, f"interact.{i}.mlp.0", blk["mlp_0"])
            _rev_lin(sd, f"interact.{i}.mlp.2", blk["mlp_1"])
            if "proj" in blk:
                _rev_lin(sd, f"interact.{i}.proj", blk["proj"])

    _rev_lin(sd, "adjust_style", p["adjust_style"])

    _rev_styled_conv(sd, "conv1", p["conv1"])
    _rev_to_rgb(sd, "to_rgb1", p["to_rgb1"], upsample=False)
    for idx, i in enumerate(range(3, cfg.log_size + 1)):
        _rev_styled_conv(sd, f"convs.{2 * idx}", p[f"conv_up_{i}"],
                         upsample=True)
        _rev_styled_conv(sd, f"convs.{2 * idx + 1}", p[f"conv_{i}"])
        _rev_to_rgb(sd, f"to_rgbs.{idx}", p[f"to_rgb_{i}"])

    # noise buffers (model_spatial_query.py:504-507): layer i lives at
    # resolution 2^((i+5)//2), fresh gaussian values
    rng = np.random.RandomState(noise_seed)
    n_layers = 2 * (cfg.log_size - 2) + 1
    for i in range(n_layers):
        res = 2 ** ((i + 5) // 2)
        sd[f"noises.noise_{i}"] = rng.randn(1, 1, res, res).astype(
            np.float32)
    return sd


def _rev_conv_layer(sd, prefix, tree, downsample=False, activate=True):
    idx = 0
    if downsample:
        sd[f"{prefix}.0.kernel"] = _blur_kernel(1)
        idx = 1
    sd[f"{prefix}.{idx}.weight"] = np.ascontiguousarray(np.transpose(
        np.asarray(tree["conv"]["weight"], np.float32), (3, 2, 0, 1)))
    if activate and "bias" in tree:
        sd[f"{prefix}.{idx + 1}.bias"] = np.asarray(tree["bias"],
                                                    np.float32)
    elif "bias" in tree.get("conv", {}):
        sd[f"{prefix}.{idx}.bias"] = np.asarray(tree["conv"]["bias"],
                                                np.float32)


def discriminator_state_dict(params: Dict[str, Any],
                             cfg: ModelConfig) -> Dict[str, np.ndarray]:
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    _rev_conv_layer(sd, "convs.0", p["from_rgb"])
    for j, i in enumerate(range(cfg.log_size, 2, -1)):
        pref = f"convs.{j + 1}"
        blk = p[f"res_{i}"]
        _rev_conv_layer(sd, f"{pref}.conv1", blk["conv1"])
        _rev_conv_layer(sd, f"{pref}.conv2", blk["conv2"],
                        downsample=True)
        _rev_conv_layer(sd, f"{pref}.skip", blk["skip"], downsample=True,
                        activate=False)
    _rev_conv_layer(sd, "final_conv", p["final_conv"])
    _rev_lin(sd, "final_linear.0", p["final_linear_0"])
    _rev_lin(sd, "final_linear.1", p["final_linear_1"])
    return sd


def export_reference_checkpoint(path: str, cfg: ModelConfig, *,
                                g_ema=None, g=None, d=None) -> None:
    """Write a reference-layout ``{'g','d','g_ema'}`` bundle
    (train_spatial_query.py:361-371 without the optimizer states)."""
    bundle: Dict[str, Any] = {}
    if g is not None:
        bundle["g"] = generator_state_dict(g, cfg)
    if d is not None:
        bundle["d"] = discriminator_state_dict(d, cfg)
    if g_ema is not None:
        bundle["g_ema"] = generator_state_dict(g_ema, cfg)
    save_torch_checkpoint(path, bundle)
