"""LPIPS perceptual distance (Flax).

Covers both LPIPS stacks the reference carries:
  * richzhang 'net-lin' (``utils/lpips``, PNetLin vgg/alex — projector
    loss, PPL, encoder-test metrics): per-sample distance = sum over
    tap layers of spatially-averaged 1x1-reweighted squared differences
    of unit-normalized features;
  * StarGAN-v2 variant (``metrics/lpips.py:49-82`` — LPIPS diversity):
    same math with AlexNet, scalar = mean over the batch too.

Input images are [-1, 1] NHWC; the standard scaling layer
(shift [-.030,-.088,-.188], scale [.458,.448,.450]) is applied inside.
"""

from __future__ import annotations

from typing import Any, Dict, List, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from transeditor_tpu.zoo.backbones import (
    AlexNetFeatures, VGGFeatures, VGG16_CFG, VGG16_TAPS,
    port_alexnet, port_vgg)

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

ALEX_CHANNELS = (64, 192, 384, 256, 256)
VGG_CHANNELS = (64, 128, 256, 512, 512)


def _unit_normalize(x, eps=1e-10):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


class LPIPS(nn.Module):
    """Returns per-sample LPIPS distance [B] between two [-1,1] images."""

    net: Literal["alex", "vgg"] = "alex"
    use_linear: bool = True   # False = plain mean of squared diffs

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        x = (x - shift) / scale
        y = (y - shift) / scale

        if self.net == "alex":
            backbone = AlexNetFeatures(name="backbone")
            channels = ALEX_CHANNELS
        else:
            backbone = VGGFeatures(tuple(VGG16_CFG), VGG16_TAPS,
                                   name="backbone")
            channels = VGG_CHANNELS

        fx = backbone(x)
        fy = backbone(y)

        total = jnp.zeros((x.shape[0],), jnp.float32)
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            if self.use_linear:
                w = self.param(f"lin{i}", nn.initializers.ones,
                               (channels[i],))
                d = d * jnp.abs(w)          # 1x1 conv, no bias
                layer = jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
            else:
                layer = jnp.mean(d, axis=(1, 2, 3))
            total = total + layer.astype(jnp.float32)
        return total


def load_lpips_params(sd: Dict[str, np.ndarray],
                      net: str = "alex",
                      backbone_sd: Optional[Dict[str, np.ndarray]] = None,
                      ) -> Dict[str, Any]:
    """Port a torch LPIPS checkpoint.

    Accepts either the richzhang layout (``lin{i}.model.1.weight`` +
    backbone under ``net.slice*``/separate torchvision alexnet) or the
    StarGAN-v2 layout (``alexnet.layers.{idx}.*`` +
    ``lpips_weights.{i}.main.1.weight``).

    Both reference distributions bundle ONLY the linear heads
    (metrics/lpips_weights.ckpt, utils/lpips/weights/v0.*/): the conv
    backbone comes from torchvision's pretrained model at runtime
    (metrics/lpips.py:12-37, networks_basic.py).  For a heads-only
    checkpoint pass that torchvision state dict as ``backbone_sd``; if
    neither source has backbone weights, the backbone is RANDOM-init
    (heads still real) and a warning is printed — fine for smoke runs,
    not for reportable metric values.
    """
    params: Dict[str, Any] = {}

    # --- backbone convs
    if any(k.startswith("alexnet.layers") for k in sd):
        bsd = {k[len("alexnet.layers."):]: v for k, v in sd.items()
               if k.startswith("alexnet.layers.")}
        backbone = port_alexnet({f"features.{k}": v for k, v in bsd.items()})
    elif any(k.startswith("features.") for k in sd):
        backbone = (port_alexnet(sd) if net == "alex"
                    else port_vgg(sd, 13))
    elif backbone_sd is not None:
        backbone = (port_alexnet(backbone_sd) if net == "alex"
                    else port_vgg(backbone_sd, 13))
    else:
        print("WARNING: LPIPS checkpoint has only linear heads and no "
              "backbone_sd given — backbone is RANDOM init")
        lpips = LPIPS(net=net)
        x0 = jnp.zeros((1, 64, 64, 3))
        backbone = {"params": lpips.init(
            jax.random.PRNGKey(0), x0, x0)["params"]["backbone"]}
    params["backbone"] = backbone["params"]

    # --- linear heads
    for i in range(5):
        for key in (f"lpips_weights.{i}.main.1.weight",
                    f"lin{i}.model.1.weight"):
            if key in sd:
                params[f"lin{i}"] = sd[key].reshape(-1)
                break
        else:
            raise KeyError(f"no linear head {i} in checkpoint")
    return {"params": params}


def lpips_pairwise_diversity(lpips_apply, params,
                             groups: List[np.ndarray]) -> float:
    """StarGAN-v2 diversity: mean pairwise LPIPS across random outputs
    (metrics/lpips.py:85-98)."""
    vals = []
    n = len(groups)
    for i in range(n - 1):
        for j in range(i + 1, n):
            d = lpips_apply(params, jnp.asarray(groups[i]),
                            jnp.asarray(groups[j]))
            vals.append(float(jnp.mean(d)))
    return float(np.mean(vals))
