"""Load the reference model as a CPU oracle for parity tests.

The reference hard-requires CUDA (its ``utils.op`` JIT-compiles CUDA
kernels at import, and ``Generator.forward`` calls ``.cuda()``).  For
testing we import it with:
  * stub ``utils.op`` providing torch-CPU implementations of
    fused_leaky_relu / upfirdn2d (written here from the spec),
  * a stub ``torchvision`` (only needed by the dead Vgg19 class),
  * ``Tensor.cuda`` patched to a no-op.

This gives a bit-faithful float32 oracle of the published semantics to
validate our JAX model and the checkpoint porter against.
"""

import math
import sys
import types

import torch
import torch.nn.functional as F

REFERENCE_PATH = "/root/reference"


def fused_leaky_relu_torch(x, bias=None, negative_slope=0.2,
                           scale=math.sqrt(2)):
    if bias is not None:
        shape = [1, bias.shape[0]] + [1] * (x.ndim - 2)
        x = x + bias.view(*shape)
    return F.leaky_relu(x, negative_slope) * scale


class FusedLeakyReLUTorch(torch.nn.Module):
    def __init__(self, channel, negative_slope=0.2, scale=math.sqrt(2)):
        super().__init__()
        self.bias = torch.nn.Parameter(torch.zeros(channel))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, x):
        return fused_leaky_relu_torch(x, self.bias, self.negative_slope,
                                      self.scale)


def upfirdn2d_torch(x, kernel, up=1, down=1, pad=(0, 0)):
    """CPU upfirdn2d: zero-stuff, pad (neg=crop), convolve, decimate."""
    b, c, h, w = x.shape
    x = x.reshape(b * c, 1, h, w)
    if up > 1:
        z = x.new_zeros(b * c, 1, h * up, w * up)
        z[:, :, ::up, ::up] = x
        x = z
    p0, p1 = pad
    x = F.pad(x, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
    if p0 < 0 or p1 < 0:
        x = x[:, :, max(-p0, 0): x.shape[2] - max(-p1, 0),
              max(-p0, 0): x.shape[3] - max(-p1, 0)]
    kf = torch.flip(kernel, (0, 1)).reshape(1, 1, *kernel.shape)
    x = F.conv2d(x, kf.to(x.dtype))
    x = x[:, :, ::down, ::down]
    return x.reshape(b, c, x.shape[2], x.shape[3])


def load_reference_module():
    if "model_spatial_query" in sys.modules:
        return sys.modules["model_spatial_query"]

    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tv.models)

    op = types.ModuleType("utils.op")
    op.fused_leaky_relu = fused_leaky_relu_torch
    op.FusedLeakyReLU = FusedLeakyReLUTorch
    op.upfirdn2d = upfirdn2d_torch
    u = types.ModuleType("utils")
    u.op = op
    sys.modules["utils"] = u
    sys.modules["utils.op"] = op

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import model_spatial_query  # noqa: E402
    return model_spatial_query
