"""Functional torchvision-primitive stub for twin runs.

This environment has no torchvision, so the twin harness historically stubbed
it with inert placeholders (``reference_twin._install_stubs``) — which kept
the reference's whole vendored image stack
(``/root/reference/health_multimodal/image/**``, ``DataRetrieval.py``)
un-executable as twin ground truth.  This module provides *functional*,
independently-written implementations of exactly the torchvision primitives
the reference imports:

* ``torchvision.models.resnet`` — the torchvision-v1.5 ``ResNet`` base class
  (stride on the bottleneck's 3x3 conv, ``replace_stride_with_dilation``
  support) plus ``BasicBlock``/``Bottleneck``/``model_urls``, so the vendored
  ``ResNetHIML`` (``health_multimodal/image/model/resnet.py:15-47``) can
  subclass and run it;
* ``torchvision.transforms`` — PIL-backed ``Resize``/``CenterCrop``/
  ``ToTensor``/``ToPILImage``/``Compose``/``Normalize`` with the exact
  geometry semantics parity depends on;
* ``torchvision.io.read_image`` / ``torchvision.utils.make_grid``.

Everything here is written from torchvision's *documented semantics* (and
from the geometry facts this repo measured in round 2), not copied from
torchvision.  Semantics pinned because parity hangs on them:

* ``Resize(int)`` computes the long side with ``int()`` truncation, NOT
  ``round()``, and short-circuits when the short side already equals the
  target (torchvision ``functional.resize``);
* ``CenterCrop`` uses ``int(round((in - out) / 2.))`` margins and zero-pads
  through PIL's out-of-bounds crop when the crop is larger than the image;
* ``read_image`` returns uint8 CHW with a 1-channel dim for grayscale files
  (the CheXpert case the reference pipeline is built around).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn

# ----------------------------------------------------------------------
# models.resnet — torchvision-v1.5 semantics
# ----------------------------------------------------------------------
model_urls = {
    "resnet18": "stub://resnet18",
    "resnet50": "stub://resnet50",
}


def _conv3x3(cin, cout, stride=1, dilation=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=dilation,
                     dilation=dilation, bias=False)


def _conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                 base_width=64, dilation=1, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        if groups != 1 or base_width != 64:
            raise ValueError("BasicBlock only supports groups=1, base_width=64")
        if dilation > 1:
            raise NotImplementedError("dilation > 1 not supported in BasicBlock")
        self.conv1 = _conv3x3(inplanes, planes, stride)
        self.bn1 = norm_layer(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = _conv3x3(planes, planes)
        self.bn2 = norm_layer(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    # v1.5: stride lives on the 3x3 conv
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                 base_width=64, dilation=1, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = _conv1x1(inplanes, width)
        self.bn1 = norm_layer(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=dilation,
                               dilation=dilation, groups=groups, bias=False)
        self.bn2 = norm_layer(width)
        self.conv3 = _conv1x1(width, planes * self.expansion)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000, zero_init_residual=False,
                 groups=1, width_per_group=64, replace_stride_with_dilation=None,
                 norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self._norm_layer = norm_layer
        self.inplanes = 64
        self.dilation = 1
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        if len(replace_stride_with_dilation) != 3:
            raise ValueError(
                "replace_stride_with_dilation should be None or a 3-element "
                f"tuple, got {replace_stride_with_dilation}")
        self.groups = groups
        self.base_width = width_per_group
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2,
                                       dilate=replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2,
                                       dilate=replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2,
                                       dilate=replace_stride_with_dilation[2])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
            elif isinstance(m, (nn.BatchNorm2d, nn.GroupNorm)):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)
        if zero_init_residual:
            for m in self.modules():
                if isinstance(m, Bottleneck):
                    nn.init.constant_(m.bn3.weight, 0)
                elif isinstance(m, BasicBlock):
                    nn.init.constant_(m.bn2.weight, 0)

    def _make_layer(self, block, planes, blocks, stride=1, dilate=False):
        norm_layer = self._norm_layer
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * block.expansion, stride),
                norm_layer(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample, self.groups,
                        self.base_width, previous_dilation, norm_layer)]
        self.inplanes = planes * block.expansion
        layers += [
            block(self.inplanes, planes, groups=self.groups,
                  base_width=self.base_width, dilation=self.dilation,
                  norm_layer=norm_layer)
            for _ in range(1, blocks)
        ]
        return nn.Sequential(*layers)

    def _forward_impl(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)

    def forward(self, x):
        return self._forward_impl(x)


_ARCH_SPECS = {
    "resnet18": (BasicBlock, [2, 2, 2, 2]),
    "resnet50": (Bottleneck, [3, 4, 6, 3]),
}


def fake_load_state_dict_from_url(url, progress=True, **kwargs):
    """Deterministic stand-in for ``torch.hub.load_state_dict_from_url`` on
    the stub ``model_urls`` (no egress in this environment): returns the
    state dict of a freshly seeded stub ResNet of the requested arch, leaving
    the caller's RNG stream untouched (``fork_rng``) so the surrounding
    ``torch.manual_seed`` still pins the projector init."""
    arch = url.rsplit("/", 1)[-1].replace("stub://", "")
    if arch not in _ARCH_SPECS:
        raise ValueError(f"fake pretrained weights: unknown arch {url!r}")
    block, layers = _ARCH_SPECS[arch]
    with torch.random.fork_rng():
        torch.manual_seed(sum(map(ord, arch)))
        model = ResNet(block, layers)
    return model.state_dict()


# ----------------------------------------------------------------------
# transforms — PIL-backed, classic torchvision geometry
# ----------------------------------------------------------------------
class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Resize:
    """Short-side resize to ``size`` (int), PIL bilinear; the long side is
    ``int(size * long / short)`` — int() truncation, torchvision's math."""

    def __init__(self, size, interpolation=None, max_size=None, antialias=None):
        if not isinstance(size, int):
            raise NotImplementedError("twin stub: only Resize(int) is used")
        self.size = size
        self.max_size = max_size

    def __call__(self, img):
        from PIL import Image

        w, h = img.size
        size = self.size
        if (w <= h and w == size) or (h <= w and h == size):
            return img
        if w < h:
            ow, oh = size, int(size * h / w)
        else:
            ow, oh = int(size * w / h), size
        return img.resize((ow, oh), Image.BILINEAR)


class CenterCrop:
    def __init__(self, size):
        if isinstance(size, int):
            size = (size, size)
        self.size = tuple(size)

    def __call__(self, img):
        from PIL import Image

        ch, cw = self.size
        w, h = img.size
        if cw > w or ch > h:
            # torchvision pads FIRST with a floor-left/top, ceil-right/bottom
            # split, then crops — one pixel different from a centered
            # out-of-bounds PIL crop when the difference is odd (round()
            # would put the extra zero row on top; torchvision puts it on
            # the bottom)
            pl = (cw - w) // 2 if cw > w else 0
            pr = (cw - w + 1) // 2 if cw > w else 0
            pt = (ch - h) // 2 if ch > h else 0
            pb = (ch - h + 1) // 2 if ch > h else 0
            padded = Image.new(img.mode, (w + pl + pr, h + pt + pb), 0)
            padded.paste(img, (pl, pt))
            img = padded
            w, h = img.size
        top = int(round((h - ch) / 2.0))
        left = int(round((w - cw) / 2.0))
        return img.crop((left, top, left + cw, top + ch))


class ToTensor:
    def __call__(self, img):
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[None]
        else:
            arr = arr.transpose(2, 0, 1)
        return torch.from_numpy(arr.astype(np.float32) / 255.0)


class ToPILImage:
    def __call__(self, tensor):
        from PIL import Image

        arr = tensor.numpy() if isinstance(tensor, torch.Tensor) else np.asarray(tensor)
        if arr.dtype != np.uint8:
            raise NotImplementedError("twin stub: only uint8 CHW input is used")
        if arr.ndim == 3 and arr.shape[0] == 1:
            return Image.fromarray(arr[0], mode="L")
        if arr.ndim == 3 and arr.shape[0] == 3:
            return Image.fromarray(arr.transpose(1, 2, 0), mode="RGB")
        raise ValueError(f"unexpected image tensor shape {arr.shape}")


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = list(mean)
        self.std = list(std)

    def __call__(self, tensor):
        mean = torch.as_tensor(self.mean, dtype=tensor.dtype).view(-1, 1, 1)
        std = torch.as_tensor(self.std, dtype=tensor.dtype).view(-1, 1, 1)
        return (tensor - mean) / std


# ----------------------------------------------------------------------
# io / utils
# ----------------------------------------------------------------------
def read_image(path):
    """uint8 CHW; grayscale files keep a 1-channel dim (torchvision
    ``io.read_image`` on CheXpert PNG/JPEG).  Falls back to a dummy image
    when the path does not exist — the Trainer twins exercise the epoch-1
    pre-rendered-PNG re-log (Trainer.py:1118-1122) with a writer whose
    log_dir is None, exactly like the previous inert stub did."""
    from PIL import Image

    try:
        img = Image.open(path)
    except (FileNotFoundError, OSError, TypeError, ValueError):
        return torch.zeros((3, 4, 4), dtype=torch.uint8)
    if img.mode == "P":
        img = img.convert("RGB")
    if img.mode not in ("L", "RGB"):
        img = img.convert("L" if img.mode in ("1", "I", "I;16", "F") else "RGB")
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[None]
    else:
        arr = arr.transpose(2, 0, 1)
    return torch.from_numpy(np.ascontiguousarray(arr))


def make_grid(x, **kwargs):
    return x


def download_url(*args, **kwargs):  # torchvision.datasets.utils
    raise RuntimeError("twin stub: no network egress; download_url must not be called")


# ----------------------------------------------------------------------
# sys.modules installer
# ----------------------------------------------------------------------
def _module(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real (loader-less) spec so importlib.util.find_spec probes don't raise
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def install() -> None:
    """Register the functional torchvision stub in ``sys.modules`` (no-op if
    a torchvision is already registered)."""
    if "torchvision" in sys.modules:
        return
    tv = _module("torchvision")
    tv_io = _module("torchvision.io")
    tv_io.read_image = read_image
    tv_utils = _module("torchvision.utils")
    tv_utils.make_grid = make_grid
    tv_tf = _module("torchvision.transforms")
    for cls in (Compose, Resize, CenterCrop, ToTensor, ToPILImage, Normalize):
        setattr(tv_tf, cls.__name__, cls)
    tv_models = _module("torchvision.models")
    tv_resnet = _module("torchvision.models.resnet")
    tv_resnet.ResNet = ResNet
    tv_resnet.BasicBlock = BasicBlock
    tv_resnet.Bottleneck = Bottleneck
    tv_resnet.model_urls = model_urls
    tv_models.resnet = tv_resnet
    tv_datasets = _module("torchvision.datasets")
    tv_ds_utils = _module("torchvision.datasets.utils")
    tv_ds_utils.download_url = download_url
    tv_datasets.utils = tv_ds_utils
    tv.io, tv.utils, tv.transforms, tv.models, tv.datasets = (
        tv_io, tv_utils, tv_tf, tv_models, tv_datasets)
    for mod in (tv, tv_io, tv_utils, tv_tf, tv_models, tv_resnet, tv_datasets,
                tv_ds_utils):
        sys.modules[mod.__name__] = mod
