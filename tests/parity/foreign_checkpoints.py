"""Foreign-structured EfficientNet checkpoints — TEST-ONLY fixtures.

The remap/convert stack exists to ingest checkpoints this repo did NOT
author (the reference's production ``efficientnet.pt``,
reference: scripts/build_feature_bucket.py:375-448, release_artifact.py:35).
No real checkpoint is downloadable in this environment, so these builders
reconstruct the two public module hierarchies seen in the wild — key names
arise from genuine module nesting, never from this repo's remap tables, and
each model's ``forward`` is an independent torch execution to diff the
converted Flax model against:

- ``build_torchvision_b0``: ``torchvision.models.efficientnet_b0``'s
  layout — ``features`` Sequential of Conv2dNormActivation / MBConv
  (whose ``block`` Sequential shifts by one when there is no expand
  conv), SE as ``fc1``/``fc2``, ``classifier`` head, symmetric
  ``(k-1)//2`` padding, torch-default BN eps 1e-5.
- ``build_lukemelas_b0``: lukemelas/EfficientNet-PyTorch's layout (the
  pyspacer lineage the reference actually ships) — ``_conv_stem`` /
  ``_blocks.N._expand_conv`` / ``_se_reduce`` / ... attribute naming,
  TF-SAME **static asymmetric** padding (computed here from the published
  formula, independently of the package's ``conv_padding``), BN eps 1e-3,
  and ``_fc`` as the 1280->feature_dim projection (the reference's
  4096-dim contract, reference: settings.py:7-8).

Never imported by the shipped package.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

# B0 geometry, restated here independently of the package config:
# (expand_ratio, out_channels, repeats, first_stride, kernel).
_B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)
_STEM_CH = 32
_HEAD_CH = 1280


def randomize_weights(model: nn.Module, seed: int = 0) -> None:
    """Small random conv/linear weights + non-trivial BN running stats, so
    activations stay O(1) through 16 blocks and every BN fold is exercised
    with real statistics.

    Two knobs keep the forward INPUT-SENSITIVE (measured; without them the
    features are bias-dominated constants — std-across-inputs ~7e-8 against
    mean-abs ~0.09 — and a forward diff stops exercising input propagation:
    crop geometry, padding, and normalization would all be unpinned):

    - SE gate biases are pushed positive: with near-zero random weights
      every SE sigmoid sits at 0.5 and 16 blocks multiply the signal by
      2^-16; sigmoid(2.5)~0.92 per block keeps the gates open.
    - Conv weight std is 1.3x Xavier: SiLU's small-signal gain is ~0.5, so
      unit-gain convs still damp the input component ~2x per activation;
      1.3x restores end-to-end sensitivity to O(0.5) on O(5) features
      while keeping activations <25 (float32-safe for the 1e-4 MAE gate).
      1.5x already explodes to O(1e3) — this sits below the blowup knee.
    """
    gain = 1.3
    gen = torch.Generator().manual_seed(seed)
    se_gate_suffixes = ("fc2", "_se_expand")  # torchvision / lukemelas
    with torch.no_grad():
        for name, mod in model.named_modules():
            if isinstance(mod, (nn.Conv2d, nn.Linear)):
                fan_in = mod.weight[0].numel()
                mod.weight.normal_(0.0, gain * fan_in ** -0.5, generator=gen)
                if mod.bias is not None:
                    if name.endswith(se_gate_suffixes):
                        mod.bias.normal_(2.5, 0.2, generator=gen)
                    else:
                        mod.bias.normal_(0.0, 0.01, generator=gen)
            elif isinstance(mod, nn.BatchNorm2d):
                mod.weight.uniform_(0.8, 1.2, generator=gen)
                mod.bias.normal_(0.0, 0.1, generator=gen)
                mod.running_mean.normal_(0.0, 0.1, generator=gen)
                mod.running_var.uniform_(0.75, 1.25, generator=gen)


# ---------------------------------------------------------------------------
# torchvision layout
# ---------------------------------------------------------------------------


class _TVConvNormAct(nn.Sequential):
    """torchvision.ops.Conv2dNormActivation: [conv, bn, act] Sequential."""

    def __init__(self, in_ch, out_ch, kernel, stride=1, groups=1,
                 act=True, bn_eps=1e-5):
        layers = [
            nn.Conv2d(in_ch, out_ch, kernel, stride=stride,
                      padding=(kernel - 1) // 2, groups=groups, bias=False),
            nn.BatchNorm2d(out_ch, eps=bn_eps),
        ]
        if act:
            layers.append(nn.SiLU(inplace=False))
        super().__init__(*layers)


class _TVSqueezeExcitation(nn.Module):
    """torchvision.ops.SqueezeExcitation: avgpool -> fc1 -> SiLU -> fc2 ->
    sigmoid scale, with fc1/fc2 as 1x1 convs."""

    def __init__(self, channels, squeeze_channels):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(channels, squeeze_channels, 1)
        self.fc2 = nn.Conv2d(squeeze_channels, channels, 1)
        self.activation = nn.SiLU(inplace=False)
        self.scale_activation = nn.Sigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.activation(self.fc1(s))
        return x * self.scale_activation(self.fc2(s))


class _TVMBConv(nn.Module):
    """torchvision MBConv: sub-layers in a ``block`` Sequential whose
    indices shift by one when expand_ratio == 1 (no expand conv)."""

    def __init__(self, in_ch, out_ch, expand, kernel, stride, bn_eps=1e-5):
        super().__init__()
        mid = in_ch * expand
        layers = []
        if expand != 1:
            layers.append(_TVConvNormAct(in_ch, mid, 1, bn_eps=bn_eps))
        layers.append(_TVConvNormAct(mid, mid, kernel, stride=stride,
                                     groups=mid, bn_eps=bn_eps))
        # torchvision squeezes relative to the block INPUT channels, /4.
        layers.append(_TVSqueezeExcitation(mid, max(1, in_ch // 4)))
        layers.append(_TVConvNormAct(mid, out_ch, 1, act=False,
                                     bn_eps=bn_eps))
        self.block = nn.Sequential(*layers)
        self.use_res_connect = stride == 1 and in_ch == out_ch

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res_connect else y


class TorchvisionEfficientNetB0(nn.Module):
    """State_dict-compatible stand-in for torchvision's efficientnet_b0.

    ``forward`` returns the POOLED 1280-dim trunk features (the tensor the
    feature-extraction contract cares about); the ImageNet ``classifier``
    exists so its keys appear in the state_dict exactly as a real download's
    would (the remap must drop them)."""

    def __init__(self, bn_eps=1e-5, num_classes=1000):
        super().__init__()
        stages: list[nn.Module] = [
            _TVConvNormAct(3, _STEM_CH, 3, stride=2, bn_eps=bn_eps)
        ]
        in_ch = _STEM_CH
        for expand, out_ch, repeats, stride, kernel in _B0_STAGES:
            blocks = []
            for block_idx in range(repeats):
                blocks.append(_TVMBConv(
                    in_ch, out_ch, expand, kernel,
                    stride if block_idx == 0 else 1, bn_eps=bn_eps,
                ))
                in_ch = out_ch
            stages.append(nn.Sequential(*blocks))
        stages.append(_TVConvNormAct(in_ch, _HEAD_CH, 1, bn_eps=bn_eps))
        self.features = nn.Sequential(*stages)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(
            nn.Dropout(p=0.2), nn.Linear(_HEAD_CH, num_classes)
        )

    def forward(self, x):  # (N, 3, H, W) -> (N, 1280) pooled features
        x = self.features(x)
        return torch.flatten(self.avgpool(x), 1)


def build_torchvision_b0(seed: int = 0, bn_eps: float = 1e-5):
    model = TorchvisionEfficientNetB0(bn_eps=bn_eps)
    randomize_weights(model, seed=seed)
    model.eval()
    return model


# ---------------------------------------------------------------------------
# lukemelas / EfficientNet-PyTorch layout (pyspacer lineage)
# ---------------------------------------------------------------------------


class _LMConv2dStaticSamePadding(nn.Conv2d):
    """lukemelas Conv2dStaticSamePadding: an nn.Conv2d with padding=0 plus
    a ZeroPad2d child applying TF-SAME pads computed from a fixed image
    size (asymmetric at stride-2 even sizes). The pad formula below is the
    published one, written independently of the package's conv_padding."""

    def __init__(self, in_ch, out_ch, kernel, image_size, stride=1,
                 groups=1, bias=True):
        super().__init__(in_ch, out_ch, kernel, stride=stride,
                         groups=groups, bias=bias, padding=0)
        ih = iw = image_size
        kh = kw = kernel
        oh, ow = -(-ih // stride), -(-iw // stride)
        pad_h = max((oh - 1) * stride + kh - ih, 0)
        pad_w = max((ow - 1) * stride + kw - iw, 0)
        self.static_padding = nn.ZeroPad2d(
            (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2)
        )

    def forward(self, x):
        x = self.static_padding(x)
        return F.conv2d(x, self.weight, self.bias, self.stride,
                        self.padding, self.dilation, self.groups)


class _LMMBConvBlock(nn.Module):
    def __init__(self, in_ch, out_ch, expand, kernel, stride, image_size,
                 bn_eps=1e-3):
        super().__init__()
        mid = in_ch * expand
        self.has_expand = expand != 1
        if self.has_expand:
            self._expand_conv = _LMConv2dStaticSamePadding(
                in_ch, mid, 1, image_size, bias=False)
            self._bn0 = nn.BatchNorm2d(mid, eps=bn_eps)
        self._depthwise_conv = _LMConv2dStaticSamePadding(
            mid, mid, kernel, image_size, stride=stride, groups=mid,
            bias=False)
        self._bn1 = nn.BatchNorm2d(mid, eps=bn_eps)
        se_ch = max(1, int(in_ch * 0.25))
        self._se_reduce = _LMConv2dStaticSamePadding(mid, se_ch, 1, 1)
        self._se_expand = _LMConv2dStaticSamePadding(se_ch, mid, 1, 1)
        self._project_conv = _LMConv2dStaticSamePadding(
            mid, out_ch, 1, -(-image_size // stride), bias=False)
        self._bn2 = nn.BatchNorm2d(out_ch, eps=bn_eps)
        self._id_skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        inp = x
        if self.has_expand:
            x = F.silu(self._bn0(self._expand_conv(x)))
        x = F.silu(self._bn1(self._depthwise_conv(x)))
        s = F.adaptive_avg_pool2d(x, 1)
        s = self._se_expand(F.silu(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self._id_skip:
            x = x + inp
        return x


class LukemelasEfficientNetB0(nn.Module):
    """State_dict-compatible stand-in for lukemelas EfficientNet-B0 as the
    pyspacer lineage ships it, with ``_fc`` as the 1280 -> ``feature_dim``
    projection (the 4096-dim feature contract)."""

    def __init__(self, feature_dim=4096, image_size=224, bn_eps=1e-3):
        super().__init__()
        self._conv_stem = _LMConv2dStaticSamePadding(
            3, _STEM_CH, 3, image_size, stride=2, bias=False)
        self._bn0 = nn.BatchNorm2d(_STEM_CH, eps=bn_eps)
        size = -(-image_size // 2)
        blocks = []
        in_ch = _STEM_CH
        for expand, out_ch, repeats, stride, kernel in _B0_STAGES:
            for block_idx in range(repeats):
                s = stride if block_idx == 0 else 1
                blocks.append(_LMMBConvBlock(
                    in_ch, out_ch, expand, kernel, s, size, bn_eps=bn_eps))
                size = -(-size // s)
                in_ch = out_ch
        self._blocks = nn.ModuleList(blocks)
        self._conv_head = _LMConv2dStaticSamePadding(
            in_ch, _HEAD_CH, 1, size, bias=False)
        self._bn1 = nn.BatchNorm2d(_HEAD_CH, eps=bn_eps)
        self._avg_pooling = nn.AdaptiveAvgPool2d(1)
        self._fc = nn.Linear(_HEAD_CH, feature_dim)

    def forward(self, x):  # (N, 3, H, W) -> (N, feature_dim)
        x = F.silu(self._bn0(self._conv_stem(x)))
        for block in self._blocks:
            x = block(x)
        x = F.silu(self._bn1(self._conv_head(x)))
        x = torch.flatten(self._avg_pooling(x), 1)
        return self._fc(x)


def build_lukemelas_b0(seed: int = 0, feature_dim: int = 4096,
                       image_size: int = 224):
    model = LukemelasEfficientNetB0(
        feature_dim=feature_dim, image_size=image_size)
    randomize_weights(model, seed=seed)
    model.eval()
    return model


# ---------------------------------------------------------------------------
# pyspacer-vendored extractor oracle (the production ``efficientnet.pt``
# lineage, reconstructed from pyspacer 0.14.0's source so the ONLY untested
# delta vs the real release is the literal weight values)
# ---------------------------------------------------------------------------
#
# The reference extracts features through ``spacer.extractors.
# EfficientNetExtractor`` (reference: scripts/build_feature_bucket.py:
# 375-448): its ``load_weights`` reads a checkpoint CoralNet trained under
# ``nn.DataParallel`` — a dict whose ``'net'`` entry holds the state_dict
# with every key carrying the ``module.`` wrapper prefix — strips the
# prefix, and loads into the vendored lukemelas-lineage EfficientNet; its
# ``patches_to_features`` runs each PIL patch through
# ``spacer.extractors.torch_extractors.transformation()`` (torchvision
# ``ToTensor`` + ImageNet ``Normalize``) and stacks fixed-size batches.
# Patches are cropped by pyspacer's ``crop_patches``: the image is expanded
# by a crop_size-wide ZERO border (``ImageOps.expand``), then
# ``crop_simple`` takes upper/left = int(center - crop_size/2) in the
# expanded frame. Everything below restates those semantics independently
# (torchvision is not installed in this image; the two-op transform is
# written out on numpy with the documented equivalence).

#: ImageNet statistics used by pyspacer's ``transformation()``.
PYSPACER_MEAN_RGB = (0.485, 0.456, 0.406)
PYSPACER_STD_RGB = (0.229, 0.224, 0.225)
#: pyspacer TorchExtractor.BATCH_SIZE.
PYSPACER_BATCH_SIZE = 10


def save_pyspacer_efficientnet_pt(model: nn.Module, path) -> None:
    """Write ``model`` to disk in the EXACT on-disk shape of the production
    ``efficientnet.pt``: ``{'net': {'module.<key>': tensor}}`` — the
    checkpoint dict CoralNet's DataParallel training loop saves and
    pyspacer's ``load_weights`` expects."""
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    torch.save({"net": sd}, path)


def pyspacer_load_efficientnet(path, feature_dim: int = 4096,
                               image_size: int = 224) -> nn.Module:
    """pyspacer 0.14.0 ``load_weights`` semantics: ``torch.load`` the
    checkpoint dict, take its ``'net'`` state_dict, strip the DataParallel
    ``module.`` prefix from every key, load strictly into a fresh untrained
    net, eval()."""
    payload = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = {
        k.replace("module.", ""): v for k, v in payload["net"].items()
    }
    net = LukemelasEfficientNetB0(
        feature_dim=feature_dim, image_size=image_size)
    net.load_state_dict(state_dict, strict=True)
    net.eval()
    return net


def pyspacer_transformation(patch) -> torch.Tensor:
    """``transformation()`` from pyspacer's torch_extractors: torchvision
    ``ToTensor()`` (HWC uint8 PIL -> CHW float32 / 255) followed by
    ``Normalize(mean, std)`` ((x - mean) / std per channel). torchvision is
    not installed in this image, so the two ops are restated on numpy —
    bit-equivalent for uint8 RGB input."""
    import numpy as np

    arr = np.asarray(patch, dtype=np.float32) / 255.0  # ToTensor
    arr = np.transpose(arr, (2, 0, 1))                  # HWC -> CHW
    mean = np.asarray(PYSPACER_MEAN_RGB, np.float32).reshape(3, 1, 1)
    std = np.asarray(PYSPACER_STD_RGB, np.float32).reshape(3, 1, 1)
    return torch.from_numpy((arr - mean) / std)


def pyspacer_crop_simple(im, center, crop_size: int):
    """pyspacer ``crop_simple``: upper/left = int(center - crop_size / 2)
    in PIL (col=x, row=y) box order."""
    upper = int(center[0] - crop_size / 2)
    left = int(center[1] - crop_size / 2)
    return im.crop((left, upper, left + crop_size, upper + crop_size))


def pyspacer_crop_patches(im, rowcols, crop_size: int = 224) -> list:
    """pyspacer ``crop_patches``: convert to RGB, expand the image with a
    crop_size-wide ZERO border on every side, then crop around each
    (row + pad, col + pad) center. For point r the crop covers original
    rows [r - crop_size//2, r + crop_size//2) — identical geometry to this
    repo's centered-pad gather (ops/patch_ops.py)."""
    from PIL import ImageOps

    if im.mode != "RGB":
        im = im.convert("RGB")
    pad = crop_size
    expanded = ImageOps.expand(im, pad)
    return [
        pyspacer_crop_simple(expanded, (row + pad, col + pad), crop_size)
        for row, col in rowcols
    ]


class PyspacerExtractorOracle:
    """The pyspacer ``EfficientNetExtractor`` pipeline end to end, as an
    independent torch oracle: production checkpoint container -> prefix
    strip -> vendored-net load -> crop_patches -> transformation ->
    fixed-size batched forward. Diffing this repo's FeatureExtractor
    against it proves every pipeline stage except the literal weight
    values (which are unreachable in this environment —
    docs/release_fidelity_runbook.md)."""

    def __init__(self, weights_path, feature_dim: int = 4096,
                 crop_size: int = 224,
                 batch_size: int = PYSPACER_BATCH_SIZE):
        self.net = pyspacer_load_efficientnet(
            weights_path, feature_dim=feature_dim, image_size=crop_size)
        self.crop_size = crop_size
        self.batch_size = batch_size

    def patches_to_features(self, patch_list) -> list:
        feats: list = []
        bs = self.batch_size
        for b in range(0, len(patch_list), bs):
            batch = torch.stack(
                [pyspacer_transformation(p) for p in patch_list[b:b + bs]]
            )
            with torch.no_grad():
                out = self.net(batch)
            feats.extend(out.detach().cpu().tolist())
        return feats

    def extract_features(self, im, rowcols):
        """Image + point list -> per-point feature rows (the reference's
        per-image contract, build_feature_bucket.py:415-446)."""
        patches = pyspacer_crop_patches(im, rowcols, self.crop_size)
        return self.patches_to_features(patches)
