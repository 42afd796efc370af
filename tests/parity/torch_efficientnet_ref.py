"""Torch mirror of the Flax EfficientNet backbone — TEST-ONLY.

This is the parity oracle for the weight-conversion path: a torch
implementation with the exact same architecture and the canonical state_dict
naming the converter consumes (see models/convert.py docstring). It stands in
for the reference's pretrained ``efficientnet.pt`` (not available in this
environment); when real production weights arrive they are remapped to the
same canonical names and flow through the identical converter.

Never imported by the shipped package — torch stays a test-only dependency
(the compute path is jax/XLA/Pallas).
"""

from __future__ import annotations

import torch
import torch.nn as nn

from mermaid_classifier_tpu.models.efficientnet import (
    BN_EPS,
    EfficientNetConfig,
)


class TorchConvBNAct(nn.Module):
    def __init__(self, in_ch, out_ch, kernel, stride=1, groups=1, act=True,
                 padding_mode="symmetric", bn_eps=BN_EPS):
        super().__init__()
        self.tf_same = padding_mode == "tf_same"
        self.kernel = kernel
        self.stride = stride
        self.conv = nn.Conv2d(
            in_ch,
            out_ch,
            kernel,
            stride=stride,
            padding=0 if self.tf_same else (kernel - 1) // 2,
            groups=groups,
            bias=False,
        )
        self.bn = nn.BatchNorm2d(out_ch, eps=bn_eps)
        self.act = act

    def forward(self, x):
        if self.tf_same:
            from mermaid_classifier_tpu.models.efficientnet import conv_padding

            (top, bottom), (left, right) = conv_padding(
                self.kernel, self.stride, x.shape[2], x.shape[3], "tf_same"
            )
            x = torch.nn.functional.pad(x, (left, right, top, bottom))
        x = self.bn(self.conv(x))
        return torch.nn.functional.silu(x) if self.act else x


class TorchSqueezeExcite(nn.Module):
    def __init__(self, channels, se_channels):
        super().__init__()
        self.reduce = nn.Conv2d(channels, se_channels, 1, bias=True)
        self.expand = nn.Conv2d(se_channels, channels, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.nn.functional.silu(self.reduce(s))
        return x * torch.sigmoid(self.expand(s))


class TorchMBConv(nn.Module):
    def __init__(self, in_ch, out_ch, expand_ratio, kernel, stride, se_ratio,
                 padding_mode="symmetric", bn_eps=BN_EPS):
        super().__init__()
        mid = in_ch * expand_ratio
        self.has_expand = expand_ratio != 1
        if self.has_expand:
            self.expand = TorchConvBNAct(in_ch, mid, 1, bn_eps=bn_eps)
        self.depthwise = TorchConvBNAct(
            mid, mid, kernel, stride=stride, groups=mid,
            padding_mode=padding_mode, bn_eps=bn_eps,
        )
        self.se = TorchSqueezeExcite(mid, max(1, int(in_ch * se_ratio)))
        self.project = TorchConvBNAct(mid, out_ch, 1, act=False, bn_eps=bn_eps)
        self.residual = stride == 1 and in_ch == out_ch

    def forward(self, x):
        inp = x
        if self.has_expand:
            x = self.expand(x)
        x = self.depthwise(x)
        x = self.se(x)
        x = self.project(x)
        if self.residual:
            x = x + inp
        return x


class TorchEfficientNetBackbone(nn.Module):
    """NCHW torch twin of EfficientNetBackbone (NHWC flax)."""

    def __init__(self, config: EfficientNetConfig | None = None):
        super().__init__()
        cfg = config or EfficientNetConfig()
        self.config = cfg
        self.stem = TorchConvBNAct(
            3, cfg.stem_channels, 3, stride=2,
            padding_mode=cfg.padding, bn_eps=cfg.bn_eps,
        )
        in_ch = cfg.stem_channels
        for stage_idx, (expand, out_ch, repeats, stride, kernel) in enumerate(
            cfg.stages
        ):
            for block_idx in range(repeats):
                block = TorchMBConv(
                    in_ch,
                    out_ch,
                    expand,
                    kernel,
                    stride if block_idx == 0 else 1,
                    cfg.se_ratio,
                    padding_mode=cfg.padding,
                    bn_eps=cfg.bn_eps,
                )
                self.add_module(f"stage{stage_idx}_block{block_idx}", block)
                in_ch = out_ch
        self.head = TorchConvBNAct(in_ch, cfg.head_channels, 1,
                                   bn_eps=cfg.bn_eps)
        if cfg.feature_dim != cfg.head_channels:
            self.feature_projection = nn.Linear(cfg.head_channels, cfg.feature_dim)

    def forward(self, x):  # x: (N, 3, H, W)
        x = self.stem(x)
        cfg = self.config
        for stage_idx, (_, _, repeats, _, _) in enumerate(cfg.stages):
            for block_idx in range(repeats):
                x = getattr(self, f"stage{stage_idx}_block{block_idx}")(x)
        x = self.head(x)
        x = x.mean((2, 3))
        if cfg.feature_dim != cfg.head_channels:
            x = self.feature_projection(x)
        return x


def randomize_bn_stats(model: nn.Module, seed: int = 0) -> None:
    """Give BN layers non-trivial running stats so conversion parity actually
    exercises the mean/var mapping."""
    gen = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * 0.1
                )
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=gen) * 0.5 + 0.75
                )
