"""DeepLabV3 / DeepLabV3+ segmentation family (reference
encoder_inversion/models/DeepLabV3Plus/network/{_deeplab.py, modeling.py} —
vendored in the reference, unused by any shipped path; provided for inventory).

Covers the canonical ResNet-backbone variants (deeplabv3_resnet50/101,
deeplabv3plus_resnet50/101) with torchvision output-stride dilation and the
ASPP / heads / atrous-separable-conv utilities. The reference additionally
vendors hrnet/xception/mobilenet backbones; those are pretrained-checkpoint
shims with no caller anywhere in the repo and are out of scope here.

NHWC; torch parameter names (`backbone.conv1`, `classifier.aspp.convs.0.0`, …)
so checkpoints import via `utils.torch_import`.
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..losses.moco import Bottleneck, _Layer, _max_pool_3x3s2p1
from ..ops.resize import resize_bilinear
from .encoders.irse import BatchNorm, Conv2d


class _ConvBNReLU(nn.Module):
    """Sequential(conv '0', bn '1', relu) with torch child names."""

    in_ch: int
    out_ch: int
    kernel: int = 1
    padding: int = 0
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.in_ch, self.out_ch, self.kernel, padding=self.padding,
                   dilation=self.dilation, use_bias=False, name="0")(x)
        return jax.nn.relu(BatchNorm(self.out_ch, name="1")(x, train))


class ASPPPooling(nn.Module):
    """_deeplab.py:120-131: global pool -> 1x1 conv -> upsample."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        p = jnp.mean(x, axis=(1, 2), keepdims=True)
        p = Conv2d(self.in_ch, self.out_ch, 1, padding=0, use_bias=False, name="1")(p)
        p = jax.nn.relu(BatchNorm(self.out_ch, name="2")(p, train))
        return jnp.broadcast_to(p, (x.shape[0], *size, self.out_ch))


class ASPP(nn.Module):
    """_deeplab.py:133-163: 1x1 + three atrous 3x3 + image pooling -> project."""

    in_ch: int
    atrous_rates: Sequence[int]
    out_ch: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        class _Convs(nn.Module):
            in_ch: int
            out_ch: int
            rates: Sequence[int]

            @nn.compact
            def __call__(self, x, train):
                res = [_ConvBNReLU(self.in_ch, self.out_ch, 1, name="0")(x, train)]
                for i, rate in enumerate(self.rates):
                    res.append(
                        _ConvBNReLU(self.in_ch, self.out_ch, 3, padding=rate,
                                    dilation=rate, name=str(i + 1))(x, train)
                    )
                res.append(ASPPPooling(self.in_ch, self.out_ch, name=str(len(self.rates) + 1))(x, train))
                return res

        res = _Convs(self.in_ch, self.out_ch, tuple(self.atrous_rates), name="convs")(x, train)
        cat = jnp.concatenate(res, axis=-1)
        # project: conv/bn/relu (+ dropout, identity at inference)
        return _ConvBNReLU(5 * self.out_ch, self.out_ch, 1, name="project")(cat, train)


class AtrousSeparableConvolution(nn.Module):
    """_deeplab.py:85-107: depthwise atrous conv + pointwise conv."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        class _Body(nn.Module):
            cfg: tuple

            @nn.compact
            def __call__(self, x):
                in_ch, out_ch, k, s, p, d, b = self.cfg
                x = Conv2d(in_ch, in_ch, k, stride=s, padding=p, dilation=d,
                           groups=in_ch, use_bias=b, name="0")(x)
                return Conv2d(in_ch, out_ch, 1, padding=0, use_bias=b, name="1")(x)

        return _Body(
            (self.in_ch, self.out_ch, self.kernel, self.stride, self.padding,
             self.dilation, self.use_bias),
            name="body",
        )(x)


class DeepLabHeadV3Plus(nn.Module):
    """_deeplab.py:28-60: low-level projection + ASPP + fused classifier."""

    in_channels: int
    low_level_channels: int
    num_classes: int
    aspp_dilate: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, feature: Dict[str, jnp.ndarray], train: bool = False):
        low = _ConvBNReLU(self.low_level_channels, 48, 1, name="project")(
            feature["low_level"], train
        )
        out = ASPP(self.in_channels, self.aspp_dilate, name="aspp")(feature["out"], train)
        out = resize_bilinear(out, low.shape[1:3])

        class _Classifier(nn.Module):
            num_classes: int

            @nn.compact
            def __call__(self, x, train):
                x = Conv2d(304, 256, 3, padding=1, use_bias=False, name="0")(x)
                x = jax.nn.relu(BatchNorm(256, name="1")(x, train))
                return Conv2d(256, self.num_classes, 1, padding=0, name="3")(x)

        return _Classifier(self.num_classes, name="classifier")(
            jnp.concatenate([low, out], axis=-1), train
        )


class DeepLabHead(nn.Module):
    """_deeplab.py:62-83."""

    in_channels: int
    num_classes: int
    aspp_dilate: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, feature: Dict[str, jnp.ndarray], train: bool = False):
        class _Classifier(nn.Module):
            in_ch: int
            num_classes: int
            rates: tuple

            @nn.compact
            def __call__(self, x, train):
                x = ASPP(self.in_ch, self.rates, name="0")(x, train)
                x = Conv2d(256, 256, 3, padding=1, use_bias=False, name="1")(x)
                x = jax.nn.relu(BatchNorm(256, name="2")(x, train))
                return Conv2d(256, self.num_classes, 1, padding=0, name="4")(x)

        return _Classifier(self.in_channels, self.num_classes,
                           tuple(self.aspp_dilate), name="classifier")(feature["out"], train)


class ResNetDilatedBackbone(nn.Module):
    """torchvision resnet50/101 trunk with replace_stride_with_dilation,
    returning the IntermediateLayerGetter dict (modeling.py:49-54)."""

    layers: Sequence[int] = (3, 4, 6, 3)  # resnet50; (3, 4, 23, 3) = resnet101
    output_stride: int = 8
    low_level_layer: str = "layer1"  # 'layer2' for the deeplabv3 head

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.output_stride == 8:
            dilate = (False, True, True)
        else:
            dilate = (False, False, False) if self.output_stride == 32 else (False, False, True)

        x = Conv2d(3, 64, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        x = jax.nn.relu(BatchNorm(64, name="bn1")(x, train))
        x = _max_pool_3x3s2p1(x)

        feats = {}
        dilation = 1
        in_ch = 64
        for idx, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if idx == 0 else 2
            first_dilation = dilation
            if idx > 0 and dilate[idx - 1]:
                dilation *= stride
                stride = 1
            x = _Layer(in_ch, planes, blocks, stride, first_dilation=first_dilation,
                       dilation=dilation, name=f"layer{idx + 1}")(x, train)
            in_ch = planes * 4
            feats[f"layer{idx + 1}"] = x
        return {"out": feats["layer4"], "low_level": feats[self.low_level_layer]}


def _upsample2x_align_corners(x):
    """torch nn.UpsamplingBilinear2d(scale_factor=2) == align_corners=True."""
    B, H, W, C = x.shape

    def axis_up(arr, n, axis):
        src = jnp.arange(2 * n, dtype=jnp.float32) * (n - 1) / (2 * n - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        w = (src - lo)[(...,) + (None,) * (arr.ndim - axis - 1)]
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        return a * (1 - w) + b * w

    x = axis_up(x, H, 1)
    return axis_up(x, W, 2)


class _ProjectHead(nn.Module):
    """The reference's modified _SimpleSegmentationModel.project (utils.py:13-19):
    2x up, conv->128, lrelu, 2x up, conv->64 over the low-level feature."""

    in_ch: int = 512  # matches layer2 low-level features (the 'deeplabv3' head)

    @nn.compact
    def __call__(self, x):
        x = _upsample2x_align_corners(x)
        x = Conv2d(self.in_ch, 128, 3, padding=1, use_bias=False, name="1")(x)
        x = jnp.where(x >= 0, x, 0.01 * x)
        x = _upsample2x_align_corners(x)
        return Conv2d(128, 64, 3, padding=1, use_bias=False, name="4")(x)


class DeepLabV3(nn.Module):
    """_SimpleSegmentationModel as modified by the reference (utils.py:7-38):
    returns {'out': upsampled logits, 'low_level': projected feature}. The
    reference hardcodes the project head to 512 input channels, so its
    deeplabv3plus variant (256-ch layer1 low-level) crashes; here the head
    width follows the actual low-level channels."""

    backbone: ResNetDilatedBackbone
    classifier: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        feats = self.backbone(x, train)
        low = _ProjectHead(in_ch=feats["low_level"].shape[-1], name="project")(
            feats["low_level"]
        )
        logits = self.classifier(feats, train)
        return {"out": resize_bilinear(logits, size), "low_level": low}


def _factory(head: str, layers, num_classes: int, output_stride: int) -> DeepLabV3:
    aspp = (12, 24, 36) if output_stride == 8 else (6, 12, 18)
    if head == "deeplabv3plus":
        classifier = DeepLabHeadV3Plus(2048, 256, num_classes, aspp)
        low = "layer1"
    else:
        classifier = DeepLabHead(2048, num_classes, aspp)
        low = "layer2"
    backbone = ResNetDilatedBackbone(layers=layers, output_stride=output_stride,
                                     low_level_layer=low)
    return DeepLabV3(backbone=backbone, classifier=classifier)


def deeplabv3_resnet50(num_classes: int = 21, output_stride: int = 8) -> DeepLabV3:
    return _factory("deeplabv3", (3, 4, 6, 3), num_classes, output_stride)


def deeplabv3_resnet101(num_classes: int = 21, output_stride: int = 8) -> DeepLabV3:
    return _factory("deeplabv3", (3, 4, 23, 3), num_classes, output_stride)


def deeplabv3plus_resnet50(num_classes: int = 21, output_stride: int = 8) -> DeepLabV3:
    return _factory("deeplabv3plus", (3, 4, 6, 3), num_classes, output_stride)


def deeplabv3plus_resnet101(num_classes: int = 21, output_stride: int = 8) -> DeepLabV3:
    return _factory("deeplabv3plus", (3, 4, 23, 3), num_classes, output_stride)
