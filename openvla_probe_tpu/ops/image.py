"""Fused on-device image preprocessing: PIL-parity resample + crop + normalize in one jit.

TPU-native re-design of the reference's host-side torchvision pipeline
(prismatic/extern/hf/processing_prismatic.py:95-145: Resize -> CenterCrop ->
ToTensor -> Normalize per backbone, vstack to 6 channels). Instead of per-image
PIL calls, the resample is expressed as two precomputed weight matrices (one per
spatial axis) so the whole transform is two MXU matmuls + elementwise normalize,
batchable and fusible with the ViT patch-embed downstream.

Parity: weights replicate Pillow's resample exactly (kernel, support scaling
for antialias, window bounds, fixed-point coefficient quantization).
``pil_resize_exact`` (numpy/f64 host path, used where bit-exactness matters)
is bit-identical with Pillow's uint8 output; the f32 on-device path (run at
Precision.HIGHEST) differs by at most 1/255 on a vanishing fraction of pixels
(f32 accumulation vs Pillow's int fixed point at half-boundary roundings) —
see tests/test_image_ops.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Standard normalization constants (timm data-config values for the backbones).
IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)  # DINOv2
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)


# --- PIL-exact resample kernels ---------------------------------------------

def _bicubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """PIL's bicubic kernel (Catmull-Rom-like, a = -0.5; support 2)."""
    x = np.abs(x)
    return np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


def _bilinear(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.maximum(1.0 - x, 0.0)


def _sinc(x: np.ndarray) -> np.ndarray:
    return np.where(x == 0, 1.0, np.sin(np.pi * x) / np.where(x == 0, 1.0, np.pi * x))


def _lanczos3(x: np.ndarray) -> np.ndarray:
    return np.where(np.abs(x) < 3.0, _sinc(x) * _sinc(x / 3.0), 0.0)


def _box(x: np.ndarray) -> np.ndarray:
    return np.where((x > -0.5) | np.isclose(x, -0.5), (x < 0.5).astype(np.float64), 0.0)


_KERNELS = {
    "bicubic": (_bicubic, 2.0),
    "bilinear": (_bilinear, 1.0),
    "lanczos": (_lanczos3, 3.0),
    "box": (_box, 0.5),
}


_PIL_PRECISION_BITS = 32 - 8 - 2  # Pillow's 8-bit fixed-point coefficient precision


@functools.lru_cache(maxsize=256)
def resample_weights(
    in_size: int, out_size: int, method: str = "bicubic", quantize: bool = True
) -> np.ndarray:
    """[out_size, in_size] PIL-semantics resample matrix (antialias on downscale).

    Follows Pillow's precompute_coeffs: per output pixel, window
    [center - support + 0.5, center + support + 0.5) over input pixels, kernel
    evaluated at (x - center + 0.5) / filterscale, normalized to sum 1.

    With ``quantize`` the normalized weights are snapped to Pillow's fixed-point
    grid (round-half-away at 2^22), which makes a float64 two-pass resample with
    per-pass floor(x + 0.5) **bit-exact** with Pillow's 8-bit path: Pillow
    computes clip8((ss + 2^21) >> 22) == floor(ss/2^22 + 1/2) and ss/2^22 is
    exactly representable in f64.
    """
    kernel, base_support = _KERNELS[method]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)  # antialias: widen kernel when downscaling
    support = base_support * filterscale
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        center = (o + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        xs = np.arange(xmin, xmax, dtype=np.float64)
        w = kernel((xs - center + 0.5) / filterscale)
        s = w.sum()
        if s != 0:
            w = w / s
        W[o, xmin:xmax] = w
    if quantize:
        q = float(1 << _PIL_PRECISION_BITS)
        W = np.where(W < 0, np.ceil(W * q - 0.5), np.floor(W * q + 0.5)) / q
    return W


def pil_resize_exact(image: np.ndarray, out_hw: Tuple[int, int], method: str = "bicubic") -> np.ndarray:
    """Host-side numpy resample, bit-exact with Pillow's uint8 path (float64
    accumulation over Pillow-quantized weights, per-pass floor(x+0.5), clip)."""
    h_in, w_in = image.shape[-3], image.shape[-2]
    h_out, w_out = out_hw
    x = image.astype(np.float64)
    if (h_in, w_in) == (h_out, w_out):
        return image.astype(np.uint8)
    Ww = resample_weights(w_in, w_out, method)
    Wh = resample_weights(h_in, h_out, method)
    x = np.einsum("ow,...hwc->...hoc", Ww, x)
    x = np.clip(np.floor(x + 0.5), 0, 255)
    x = np.einsum("oh,...hwc->...owc", Wh, x)
    x = np.clip(np.floor(x + 0.5), 0, 255)
    return x.astype(np.uint8)


def _round_u8(x: jnp.ndarray) -> jnp.ndarray:
    """PIL clip8: clamp + round half up to the uint8 grid (kept in float)."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def pil_resize(
    image: jnp.ndarray,
    out_hw: Tuple[int, int],
    method: str = "bicubic",
    emulate_uint8_rounding: bool = True,
) -> jnp.ndarray:
    """Resize [..., H, W, C] uint8/float image to out_hw with PIL semantics.

    Two dense matmuls (horizontal pass, then vertical pass — Pillow's order),
    with optional inter/post-pass rounding to the uint8 grid for bit-parity.
    Returns float32 in [0, 255].
    """
    # single implementation: the CHW twin (identical per-channel math —
    # contraction + per-pass uint8 rounding are channel-independent)
    x = jnp.moveaxis(image, -1, -3)
    x = pil_resize_chw(x, out_hw, method, emulate_uint8_rounding)
    return jnp.moveaxis(x, -3, -1)


def pil_resize_chw(
    image: jnp.ndarray,
    out_hw: Tuple[int, int],
    method: str = "bicubic",
    emulate_uint8_rounding: bool = True,
) -> jnp.ndarray:
    """Channels-first twin of `pil_resize`: [..., C, H, W] -> [..., C, h, w].

    Same weights, same pass order (horizontal then vertical — Pillow's), same
    per-pass uint8-grid rounding. The layout is the TPU-native one: width stays
    the minor (128-lane) axis through both matmuls, where the HWC layout puts
    C=3 in the lane dimension (3/128 utilization + layout copies — profiled
    ~43 ms for the dual-backbone transform at B=24 vs ~0.5 ms of actual math).
    """
    h_in, w_in = image.shape[-2], image.shape[-1]
    h_out, w_out = out_hw
    x = image.astype(jnp.float32)
    if (h_in, w_in) == (h_out, w_out):
        return x
    Ww = jnp.asarray(resample_weights(w_in, w_out, method), jnp.float32)
    Wh = jnp.asarray(resample_weights(h_in, h_out, method), jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("ow,...hw->...ho", Ww, x, precision=hi)   # [..., H, w_out]
    if emulate_uint8_rounding:
        x = _round_u8(x)
    x = jnp.einsum("oh,...hw->...ow", Wh, x, precision=hi)   # [..., h_out, w_out]
    if emulate_uint8_rounding:
        x = _round_u8(x)
    return x


def _center_crop_chw(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Channels-first center crop (zero-pads first when smaller)."""
    h, w = image.shape[-2], image.shape[-1]
    th, tw = out_hw
    if h < th or w < tw:
        ph, pw = max(th - h, 0), max(tw - w, 0)
        pads = [(0, 0)] * (image.ndim - 2) + [
            (ph // 2, ph - ph // 2),
            (pw // 2, pw - pw // 2),
        ]
        image = jnp.pad(image, pads)
        h, w = image.shape[-2], image.shape[-1]
    top = int(round((h - th) / 2.0))
    left = int(round((w - tw) / 2.0))
    return image[..., top : top + th, left : left + tw]


def _letterbox_pad_chw(image: jnp.ndarray, fill: Tuple[float, float, float]) -> jnp.ndarray:
    """Channels-first letterbox pad to square with per-channel fill."""
    h, w = image.shape[-2], image.shape[-1]
    max_wh = max(h, w)
    hp, vp = int((max_wh - w) / 2), int((max_wh - h) / 2)
    fill_arr = jnp.asarray(fill, jnp.float32)[:, None, None]
    out = jnp.pad(image.astype(jnp.float32),
                  [(0, 0)] * (image.ndim - 2) + [(vp, vp), (hp, hp)])
    if hp == 0 and vp == 0:
        return out
    mask = jnp.zeros((image.shape[-2], image.shape[-1]), bool)
    mask = jnp.pad(mask, [(vp, vp), (hp, hp)], constant_values=True)
    return jnp.where(mask[None, :, :], fill_arr, out)


def center_crop(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Center crop [..., H, W, C]; pads (zero) first if the image is smaller,
    matching torchvision's functional center_crop. (Wrapper over the CHW
    production implementation — one crop semantics, two layouts.)"""
    return jnp.moveaxis(_center_crop_chw(jnp.moveaxis(image, -1, -3), out_hw), -3, -1)


def letterbox_pad(image: jnp.ndarray, fill: Tuple[float, float, float]) -> jnp.ndarray:
    """Symmetric pad to square with a constant fill (reference
    processing_prismatic.py:23-29: floor((max-side)/2) border on each side).
    Returns float32. (Wrapper over the CHW production implementation.)"""
    return jnp.moveaxis(_letterbox_pad_chw(jnp.moveaxis(image, -1, -3), fill), -3, -1)


@dataclass(frozen=True)
class BackboneTransformSpec:
    """Per-backbone resize/normalize parameters (a timm data_cfg distilled)."""

    input_size: Tuple[int, int] = (224, 224)
    interpolation: str = "bicubic"
    mean: Tuple[float, float, float] = SIGLIP_MEAN
    std: Tuple[float, float, float] = SIGLIP_STD


@dataclass(frozen=True)
class ImageTransformConfig:
    """Mirror of the reference PrismaticImageProcessor config
    (processing_prismatic.py:35-130): a resize strategy + one spec per backbone."""

    specs: Tuple[BackboneTransformSpec, ...] = (BackboneTransformSpec(),)
    resize_strategy: str = "resize-naive"  # resize-naive | resize-crop | letterbox

    @staticmethod
    def dinosiglip_224(resize_strategy: str = "resize-naive") -> "ImageTransformConfig":
        """The OpenVLA default: DINOv2 (ImageNet norm) + SigLIP (0.5 norm) @224."""
        return ImageTransformConfig(
            specs=(
                BackboneTransformSpec((224, 224), "bicubic", IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD),
                BackboneTransformSpec((224, 224), "bicubic", SIGLIP_MEAN, SIGLIP_STD),
            ),
            resize_strategy=resize_strategy,
        )


def apply_image_transform(
    image: jnp.ndarray, config: ImageTransformConfig
) -> jnp.ndarray:
    """uint8 [..., H, W, 3] -> float32 [..., 3*num_backbones, S, S] channel-stacked.

    One traced graph: (letterbox) -> per-backbone resize (+crop) -> /255 ->
    normalize -> stack on the channel axis (CHW, matching the reference's
    torch.vstack contract at processing_prismatic.py:139-143).
    """
    # channels-first from the start: one transpose of the raw uint8 input,
    # then every resize matmul keeps width in the TPU lane dimension (the
    # output contract is CHW anyway)
    x = jnp.moveaxis(image.astype(jnp.float32), -1, -3)   # [..., 3, H, W]
    outs: List[jnp.ndarray] = []
    # identical resizes across backbones (e.g. DinoSigLIP: both bicubic 224)
    # are computed once — the per-spec normalize is the only divergence
    resized_cache: dict = {}
    for spec in config.specs:
        th, tw = spec.input_size
        if config.resize_strategy == "letterbox":
            fill = tuple(float(int(m * 255)) for m in spec.mean)
            key = ("letterbox", fill, (th, tw), spec.interpolation)
            if key not in resized_cache:
                xi = _letterbox_pad_chw(x, fill)
                resized_cache[key] = pil_resize_chw(xi, (th, tw), spec.interpolation)
            xi = resized_cache[key]
        elif config.resize_strategy == "resize-naive":
            key = ("naive", (th, tw), spec.interpolation)
            if key not in resized_cache:
                resized_cache[key] = pil_resize_chw(x, (th, tw), spec.interpolation)
            xi = resized_cache[key]
        elif config.resize_strategy == "resize-crop":
            h, w = x.shape[-2], x.shape[-1]
            short, long = (h, w) if h <= w else (w, h)
            new_short = th
            new_long = max(1, int(new_short * long / short))
            rhw = (new_short, new_long) if h <= w else (new_long, new_short)
            xi = pil_resize_chw(x, rhw, spec.interpolation)
            xi = _center_crop_chw(xi, (th, tw))
        else:
            raise ValueError(f"Unknown resize strategy: {config.resize_strategy}")
        xi = xi / 255.0
        mean = jnp.asarray(spec.mean, jnp.float32)[:, None, None]
        std = jnp.asarray(spec.std, jnp.float32)[:, None, None]
        xi = (xi - mean) / std
        outs.append(xi)
    return jnp.concatenate(outs, axis=-3)


class PrismaticImageTransform:
    """Callable wrapper caching one jitted graph per static input shape."""

    def __init__(self, config: Optional[ImageTransformConfig] = None) -> None:
        self.config = config or ImageTransformConfig.dinosiglip_224()
        self._jitted = jax.jit(functools.partial(apply_image_transform, config=self.config))

    def __call__(self, image) -> jnp.ndarray:
        return self._jitted(jnp.asarray(image))
