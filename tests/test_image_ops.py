"""Parity tests: jitted preprocessing graph vs PIL/torchvision reference semantics.

The reference serving twin resizes with PIL (bicubic, antialias), center-crops,
scales to [0,1], normalizes per backbone, and channel-stacks (SURVEY.md §3.1).
PIL quantizes resample coefficients to fixed-point ints; our float weights can
differ by at most 1/255 on a tiny fraction of pixels — tolerances reflect that.
"""

import numpy as np
import pytest
from PIL import Image

from openvla_probe_tpu.ops.image import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    ImageTransformConfig,
    PrismaticImageTransform,
    apply_image_transform,
    center_crop,
    letterbox_pad,
    pil_resize,
    resample_weights,
)

import jax.numpy as jnp

PIL_MODES = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR, "lanczos": Image.LANCZOS}


@pytest.mark.parametrize("method", ["bicubic", "bilinear", "lanczos"])
@pytest.mark.parametrize("in_hw", [(256, 256), (480, 640), (100, 37), (224, 224)])
def test_resize_exact_is_bitexact_with_pil(method, in_hw, rng):
    from openvla_probe_tpu.ops.image import pil_resize_exact

    img = rng.integers(0, 256, size=(*in_hw, 3), dtype=np.uint8)
    want = np.asarray(Image.fromarray(img).resize((224, 224), PIL_MODES[method]))
    got = pil_resize_exact(img, (224, 224), method)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("method", ["bicubic", "bilinear", "lanczos"])
@pytest.mark.parametrize("in_hw", [(256, 256), (480, 640), (100, 37), (224, 224)])
def test_resize_device_matches_pil(method, in_hw, rng):
    """f32 device path (Precision.HIGHEST): at most ±1 uint8 level on a
    vanishing pixel fraction (f32 vs Pillow int fixed-point at half-boundary
    roundings)."""
    img = rng.integers(0, 256, size=(*in_hw, 3), dtype=np.uint8)
    want = np.asarray(Image.fromarray(img).resize((224, 224), PIL_MODES[method])).astype(np.float32)
    got = np.asarray(pil_resize(jnp.asarray(img), (224, 224), method))
    diff = np.abs(got - want)
    # bilinear's rational weights land on exact .5 fixed-point ties far more
    # often; f32 tie-breaking then differs from Pillow's integer path (the
    # production OpenVLA path is bicubic; bit-exactness is pil_resize_exact)
    if method == "bilinear":
        assert diff.max() <= 2.0 + 1e-5, f"max diff {diff.max()}"
        assert (diff > 0.5).mean() < 2e-2
    else:
        assert diff.max() <= 1.0 + 1e-5, f"max diff {diff.max()}"
        assert (diff > 0.5).mean() < 1e-3


def test_resize_upscale_matches_pil(rng):
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    want = np.asarray(Image.fromarray(img).resize((224, 224), Image.BICUBIC)).astype(np.float32)
    got = np.asarray(pil_resize(jnp.asarray(img), (224, 224), "bicubic"))
    assert np.abs(got - want).max() <= 1.0 + 1e-5


def test_resample_weights_rows_sum_to_one():
    for pair in [(480, 224), (224, 224), (37, 224)]:
        W = resample_weights(*pair, "bicubic")
        np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-5)


def test_center_crop_matches_manual(rng):
    img = rng.normal(size=(1, 300, 260, 3)).astype(np.float32)
    got = np.asarray(center_crop(jnp.asarray(img), (224, 224)))
    # torchvision center_crop: top = round((300-224)/2)=38, left = round((260-224)/2)=18
    np.testing.assert_allclose(got, img[:, 38:262, 18:242, :])


def test_center_crop_pads_small_images(rng):
    img = rng.normal(size=(100, 100, 3)).astype(np.float32)
    got = np.asarray(center_crop(jnp.asarray(img), (224, 224)))
    assert got.shape == (224, 224, 3)
    np.testing.assert_allclose(got[62:162, 62:162], img)
    assert got[0, 0, 0] == 0.0


def test_letterbox_pad(rng):
    img = rng.integers(0, 256, size=(100, 224, 3), dtype=np.uint8)
    out = np.asarray(letterbox_pad(jnp.asarray(img), (127.0, 127.0, 127.0)))
    # pad = floor((224-100)/2) = 62 on top and bottom
    assert out.shape == (224, 224, 3)
    np.testing.assert_allclose(out[:62], 127.0)
    np.testing.assert_allclose(out[162:], 127.0)
    np.testing.assert_allclose(out[62:162], img.astype(np.float32))


def test_dinosiglip_stack_semantics(rng):
    """Full transform: 6-channel output == [dino-normalized ; siglip-normalized]."""
    img = rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
    cfg = ImageTransformConfig.dinosiglip_224()
    out = np.asarray(apply_image_transform(jnp.asarray(img), cfg))
    assert out.shape == (6, 224, 224)

    resized = np.asarray(Image.fromarray(img).resize((224, 224), Image.BICUBIC)).astype(np.float32) / 255.0
    dino = (resized - np.array(IMAGENET_DEFAULT_MEAN)) / np.array(IMAGENET_DEFAULT_STD)
    sig = (resized - 0.5) / 0.5
    want = np.concatenate([dino.transpose(2, 0, 1), sig.transpose(2, 0, 1)], axis=0)
    # 1/255 pixel tolerance propagated through normalization (max 1/255/0.224)
    assert np.abs(out - want).max() <= (1.0 / 255.0) / 0.224 + 1e-5


def test_transform_batched(rng):
    imgs = rng.integers(0, 256, size=(4, 256, 256, 3), dtype=np.uint8)
    t = PrismaticImageTransform()
    out = np.asarray(t(imgs))
    assert out.shape == (4, 6, 224, 224)
    single = np.asarray(t(imgs[0]))
    np.testing.assert_allclose(out[0], single, atol=1e-6)


def test_resize_crop_strategy(rng):
    img = rng.integers(0, 256, size=(300, 400, 3), dtype=np.uint8)
    cfg = ImageTransformConfig.dinosiglip_224(resize_strategy="resize-crop")
    out = np.asarray(apply_image_transform(jnp.asarray(img), cfg))
    assert out.shape == (6, 224, 224)
    # reference: resize shortest side to 224 (PIL), then center crop 224x224
    w = int(224 * 400 / 300)
    ref = Image.fromarray(img).resize((w, 224), Image.BICUBIC)
    ref = np.asarray(ref).astype(np.float32)
    left = int(round((w - 224) / 2))
    ref_c = ref[:, left : left + 224] / 255.0
    sig = ((ref_c - 0.5) / 0.5).transpose(2, 0, 1)
    assert np.abs(out[3:] - sig).max() <= (1.0 / 255.0) / 0.5 + 1e-5


def test_chw_resize_matches_hwc(rng):
    """The channels-first resize (serving layout) must match the HWC reference
    path up to fp32 dot-order rounding (same weights, same pass rounding)."""
    from openvla_probe_tpu.ops.image import pil_resize, pil_resize_chw

    img = rng.integers(0, 256, (256, 200, 3), dtype=np.uint8)
    hwc = np.asarray(pil_resize(jnp.asarray(img), (224, 224)))
    chw = np.asarray(pil_resize_chw(jnp.asarray(np.moveaxis(img, -1, 0)), (224, 224)))
    diff = np.abs(hwc - np.moveaxis(chw, 0, -1))
    # identical up to the documented half-boundary flip budget of the device path
    assert diff.max() <= 1.0 + 1e-5
    assert (diff > 0.5).mean() < 1e-3
