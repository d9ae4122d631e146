"""C++ host-runtime kernel tests: build, bit-exactness vs Pillow, collation."""

import numpy as np
import pytest
from PIL import Image

from openvla_probe_tpu.utils import native


def test_native_builds():
    assert native.native_available(), "g++ build of native/ovla_native.cpp failed"


@pytest.mark.parametrize("in_hw", [(256, 256), (480, 640), (100, 37)])
def test_cpp_resample_bitexact_with_pil(in_hw, rng):
    img = rng.integers(0, 256, size=(*in_hw, 3), dtype=np.uint8)
    want = np.asarray(Image.fromarray(img).resize((224, 224), Image.BICUBIC))
    got = native.resample_u8_exact(img, (224, 224), "bicubic")
    np.testing.assert_array_equal(got, want)


def test_cpp_resample_lanczos(rng):
    img = rng.integers(0, 256, size=(300, 200, 3), dtype=np.uint8)
    want = np.asarray(Image.fromarray(img).resize((224, 224), Image.LANCZOS))
    got = native.resample_u8_exact(img, (224, 224), "lanczos")
    np.testing.assert_array_equal(got, want)


def test_pad_stack(rng):
    rows = [rng.integers(0, 100, size=(n,)) for n in [3, 7, 5]]
    out = native.pad_stack_i64(rows, 8, -100)
    assert out.shape == (3, 8)
    np.testing.assert_array_equal(out[0, :3], rows[0])
    assert (out[0, 3:] == -100).all()
    # truncation
    out2 = native.pad_stack_i64(rows, 4, 0)
    np.testing.assert_array_equal(out2[1], rows[1][:4])


def test_stack_u8(rng):
    imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(4)]
    out = native.stack_u8(imgs)
    assert out.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(out[2], imgs[2])
