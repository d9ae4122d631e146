"""Frame-level tf transforms: JPEG decode + resize, per-image augmentation.

Behavioral re-implementation of prismatic/vla/datasets/rlds/obs_transforms.py
(decode_and_resize :45-99, augment :17-42). Decode/resize/augment run in
tf.data's C++ threadpool on the TPU host.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Mapping, Sequence, Tuple, Union

import tensorflow as tf


def resize_image(image: tf.Tensor, size: Tuple[int, int]) -> tf.Tensor:
    """Lanczos3 resize with antialias (the train-time resize kernel; the
    LIBERO eval path reproduces exactly this on host, libero_utils.py:33-47)."""
    image = tf.image.resize(
        tf.cast(image, tf.float32), size, method="lanczos3", antialias=True
    )
    return tf.cast(tf.clip_by_value(tf.round(image), 0, 255), tf.uint8)


def resize_depth_image(depth: tf.Tensor, size: Tuple[int, int]) -> tf.Tensor:
    return tf.image.resize(
        tf.cast(depth, tf.float32)[..., None], size, method="bilinear", antialias=True
    )[..., 0]


def decode_and_resize(
    obs: Dict[str, Any],
    resize_size: Union[Tuple[int, int], Mapping[str, Tuple[int, int]]],
    depth_resize_size: Union[Tuple[int, int], Mapping[str, Tuple[int, int]], None] = None,
) -> Dict[str, Any]:
    """Decode `image_*` JPEG strings (empty string -> zero padding image) and
    resize; same for `depth_*`."""
    image_names = {k[len("image_"):] for k in obs if k.startswith("image_")}
    depth_names = {k[len("depth_"):] for k in obs if k.startswith("depth_")}
    if isinstance(resize_size, (tuple, list)):
        resize_size = {name: tuple(resize_size) for name in image_names}
    if isinstance(depth_resize_size, (tuple, list)):
        depth_resize_size = {name: tuple(depth_resize_size) for name in depth_names}

    for name in image_names:
        size = (resize_size or {}).get(name)
        image = obs[f"image_{name}"]
        if image.dtype == tf.string:
            image = tf.cond(
                tf.strings.length(image) == 0,
                lambda: tf.zeros((*size, 3) if size else (1, 1, 3), tf.uint8),
                lambda: tf.io.decode_image(image, expand_animations=False, dtype=tf.uint8),
            )
        elif image.dtype != tf.uint8:
            raise ValueError(f"Unsupported image dtype: {image.dtype}")
        if size is not None:
            image = resize_image(image, size)
        obs[f"image_{name}"] = image

    for name in depth_names:
        size = (depth_resize_size or {}).get(name)
        depth = obs[f"depth_{name}"]
        if depth.dtype == tf.string:
            depth = tf.cond(
                tf.strings.length(depth) == 0,
                lambda: tf.zeros((*size, 1) if size else (1, 1, 1), tf.float32)[..., 0],
                lambda: tf.io.decode_image(depth, expand_animations=False, dtype=tf.float32)[..., 0],
            )
        if size is not None:
            depth = resize_depth_image(depth, size)
        obs[f"depth_{name}"] = depth
    return obs


_AUGMENT_OPS = {
    "random_resized_crop": lambda img, seed, scale=(0.9, 1.0), ratio=(0.9, 1.1): _random_resized_crop(img, scale, ratio, seed),
    "random_brightness": lambda img, seed, max_delta=0.1: tf.image.stateless_random_brightness(img, max_delta, seed),
    "random_contrast": lambda img, seed, lower=0.9, upper=1.1: tf.image.stateless_random_contrast(img, lower, upper, seed),
    "random_saturation": lambda img, seed, lower=0.9, upper=1.1: tf.image.stateless_random_saturation(img, lower, upper, seed),
    "random_hue": lambda img, seed, max_delta=0.05: tf.image.stateless_random_hue(img, max_delta, seed),
    "random_flip_left_right": lambda img, seed: tf.image.stateless_random_flip_left_right(img, seed),
}


def _random_resized_crop(image, scale, ratio, seed):
    height, width = image.shape[-3], image.shape[-2]
    area = tf.random.stateless_uniform((), seed, scale[0], scale[1])
    aspect = tf.random.stateless_uniform((), seed + 1, ratio[0], ratio[1])
    h = tf.cast(tf.round(tf.sqrt(tf.cast(height * width, tf.float32) * area / aspect)), tf.int32)
    w = tf.cast(tf.round(tf.sqrt(tf.cast(height * width, tf.float32) * area * aspect)), tf.int32)
    h = tf.minimum(h, height)
    w = tf.minimum(w, width)
    cropped = tf.image.stateless_random_crop(image, (h, w, 3), seed)
    return resize_image(cropped, (height, width))


def augment_image(
    image: tf.Tensor,
    seed: tf.Tensor,
    augment_order: Sequence[str],
    **aug_kwargs,
) -> tf.Tensor:
    """Apply the configured augmentations in order with stateless seeds."""
    image = tf.cast(image, tf.uint8)
    for i, op_name in enumerate(augment_order):
        op = _AUGMENT_OPS[op_name]
        kwargs = aug_kwargs.get(op_name, {})
        if isinstance(kwargs, dict):
            image = op(image, seed + i, **kwargs)
        else:  # sequence-style args, e.g. random_resized_crop: {scale: .., ratio: ..}
            image = op(image, seed + i, *kwargs)
    return image


def augment(
    obs: Dict[str, Any], seed: tf.Tensor, augment_kwargs: Mapping[str, Any]
) -> Dict[str, Any]:
    """Augment every `image_*` in obs; per-name kwargs or shared dict with
    'augment_order'."""
    image_names = {k[len("image_"):] for k in obs if k.startswith("image_")}
    if "augment_order" in augment_kwargs:
        augment_kwargs = {name: augment_kwargs for name in image_names}
    for i, name in enumerate(image_names):
        if name not in augment_kwargs:
            continue
        kwargs = dict(augment_kwargs[name])
        order = kwargs.pop("augment_order")
        obs[f"image_{name}"] = augment_image(
            obs[f"image_{name}"], seed + i, order, **kwargs
        )
    return obs
