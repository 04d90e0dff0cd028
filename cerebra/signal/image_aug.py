"""Device-side image augmentations for the DINO image pipeline
(dino/main_dino.py:484-522 DataAugmentationDINO), in JAX.

The reference composes torchvision RandomResizedCrop / HorizontalFlip /
ColorJitter / GaussianBlur / Solarization on the host per sample. Here each
augmentation is a pure function of a PRNG key operating on NHWC batches, so
the whole multi-crop batch is built on device inside the jitted train step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize(img: jax.Array) -> jax.Array:
    """ImageNet normalization (the reference's `normalize` transform)."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def random_resized_crop(
    key: jax.Array,
    img: jax.Array,  # (H, W, C)
    out_size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> jax.Array:
    """torchvision RandomResizedCrop: sample an area/aspect box, crop,
    resize (bilinear; the reference uses bicubic — fused/cheaper here)."""
    H, W, C = img.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = H * W * jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.clip(jnp.sqrt(area * aspect), 8, W).astype(jnp.int32)
    h = jnp.clip(jnp.sqrt(area / aspect), 8, H).astype(jnp.int32)
    # maxval is exclusive; torchvision draws top from [0, H-h] INCLUSIVE
    # (torch.randint(0, H - h + 1)) so the crop can sit flush with the edge
    top = jax.random.randint(k3, (), 0, jnp.maximum(H - h + 1, 1))
    left = jax.random.randint(k4, (), 0, jnp.maximum(W - w + 1, 1))
    # gather-based crop+resize with static output shape: map output pixel →
    # source coordinates inside the sampled box
    ys = top + (jnp.arange(out_size) * h) // out_size
    xs = left + (jnp.arange(out_size) * w) // out_size
    return img[ys][:, xs]


def random_hflip(key: jax.Array, img: jax.Array, p: float = 0.5) -> jax.Array:
    return jnp.where(jax.random.bernoulli(key, p), img[:, ::-1, :], img)


def color_jitter(
    key: jax.Array, img: jax.Array,
    brightness: float = 0.4, contrast: float = 0.4, saturation: float = 0.2,
    hue: float = 0.1, p: float = 0.8,
) -> jax.Array:
    """ColorJitter(brightness, contrast, saturation, hue) applied with
    probability p (dino/main_dino.py:488-490). Hue is rotated in the YIQ
    chroma plane (equivalent to an HSV hue shift up to gamut clipping)."""
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    b = 1.0 + jax.random.uniform(kb, (), minval=-brightness, maxval=brightness)
    c = 1.0 + jax.random.uniform(kc, (), minval=-contrast, maxval=contrast)
    s = 1.0 + jax.random.uniform(ks, (), minval=-saturation, maxval=saturation)
    theta = 2.0 * jnp.pi * jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    luma = jnp.asarray([0.299, 0.587, 0.114], dtype=img.dtype)  # ITU-R 601
    out = img * b
    mean = jnp.mean(out, axis=(0, 1), keepdims=True)
    out = (out - mean) * c + mean
    gray = jnp.sum(out * luma, axis=-1, keepdims=True)
    out = (out - gray) * s + gray
    if hue > 0:
        # rotate chroma: RGB → YIQ, rotate (I, Q) by theta, back to RGB
        rgb2yiq = jnp.array([[0.299, 0.587, 0.114],
                             [0.5959, -0.2746, -0.3213],
                             [0.2115, -0.5227, 0.3112]], dtype=out.dtype)
        yiq2rgb = jnp.array([[1.0, 0.956, 0.619],
                             [1.0, -0.272, -0.647],
                             [1.0, -1.106, 1.703]], dtype=out.dtype)
        yiq = out @ rgb2yiq.T
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.stack([
            yiq[..., 0],
            cos_t * yiq[..., 1] - sin_t * yiq[..., 2],
            sin_t * yiq[..., 1] + cos_t * yiq[..., 2],
        ], axis=-1)
        out = rot @ yiq2rgb.T
    return jnp.where(jax.random.bernoulli(kp, p), jnp.clip(out, 0.0, 1.0), img)


def random_grayscale(key: jax.Array, img: jax.Array, p: float = 0.2) -> jax.Array:
    """transforms.RandomGrayscale(p=0.2) (dino/main_dino.py:491) — ITU-R 601
    luma weights like torchvision's rgb_to_grayscale."""
    luma = jnp.asarray([0.299, 0.587, 0.114], dtype=img.dtype)
    gray = jnp.broadcast_to(jnp.sum(img * luma, axis=-1, keepdims=True), img.shape)
    return jnp.where(jax.random.bernoulli(key, p), gray, img)


def gaussian_blur(key: jax.Array, img: jax.Array, p: float = 0.5, sigma_max: float = 2.0) -> jax.Array:
    """Separable 9-tap gaussian blur applied with probability p."""
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, (), minval=0.1, maxval=sigma_max)
    xs = jnp.arange(-4, 5, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (xs / sigma) ** 2)
    kern = kern / jnp.sum(kern)
    blurred = img
    # depthwise separable conv via correlation along H then W
    blurred = jax.vmap(
        lambda ch: jnp.apply_along_axis(
            lambda row: jnp.correlate(row, kern, mode="same"), 0, ch
        ),
        in_axes=2, out_axes=2,
    )(blurred)
    blurred = jax.vmap(
        lambda ch: jnp.apply_along_axis(
            lambda row: jnp.correlate(row, kern, mode="same"), 1, ch
        ),
        in_axes=2, out_axes=2,
    )(blurred)
    return jnp.where(jax.random.bernoulli(k2, p), blurred, img)


def solarization(key: jax.Array, img: jax.Array, p: float = 0.2) -> jax.Array:
    return jnp.where(jax.random.bernoulli(key, p), jnp.where(img >= 0.5, 1.0 - img, img), img)


def dino_global_crop(key: jax.Array, img: jax.Array, out_size: int = 224,
                     scale=(0.4, 1.0), blur_p: float = 1.0, solarize_p: float = 0.0) -> jax.Array:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    out = random_resized_crop(k1, img, out_size, scale=scale)
    out = random_hflip(k2, out)
    out = color_jitter(k3, out)
    out = random_grayscale(k6, out)
    out = gaussian_blur(k4, out, p=blur_p)
    if solarize_p > 0:
        out = solarization(k5, out, p=solarize_p)
    return normalize(out)


def dino_local_crop(key: jax.Array, img: jax.Array, out_size: int = 96,
                    scale=(0.05, 0.4)) -> jax.Array:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    out = random_resized_crop(k1, img, out_size, scale=scale)
    out = random_hflip(k2, out)
    out = color_jitter(k3, out)
    out = random_grayscale(k5, out)
    out = gaussian_blur(k4, out, p=0.5)
    return normalize(out)
