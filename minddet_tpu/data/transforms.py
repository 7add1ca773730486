"""Fused, batched, on-device image augmentation (the MindData replacement).

The reference augments per image on the host with cv2 inside a
``python_multiprocessing`` map op (``centernet/src/dataset.py:272-384``:
random scale/shift affine warp, flip, PCA color aug, normalize; affine math in
``image.py:25-93``). Here the host only decodes JPEGs; every geometric and
photometric transform is a batched XLA program — the affine warp runs through
the same Pallas bilinear-gather kernel as DCN, so augmentation fuses into the
device step and the input pipeline never stalls on python.

Convention: an "affine" here is the 2x3 matrix A mapping OUTPUT pixel coords
(x_out, y_out, 1) to INPUT coords — the inverse warp, which is what sampling
needs. Box transforms use the forward matrix (invert_affine to go back).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from minddet_tpu.ops.bilinear import bilinear_sample_2d

# ImageNet/CenterNet statistics (centernet/default_config.yaml mean/std)
COCO_MEAN = (0.40789654, 0.44719302, 0.47026115)
COCO_STD = (0.28863828, 0.27408164, 0.27809835)

# PCA lighting basis from the reference (centernet/src/dataset.py eig_val/vec)
_EIG_VAL = jnp.array([0.2141788, 0.01817699, 0.00341571])
_EIG_VEC = jnp.array(
    [
        [-0.58752847, -0.69563484, 0.41340352],
        [-0.5832747, 0.00994535, -0.81221408],
        [-0.56089297, 0.71832671, 0.41158938],
    ]
)


# ---------------------------------------------------------------------------
# Affine matrices (host-free jnp math; shapes are static)
# ---------------------------------------------------------------------------

def make_affine(
    center: jnp.ndarray,  # (B, 2) input-space center (x, y)
    scale: jnp.ndarray,   # (B,) input-space box size mapped to output
    out_hw: Tuple[int, int],
    flip: Optional[jnp.ndarray] = None,  # (B,) bool horizontal flip
) -> jnp.ndarray:
    """(B, 2, 3) output->input affine: out pixel -> input pixel.

    Equivalent to the reference's ``get_affine_transform(center, scale, 0,
    output_size, inv=1)`` (image.py:25-63) for the rot=0 case all its models
    use.
    """
    oh, ow = out_hw
    s = scale / ow  # input units per output pixel
    b = center.shape[0]
    sx = jnp.where(flip, -s, s) if flip is not None else s
    a = jnp.zeros((b, 2, 3))
    a = a.at[:, 0, 0].set(sx)
    a = a.at[:, 1, 1].set(s)
    a = a.at[:, 0, 2].set(center[:, 0] - sx * (ow - 1) / 2.0)
    a = a.at[:, 1, 2].set(center[:, 1] - s * (oh - 1) / 2.0)
    return a


def invert_affine(a: jnp.ndarray) -> jnp.ndarray:
    """Invert (B, 2, 3) affines."""
    m = a[:, :, :2]
    t = a[:, :, 2]
    det = m[:, 0, 0] * m[:, 1, 1] - m[:, 0, 1] * m[:, 1, 0]
    inv = jnp.stack(
        [
            jnp.stack([m[:, 1, 1], -m[:, 0, 1]], -1),
            jnp.stack([-m[:, 1, 0], m[:, 0, 0]], -1),
        ],
        axis=1,
    ) / det[:, None, None]
    ti = -jnp.einsum("bij,bj->bi", inv, t)
    return jnp.concatenate([inv, ti[:, :, None]], axis=-1)


def sample_train_affine(
    rng: jax.Array,
    img_hw: jnp.ndarray,  # (B, 2) original (h, w) per image
    out_hw: Tuple[int, int],
    scale_range: Tuple[float, float] = (0.6, 1.4),
    shift: float = 0.1,
    flip_prob: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random scale/shift/flip affine like the reference's train-time
    ``preprocess_fn`` (dataset.py:289-313: rand scale in 0.6..1.4 steps,
    center shift, 50% flip). Returns (affine (B,2,3), flip (B,))."""
    b = img_hw.shape[0]
    r_scale, r_cx, r_cy, r_flip = jax.random.split(rng, 4)
    h = img_hw[:, 0].astype(jnp.float32)
    w = img_hw[:, 1].astype(jnp.float32)
    base = jnp.maximum(h, w)
    scale = base * jax.random.uniform(
        r_scale, (b,), minval=scale_range[0], maxval=scale_range[1]
    )
    cx = w / 2 + w * jax.random.uniform(r_cx, (b,), minval=-shift, maxval=shift)
    cy = h / 2 + h * jax.random.uniform(r_cy, (b,), minval=-shift, maxval=shift)
    flip = jax.random.uniform(r_flip, (b,)) < flip_prob
    center = jnp.stack([cx, cy], -1)
    return make_affine(center, scale, out_hw, flip), flip


def eval_affine(
    img_hw: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Deterministic eval affine: fit the max side, centered (reference
    ``pre_process_for_test`` fix-res branch, dataset.py:223-257)."""
    h = img_hw[:, 0].astype(jnp.float32)
    w = img_hw[:, 1].astype(jnp.float32)
    center = jnp.stack([w / 2, h / 2], -1)
    scale = jnp.maximum(h, w)
    return make_affine(center, scale, out_hw)


# ---------------------------------------------------------------------------
# Warping & box transforms
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_hw",))
def warp_images(
    images: jnp.ndarray,  # (B, H, W, C) float
    affines: jnp.ndarray,  # (B, 2, 3) output->input
    out_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Batched inverse-affine bilinear warp via the Pallas gather kernel."""
    b = images.shape[0]
    oh, ow = out_hw
    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (P, 2) x,y
    pts = jnp.einsum("bij,pj->bpi", affines[:, :, :2], grid) + affines[:, None, :, 2]
    out = bilinear_sample_2d(images, pts[..., 1], pts[..., 0])  # (B, P, C)
    return out.reshape(b, oh, ow, images.shape[-1])


def transform_boxes(
    boxes: jnp.ndarray,  # (B, O, 4) xyxy input space
    affines: jnp.ndarray,  # (B, 2, 3) OUTPUT->INPUT (as used for warping)
    out_hw: Tuple[int, int],
    clip: bool = True,
) -> jnp.ndarray:
    """Map boxes into the warped output space (uses the inverse affine)."""
    fwd = invert_affine(affines)  # input -> output
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    corners = jnp.stack(
        [
            jnp.stack([x1, y1], -1), jnp.stack([x2, y1], -1),
            jnp.stack([x1, y2], -1), jnp.stack([x2, y2], -1),
        ],
        axis=2,
    )  # (B, O, 4, 2)
    warped = jnp.einsum("bij,bocj->boci", fwd[:, :, :2], corners) + fwd[:, None, None, :, 2]
    lo = jnp.min(warped, axis=2)
    hi = jnp.max(warped, axis=2)
    out = jnp.concatenate([lo, hi], axis=-1)
    if clip:
        oh, ow = out_hw
        out = jnp.stack(
            [
                jnp.clip(out[..., 0], 0, ow - 1),
                jnp.clip(out[..., 1], 0, oh - 1),
                jnp.clip(out[..., 2], 0, ow - 1),
                jnp.clip(out[..., 3], 0, oh - 1),
            ],
            axis=-1,
        )
    return out


# ---------------------------------------------------------------------------
# Photometric
# ---------------------------------------------------------------------------

def color_aug(rng: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Reference ``color_aug`` (image.py:244-253): random brightness /
    contrast / saturation (+-0.4) + PCA lighting noise, batched."""
    b = images.shape[0]
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    gs_mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    gray = jnp.mean(images, axis=-1, keepdims=True)

    alpha_b = 1.0 + jax.random.uniform(r1, (b, 1, 1, 1), minval=-0.4, maxval=0.4)
    images = images * alpha_b
    alpha_c = 1.0 + jax.random.uniform(r2, (b, 1, 1, 1), minval=-0.4, maxval=0.4)
    images = images * alpha_c + gs_mean * (1 - alpha_c)
    alpha_s = 1.0 + jax.random.uniform(r3, (b, 1, 1, 1), minval=-0.4, maxval=0.4)
    images = images * alpha_s + gray * (1 - alpha_s)

    alpha = jax.random.normal(r4, (b, 3)) * 0.1
    lighting = jnp.einsum("ij,bj->bi", _EIG_VEC, _EIG_VAL * alpha)
    return images + lighting[:, None, None, :]


def normalize(images: jnp.ndarray, mean=COCO_MEAN, std=COCO_STD) -> jnp.ndarray:
    return (images - jnp.asarray(mean)) / jnp.asarray(std)


# ---------------------------------------------------------------------------
# Full fused train transform
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_hw", "use_color_aug"))
def centernet_train_transform(
    rng: jax.Array,
    images: jnp.ndarray,     # (B, H, W, 3) uint8/float, host-padded to max res
    img_hw: jnp.ndarray,     # (B, 2) true sizes
    boxes: jnp.ndarray,      # (B, O, 4) xyxy original pixels
    out_hw: Tuple[int, int] = (512, 512),
    use_color_aug: bool = True,
) -> Dict[str, jnp.ndarray]:
    """decode-side of ``preprocess_fn`` as ONE device program: affine warp +
    flip + color aug + normalize; boxes mapped to output space. Target
    generation (`ops.targets.centernet_targets_batch`) chains straight after
    inside the same jit."""
    r_aff, r_col = jax.random.split(rng)
    images = images.astype(jnp.float32) / 255.0
    affines, _ = sample_train_affine(r_aff, img_hw, out_hw)
    warped = warp_images(images, affines, out_hw)
    if use_color_aug:
        warped = color_aug(r_col, warped)
    warped = normalize(jnp.clip(warped, 0.0, 1.0))
    out_boxes = transform_boxes(boxes, affines, out_hw)
    return {"image": warped, "boxes": out_boxes, "affine": affines}
