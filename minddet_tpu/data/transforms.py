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
import numpy as np

from minddet_tpu.ops.bilinear import bilinear_sample_2d

# ImageNet/CenterNet statistics (centernet/default_config.yaml mean/std)
COCO_MEAN = (0.40789654, 0.44719302, 0.47026115)
COCO_STD = (0.28863828, 0.27408164, 0.27809835)

# PCA lighting basis from the reference (centernet/src/dataset.py eig_val/vec)
# numpy, not jnp: module-level jnp constants force backend init at import
_EIG_VAL = np.array([0.2141788, 0.01817699, 0.00341571], np.float32)
_EIG_VEC = np.array(
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


# ---------------------------------------------------------------------------
# Mosaic / MixUp (YOLO-family augs), fully on device
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_hw",))
def mosaic(
    rng: jax.Array,
    images: jnp.ndarray,   # (B, H, W, 3) float
    img_hw: jnp.ndarray,   # (B, 2)
    boxes: jnp.ndarray,    # (B, O, 4)
    box_mask: jnp.ndarray,  # (B, O)
    out_hw: Tuple[int, int] = (640, 640),
) -> Dict[str, jnp.ndarray]:
    """4-image mosaic: sample i is composed of images (i, i+1, i+2, i+3) in
    the four quadrants around a jittered center. Each quadrant is one affine
    warp through the Pallas gather; boxes concatenate to (B, 4*O, 4).

    Device-side replacement for the host mosaic of the YOLO references
    (BASELINE's "mosaic+mixup aug" requirement).
    """
    b, o = boxes.shape[:2]
    oh, ow = out_hw
    r_c, = jax.random.split(rng, 1)
    cx = jax.random.uniform(r_c, (b,), minval=0.35, maxval=0.65) * ow
    cy = jax.random.uniform(jax.random.fold_in(r_c, 1), (b,), minval=0.35, maxval=0.65) * oh

    canvas = jnp.zeros((b, oh, ow, images.shape[-1]), images.dtype)
    all_boxes, all_mask = [], []
    gy = jnp.arange(oh, dtype=jnp.float32)[None, :, None]
    gx = jnp.arange(ow, dtype=jnp.float32)[None, None, :]
    for q in range(4):
        src_img = jnp.roll(images, -q, axis=0)
        src_hw = jnp.roll(img_hw, -q, axis=0)
        src_boxes = jnp.roll(boxes, -q, axis=0)
        src_mask = jnp.roll(box_mask, -q, axis=0)
        # quadrant rectangle [x0, x1) x [y0, y1)
        x0 = jnp.where(q % 2 == 0, 0.0, cx)
        x1 = jnp.where(q % 2 == 0, cx, float(ow))
        y0 = jnp.where(q < 2, 0.0, cy)
        y1 = jnp.where(q < 2, cy, float(oh))
        qw = jnp.maximum(x1 - x0, 1.0)
        qh = jnp.maximum(y1 - y0, 1.0)
        # affine: output pixel -> source pixel (fit whole source into quadrant)
        sx = src_hw[:, 1].astype(jnp.float32) / qw
        sy = src_hw[:, 0].astype(jnp.float32) / qh
        aff = jnp.zeros((b, 2, 3))
        aff = aff.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy)
        aff = aff.at[:, 0, 2].set(-x0 * sx).at[:, 1, 2].set(-y0 * sy)
        warped = warp_images(src_img, aff, out_hw)
        inside = (
            (gx >= x0[:, None, None]) & (gx < x1[:, None, None])
            & (gy >= y0[:, None, None]) & (gy < y1[:, None, None])
        )[..., None]
        canvas = jnp.where(inside, warped, canvas)
        # boxes: source -> output (inverse of aff)
        bx = src_boxes
        ox1 = bx[..., 0] / sx[:, None] + x0[:, None]
        oy1 = bx[..., 1] / sy[:, None] + y0[:, None]
        ox2 = bx[..., 2] / sx[:, None] + x0[:, None]
        oy2 = bx[..., 3] / sy[:, None] + y0[:, None]
        nb = jnp.stack(
            [jnp.clip(ox1, 0, ow - 1), jnp.clip(oy1, 0, oh - 1),
             jnp.clip(ox2, 0, ow - 1), jnp.clip(oy2, 0, oh - 1)], -1
        )
        degenerate = ((nb[..., 2] - nb[..., 0]) < 2) | ((nb[..., 3] - nb[..., 1]) < 2)
        all_boxes.append(nb)
        all_mask.append(src_mask & ~degenerate)
    return {
        "image": canvas,
        "boxes": jnp.concatenate(all_boxes, axis=1),
        "mask": jnp.concatenate(all_mask, axis=1),
    }


def mixup(
    rng: jax.Array,
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    box_mask: jnp.ndarray,
    alpha: float = 32.0,
) -> Dict[str, jnp.ndarray]:
    """Pairwise mixup with the batch rolled by one; boxes are unioned."""
    lam = jax.random.beta(rng, alpha, alpha, (images.shape[0], 1, 1, 1))
    mixed = images * lam + jnp.roll(images, -1, axis=0) * (1 - lam)
    return {
        "image": mixed,
        "boxes": jnp.concatenate([boxes, jnp.roll(boxes, -1, axis=0)], axis=1),
        "mask": jnp.concatenate([box_mask, jnp.roll(box_mask, -1, axis=0)], axis=1),
    }
