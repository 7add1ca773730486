"""Heatmap decode ops (CenterNet / CenterPoint family), NHWC, on-device.

Re-implements the reference's decode stack — maxpool peak-NMS
(``centernet/src/decode.py:14-64``), per-channel + global top-k
(``decode.py:67-120``), gather-by-index feature lookup
(``centernet/src/utils.py:48-130``), and box assembly
(``decode.py:123-196``) — as pure JAX on NHWC tensors. The whole decode is one
fused XLA program; no host round trip (the reference's eval loop bounces
through numpy between decode and soft-NMS, ``eval.py:110-162``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def heatmap_peaks(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima of (B, H, W, C) heatmaps (maxpool-as-NMS).

    Reference: ``decode.py:NMS.construct`` (3x3 same-padded maxpool + equal).
    """
    hmax = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    return jnp.where(heat == hmax, heat, 0.0)


def topk_heatmap(
    heat: jnp.ndarray, k: int = 100
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-stage top-k over (B, H, W, C): per-class then global.

    Returns (scores, inds, classes, ys, xs), each (B, K); ``inds`` indexes the
    flattened H*W plane (for feature gathering). Mirrors
    ``decode.py:GatherTopK.construct`` exactly (per-channel top-k of K, then
    top-k of K over the (C*K,) concat, class = ind // K).
    """
    b, h, w, c = heat.shape
    # (B, C, H*W)
    per_class = jnp.transpose(heat, (0, 3, 1, 2)).reshape(b, c, h * w)
    scores1, inds1 = jax.lax.top_k(per_class, k)  # (B, C, K)
    ys1 = (inds1 // w).astype(jnp.float32)
    xs1 = (inds1 % w).astype(jnp.float32)

    scores2, inds2 = jax.lax.top_k(scores1.reshape(b, c * k), k)  # (B, K)
    classes = (inds2 // k).astype(jnp.int32)
    gather = jax.vmap(lambda flat, idx: flat[idx])
    inds = gather(inds1.reshape(b, c * k), inds2)
    ys = gather(ys1.reshape(b, c * k), inds2)
    xs = gather(xs1.reshape(b, c * k), inds2)
    return scores2, inds, classes, ys, xs


def gather_feature(feat: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, H, W, C) features at flat H*W indices (B, K) -> (B, K, C).

    Reference: ``utils.py:TransposeGatherFeature`` (NCHW there; NHWC here).
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return jax.vmap(lambda f, i: f[i])(flat, inds)


def centernet_decode(
    outputs: Dict[str, jnp.ndarray],
    k: int = 100,
    kernel: int = 3,
) -> jnp.ndarray:
    """Full CenterNet decode: heads -> (B, K, 6) [x1, y1, x2, y2, score, class].

    ``outputs`` holds NHWC heads: 'hm' (already sigmoid-clipped), 'wh' (2ch),
    optionally 'reg' (2ch center offsets). Coordinates are in output-stride
    units, exactly like ``decode.py:DetectionDecode.construct``.
    """
    heat = heatmap_peaks(outputs["hm"], kernel)
    scores, inds, classes, ys, xs = topk_heatmap(heat, k)

    wh = gather_feature(outputs["wh"], inds)  # (B, K, 2)
    if "reg" in outputs and outputs["reg"] is not None:
        reg = gather_feature(outputs["reg"], inds)
        xs = xs + reg[..., 0]
        ys = ys + reg[..., 1]
    else:
        xs = xs + 0.5
        ys = ys + 0.5

    ws, hs = wh[..., 0], wh[..., 1]
    bboxes = jnp.stack(
        [xs - ws / 2, ys - hs / 2, xs + ws / 2, ys + hs / 2], axis=-1
    )
    return jnp.concatenate(
        [bboxes, scores[..., None], classes.astype(bboxes.dtype)[..., None]], axis=-1
    )


def simple_topk(
    heat: jnp.ndarray, k: int = 100
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-stage global top-k over all classes and positions.

    The mmdet-style alternative (``predict_by_feat.py:get_topk_from_heatmap``)
    and what CenterPoint's head uses per task (``center_head.py``).
    """
    b, h, w, c = heat.shape
    flat = jnp.transpose(heat, (0, 3, 1, 2)).reshape(b, c * h * w)
    # tiny grids (tests / debug configs) can have fewer cells than nms_pre
    scores, inds = jax.lax.top_k(flat, min(k, c * h * w))
    classes = (inds // (h * w)).astype(jnp.int32)
    pos = inds % (h * w)
    ys = (pos // w).astype(jnp.float32)
    xs = (pos % w).astype(jnp.float32)
    return scores, pos, classes, ys, xs
