"""Pallas rotated-intersection kernel: pair-tiles on lanes, vertices in
registers.

The XLA formulation in ``ops/rotated_iou.py`` puts the 24-candidate axis
minor-most, so every elementwise op runs at <24/128 lane utilization and the
angular-successor step is a 24x24 batched contraction with terrible MXU
shapes — ~45 ms for a 1024x1024 matrix on v5e. This kernel inverts the
layout: the (N, M) PAIR axes are the vectorized (sublane x lane) tile and the
polygon-clipping loops are fully unrolled Python over (8, 128)-shaped
registers, which is how the VPU wants it.

Algorithm: Sutherland–Hodgman — clip quad A against the four half-planes of
quad B. A rect∩rect intersection has ≤8 vertices, so an 8-slot register
polygon (per-lane vertex count) suffices; "append at cnt" is 8 predicated
selects. Everything is branch-free fixed-shape VPU arithmetic; no sorts, no
gathers, no host trips. Replaces the same four reference engines cited in
``ops/rotated_iou.py`` (CUDA ``iou3d_nms_kernel.cu``'s per-thread polygon
clipping is the closest relative — this is that loop, vectorized 1024-wide).

Validated against the XLA path and the native C++ golden
(``native/src/host_ops.cpp``) in ``tests/test_rotated_iou.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minddet_tpu.ops.rotated_iou import _EPS

# Large tiles: per-grid-step pipeline overhead on this chip is ~15-30 us, so
# a (8, 128)-tile grid (1024 steps for 1024^2 pairs) costs ~30 ms in overhead
# alone. (16, 512) tiles keep every op a full-lane (16, 512) vector while
# cutting the 1024^2 grid to 128 steps.
TILE_N = 16
TILE_M = 512
_MAX_V = 8  # rect ∩ rect has at most 8 boundary vertices
_INSIDE_EPS = 1e-6


def _corners(x, y, w, l, r):
    """Box params (broadcastable arrays) -> 4 CCW corners [(cx, cy)] * 4."""
    c, s = jnp.cos(r), jnp.sin(r)
    out = []
    for dx, dy in ((0.5, 0.5), (-0.5, 0.5), (-0.5, -0.5), (0.5, -0.5)):
        ox, oy = w * dx, l * dy
        out.append((c * ox - s * oy + x, s * ox + c * oy + y))
    return out


def _intersect_kernel(b1_ref, b2_ref, out_ref):  # noqa: C901

    # blocks arrive via BlockSpec: b1 (TN, 5) rows on sublanes, b2 (5, TM)
    # params on lanes — manual lane-dim slicing would need 128-aligned
    # indices Mosaic can't prove; index_map blocking DMAs them instead
    a = [b1_ref[:, k].reshape(TILE_N, 1) for k in range(5)]
    b = [b2_ref[k, :].reshape(1, TILE_M) for k in range(5)]
    ca = _corners(*a)  # 4 x ((TN,1), (TN,1))
    cb = _corners(*b)  # 4 x ((1,TM), (1,TM))

    f32 = jnp.float32
    zero = jnp.zeros((TILE_N, TILE_M), f32)

    # polygon register file: 8 vertex slots, per-lane count
    px = [zero + cx for (cx, _) in ca] + [zero] * 4
    py = [zero + cy for (_, cy) in ca] + [zero] * 4
    cnt = jnp.full((TILE_N, TILE_M), 4, jnp.int32)

    for e in range(4):  # clip against edge e of B (CCW: inside = cross >= 0)
        ex0, ey0 = cb[e]
        ex1, ey1 = cb[(e + 1) % 4]
        dx, dy = ex1 - ex0, ey1 - ey0

        nx = [zero] * _MAX_V
        ny = [zero] * _MAX_V
        ncnt = jnp.zeros((TILE_N, TILE_M), jnp.int32)

        def side(qx, qy):
            return dx * (qy - ey0) - dy * (qx - ex0)

        sides = [side(px[k], py[k]) for k in range(_MAX_V)]
        for k in range(_MAX_V):
            kn = (k + 1) % _MAX_V
            active = cnt > k
            wrap = cnt == (k + 1)
            qx, qy = px[k], py[k]
            rx = jnp.where(wrap, px[0], px[kn])
            ry = jnp.where(wrap, py[0], py[kn])
            s_cur = sides[k]
            s_nxt = jnp.where(wrap, sides[0], sides[kn])
            in_cur = s_cur >= -_INSIDE_EPS
            in_nxt = s_nxt >= -_INSIDE_EPS

            # segment x clip-line intersection (valid when signs differ)
            den = s_cur - s_nxt
            t = s_cur / jnp.where(jnp.abs(den) < _EPS, 1.0, den)
            ix = qx + t * (rx - qx)
            iy = qy + t * (ry - qy)

            emit_cur = active & in_cur
            for s in range(_MAX_V):
                hit = emit_cur & (ncnt == s)
                nx[s] = jnp.where(hit, qx, nx[s])
                ny[s] = jnp.where(hit, qy, ny[s])
            ncnt = ncnt + emit_cur.astype(jnp.int32)

            emit_x = active & (in_cur != in_nxt)
            for s in range(_MAX_V):
                hit = emit_x & (ncnt == s)
                nx[s] = jnp.where(hit, ix, nx[s])
                ny[s] = jnp.where(hit, iy, ny[s])
            ncnt = ncnt + emit_x.astype(jnp.int32)

        px, py, cnt = nx, ny, ncnt

    # shoelace over the clipped polygon (CCW input + CCW clip -> CCW)
    area = zero
    for k in range(_MAX_V):
        kn = (k + 1) % _MAX_V
        active = cnt > k
        wrap = cnt == (k + 1)
        rx = jnp.where(wrap, px[0], px[kn])
        ry = jnp.where(wrap, py[0], py[kn])
        area = area + jnp.where(active, px[k] * ry - rx * py[k], 0.0)
    area = 0.5 * area
    out_ref[...] = jnp.where(cnt >= 3, jnp.maximum(area, 0.0), 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rotated_intersection_bev_pallas(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(N, 5) x (M, 5) [x, y, w, l, yaw] -> (N, M) intersection areas."""
    n, m = boxes1.shape[0], boxes2.shape[0]
    pn = (-n) % TILE_N
    pm = (-m) % TILE_M
    # pad with unit boxes (keeps the clip polygon well-conditioned)
    b1 = jnp.pad(boxes1.astype(jnp.float32), ((0, pn), (0, 0)),
                 constant_values=1.0)  # (N', 5)
    b2 = jnp.pad(boxes2.astype(jnp.float32), ((0, pm), (0, 0)),
                 constant_values=1.0).T  # (5, M')
    npad, mpad = n + pn, m + pm

    out = pl.pallas_call(
        _intersect_kernel,
        grid=(npad // TILE_N, mpad // TILE_M),
        in_specs=[
            pl.BlockSpec((TILE_N, 5), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, TILE_M), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, TILE_M), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((npad, mpad), jnp.float32),
        interpret=interpret,
    )(b1, b2)
    return out[:n, :m]
