"""Fused modulated bilinear sampling — the second-generation DCN gather.

``hat_sample_2d(x, ys, xs, scale)`` computes, for fractional coordinates,

    out[b, p, :] = scale[b, p] * bilinear(x[b], ys[b, p], xs[b, p])

entirely inside one Pallas kernel per pass. Ideas over the first-gen one-hot
gather (`minddet_tpu.ops.bilinear`):

1. **Hat weights instead of corner one-hots.** Over the integer grid, the
   bilinear weight of source texel (r, c) for a sample at (ys, xs) is exactly
   ``relu(1 - |r - ys|) * relu(1 - |c - xs|)`` — one separable expression
   covers all four corners at once and is *naturally zero outside the image*
   (the grid simply ends), which is precisely the out-of-bounds-is-zero
   convention. No corner indices, no (B, P, 4) arrays, no concatenates, and
   the DCNv2 modulation mask folds in as a third factor for free.
2. **Cheap expansion of compact factors.** The (WINDOW, TILE) weight matrix
   is (row factor) * (column factor); both are built compact — (WROWS, TILE)
   and (W, TILE) — then the column factor expands by ``pltpu.repeat`` (a
   whole-block tile repeat along sublanes, one copy) and the row factor by a
   tiny static 0/1 matmul on the MXU, so the VPU only touches the small
   factors and one dense product. (Mosaic has no minor-dim reshape, which
   rules out the broadcast-reshape expansion.)
3. **Row-aligned dynamic windows.** DCN offsets are local, so the samples of
   one position tile live in a handful of consecutive image rows. A per-tile
   window base row (computed on the host side of the graph, SMEM-resident)
   lets each grid step touch one ``WROWS*W`` slice of the feature map; tiles
   whose samples spill (rare — huge offsets) take a full static sweep
   fallback inside the same kernel.
4. **One merged backward kernel.** d(features), d(ys), d(xs) and d(scale)
   share the factor builds, the expansion products and the g tile, so the
   backward is a single grid pass: ``accT @ g`` accumulates into an f32 VMEM
   scratch image (flushed to the output dtype once per batch element — grid
   is (B, P_tiles); the first-gen kernel's (B, chunks, P_tiles) scatter grid
   was the single most expensive op in the CenterNet train step), and the
   coordinate grads reduce the (WINDOW, TILE) cross-correlation
   ``x_win @ g^T`` against the hat derivatives with two more small static
   matmuls (group-by-row / group-by-column).

Everything is phrased in the transposed (WINDOW, TILE) orientation so the
coordinate inputs stay lane-major — ``(B, 1, P)`` views of the natural
``(B, P)`` arrays, which are free bitcasts rather than relayouts.

Replaces the sampling half of Ascend ``ops.deformable_conv2d``
(``centernet/src/resnet.py:95-105`` in the reference). The XLA path (CPU,
odd shapes) reuses the corner-gather fallback from `ops.bilinear`.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minddet_tpu.ops.bilinear import bilinear_sample_2d as _xla_sample

# Samples per grid step (HAT_TILE_P env lever for A/B sweeps). The kernel's
# per-sample cost is WINDOW*C MACs vs the ideal 4*C, so (TILE, WINDOW) set
# the FLOP inflation directly: halving both halves total work IF tiles still
# fit their windows (smaller tiles span fewer position rows).
_TILE_P = int(os.environ.get("HAT_TILE_P", "256"))
# Window texels per fast-path matmul. A 256-sample tile spans ~1-2 image rows
# of positions plus the 3x3 tap spread, so 8 rows (at W=64) fit comfortably
# for the offset magnitudes DCN actually learns; tiles that spill take the
# exact full-sweep fallback. 512 measured 13.3 ms/step faster than 1024 on
# the CenterNet bs16 train step (58.2 vs 71.5 ms). HAT_MAX_WINDOW env lever.
_MAX_WINDOW = int(os.environ.get("HAT_MAX_WINDOW", "512"))
# Budget for the *backward* kernel's resident VMEM set — its worst case is
# x + dx (same size) + a full f32 scratch image, i.e. h*w*c*(2*elt + 4)
# bytes, ~4x the forward's x footprint. Gating on that (not on x alone)
# leaves headroom in 16 MB VMEM for the tile buffers and avoids a Mosaic
# allocation failure with no fallback on maps near the cap. The largest
# CenterNet map (64x64x128 bf16) needs 4 MB, well inside the budget.
_MAX_VMEM_BWD_BYTES = 8 * 1024 * 1024


def _pad_to(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _plan(h: int, w: int, c: int, x_bytes: int) -> Optional[Tuple[int, int]]:
    """(wrows, n_windows) or None when the pallas path doesn't apply.

    The window is a whole number of image rows so its linear-index base is
    ``base_row * w`` (keeps the column factor static). Sublane alignment of
    the dynamic slice needs ``w % 8 == 0`` unless the window covers the full
    map.
    """
    if h * w * c * (2 * x_bytes + 4) > _MAX_VMEM_BWD_BYTES:
        return None
    if w % 8 or h % 8:
        # Mosaic requires the (sublane) image dims 8-aligned: the backward
        # kernel fails to compile at w<8 ("cannot statically prove that index
        # in dimension 1 is a multiple of 8", verified on TPU at 2x2/4x4;
        # 8x8 and up compile). Tiny maps fall back to the XLA gather path.
        return None
    wrows = max(1, min(h, _MAX_WINDOW // max(w, 1)))
    while h % wrows:  # windows must tile the map exactly
        wrows -= 1
    if wrows < h and (w % 8 or wrows < 3):
        return None  # unaligned dynamic base / window too thin to be useful
    return wrows, h // wrows


def _row_expander(w: int, wrows: int):
    """Static (WINDOW, WROWS) 0/1 bf16: E[q, r] = 1 iff texel q is in window
    row r. ``E @ row_factor`` broadcasts the compact row factor on the MXU."""
    win = wrows * w
    lin = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    rids = jax.lax.broadcasted_iota(jnp.int32, (1, wrows), 1)
    return (lin // w == rids).astype(jnp.bfloat16)


def _col_grouper(w: int, wrows: int):
    """Static (W, WINDOW) 0/1 bf16: G[c, q] = 1 iff texel q is in image
    column c. ``G @ m`` sums a (WINDOW, TILE) matrix over rows per column."""
    win = wrows * w
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)
    qrow = lin // w
    cids = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    return (lin - qrow * w == cids).astype(jnp.bfloat16)


def _row_grouper(w: int, wrows: int):
    """Static (WROWS, WINDOW) 0/1 bf16 — transpose of `_row_expander`, built
    directly to avoid an in-kernel transpose."""
    win = wrows * w
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)
    rids = jax.lax.broadcasted_iota(jnp.int32, (wrows, 1), 0)
    return (lin // w == rids).astype(jnp.bfloat16)


def _factors(ys, xs, base_row, w, wrows, grad=False):
    """Compact hat factors from lane-major coords ys/xs (1, TP).

    Returns hy (WROWS, TP) and hx (W, TP) and, with ``grad``, their
    derivatives wrt ys/xs.
    """
    rowv = jax.lax.broadcasted_iota(jnp.int32, (wrows, 1), 0).astype(
        jnp.float32) + base_row
    colv = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).astype(jnp.float32)
    drow = rowv - ys  # (WROWS, TP)
    dcol = colv - xs  # (W, TP)
    hy = jnp.maximum(1.0 - jnp.abs(drow), 0.0)
    hx = jnp.maximum(1.0 - jnp.abs(dcol), 0.0)
    if not grad:
        return hy, hx
    # d/dys relu(1 - |r - ys|) = sign(r - ys) on the open support
    dhy = jnp.where(jnp.abs(drow) < 1.0, jnp.sign(drow), 0.0)
    dhx = jnp.where(jnp.abs(dcol) < 1.0, jnp.sign(dcol), 0.0)
    return hy, hx, dhy, dhx


def _expand(e, hy, hx, wrows):
    """accT (WINDOW, TP) f32 = (E @ hy) * tile-repeat(hx)."""
    hye = jnp.dot(e, hy.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    hxe = pltpu.repeat(hx, wrows, axis=0)
    return hye * hxe


# ---------------------------------------------------------------------------
# Kernels (grid = (B, P_tiles); coords lane-major (1, 1, TP) blocks)
# ---------------------------------------------------------------------------

def _fwd_kernel(h, w, wrows, nwin, meta_ref, ys_ref, xs_ref, sc_ref, x_ref,
                out_ref):
    """meta (1, PT, 2) SMEM [base_row, fits]; x (1, HW, C); out (1, TP, C)."""
    pt = pl.program_id(1)
    win = wrows * w
    ys = ys_ref[0]  # (1, TP)
    xs = xs_ref[0]
    sc = sc_ref[0].astype(jnp.float32)
    e = _row_expander(w, wrows)

    def win_out(base_row, x_win):
        hy, hx = _factors(ys, xs, base_row, w, wrows)
        acc_t = _expand(e, hy, hx * sc, wrows)
        return jax.lax.dot_general(
            acc_t.astype(jnp.bfloat16), x_win.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TP, C)

    @pl.when(meta_ref[0, pt, 1] > 0)
    def _fast():
        base = meta_ref[0, pt, 0]
        r0 = pl.multiple_of(base * w, 8 if w % 8 == 0 else 1)
        out_ref[0] = win_out(
            base.astype(jnp.float32), x_ref[0, pl.ds(r0, win), :]
        ).astype(out_ref.dtype)

    @pl.when(meta_ref[0, pt, 1] == 0)
    def _sweep():
        out_ref[0] = jnp.zeros_like(out_ref[0])
        for k in range(nwin):
            out_ref[0] += win_out(
                jnp.float32(k * wrows), x_ref[0, k * win:(k + 1) * win, :]
            ).astype(out_ref.dtype)


def _bwd_kernel(h, w, wrows, nwin, meta_ref, ys_ref, xs_ref, sc_ref, g_ref,
                x_ref, dx_ref, dys_ref, dxs_ref, dsc_ref, dxacc_ref):
    """Merged backward. g (1, TP, C); x (1, HW, C); dx (1, HW, C) out in the
    feature dtype; dys/dxs/dsc lane-major (1, 1, TP) f32; dxacc (HW, C) f32
    VMEM scratch accumulated across the p-tiles of one batch element and
    flushed to dx once at the last tile."""
    pt = pl.program_id(1)
    npt = pl.num_programs(1)
    win = wrows * w
    ys = ys_ref[0]
    xs = xs_ref[0]
    sc = sc_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.bfloat16)
    e = _row_expander(w, wrows)
    et = _row_grouper(w, wrows)  # (WROWS, WINDOW) group-by-row reducer
    gc = _col_grouper(w, wrows)

    @pl.when(pt == 0)
    def _():
        dxacc_ref[:] = jnp.zeros_like(dxacc_ref)

    def win_grads(base_row, x_win):
        hy, hx, dhy, dhx = _factors(ys, xs, base_row, w, wrows, grad=True)
        hxe = pltpu.repeat(hx, wrows, axis=0)        # (WINDOW, TP)
        hye = jnp.dot(e, hy.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        acc_t = (hye * hxe * sc).astype(jnp.bfloat16)
        dxw = jnp.dot(acc_t, g, preferred_element_type=jnp.float32)
        m = jax.lax.dot_general(                      # (WINDOW, TP)
            x_win.astype(jnp.bfloat16), g,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # group m*hxe by window row, m*hye by image column (static matmuls)
        s1 = jnp.dot(et, (m * hxe).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)  # (WROWS, TP)
        s2 = jnp.dot(gc, (m * hye).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)  # (W, TP)
        d_ys = jnp.sum(s1 * dhy, axis=0, keepdims=True)   # (1, TP)
        d_xs = jnp.sum(s2 * dhx, axis=0, keepdims=True)
        d_sc = jnp.sum(s1 * hy, axis=0, keepdims=True)
        return dxw, d_ys, d_xs, d_sc

    @pl.when(meta_ref[0, pt, 1] > 0)
    def _fast():
        base = meta_ref[0, pt, 0]
        r0 = pl.multiple_of(base * w, 8 if w % 8 == 0 else 1)
        dxw, d_ys, d_xs, d_sc = win_grads(base.astype(jnp.float32),
                                          x_ref[0, pl.ds(r0, win), :])
        dxacc_ref[pl.ds(r0, win), :] += dxw
        dys_ref[0] = d_ys * sc
        dxs_ref[0] = d_xs * sc
        dsc_ref[0] = d_sc

    @pl.when(meta_ref[0, pt, 1] == 0)
    def _sweep():
        dys_ref[0] = jnp.zeros_like(dys_ref[0])
        dxs_ref[0] = jnp.zeros_like(dxs_ref[0])
        dsc_ref[0] = jnp.zeros_like(dsc_ref[0])
        for k in range(nwin):
            dxw, d_ys, d_xs, d_sc = win_grads(
                jnp.float32(k * wrows), x_ref[0, k * win:(k + 1) * win, :])
            dxacc_ref[k * win:(k + 1) * win, :] += dxw
            dys_ref[0] += d_ys * sc
            dxs_ref[0] += d_xs * sc
            dsc_ref[0] += d_sc

    @pl.when(pt == npt - 1)
    def _flush():
        dx_ref[0] = dxacc_ref[:].astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# Tap-grouped kernels (grid = (B, position tiles); K taps per position)
#
# The DCN consumer wants samples laid out (B, P, K*C) — position-major with
# the K taps contiguous per position — because the weight contraction is
# ``samp.reshape(B, P, K*C) @ W(K*C, Cout)``. The flat sampler above returns
# (B, P*K, C); the relayout to (B, P, K*C) crosses the lane boundary and cost
# ~5 ms/step of pure data formatting in the CenterNet bs16 train step (three
# 64x64x128 DCN layers x fwd samp / bwd dsamp / weight-grad relayouts, round-4
# trace). These kernels take tap-major coords (B, K, P) and write each tap's
# (TILE_P, C) product straight into its lane slice of a (TILE_P, K*C) output
# block, so the matmul consumes kernel output with no relayout at all.
#
# Window metadata is per (position tile, tap): each tap's samples sit within
# ~1 image row of its positions, so per-tap windows keep the same spill slack
# as the flat kernel's sample tiles while sharing one VMEM-resident image.
# ---------------------------------------------------------------------------


def _tap_groups(k_taps: int) -> list:
    """Taps fused per MXU dot. Grouping G taps widens the per-window dot
    from (WIN, TP) to (WIN, G*TP) — the r5 trace showed the per-tap
    (512, 256)x(512, 128) dots run the fwd taps kernel ~4.6x off the MXU
    ideal (3.1 ms vs 14.2 measured at stage-2), and the window x-slice +
    factor machinery re-ran once per tap. All 9 taps at once blows the
    ~16 MB VMEM budget in the backward (the (WIN, K*TP) f32
    cross-correlation alone is 4.7 MB, x3 sibling temporaries), so taps
    fuse in groups (HAT_TAP_GROUP, default 3) over ONE shared per-tile
    union window (`_meta_taps`)."""
    g = max(1, int(os.environ.get("HAT_TAP_GROUP", "3")))
    return [list(range(s, min(s + g, k_taps))) for s in range(0, k_taps, g)]


def _fwd_taps_kernel(h, w, wrows, nwin, k_taps, c, meta_ref, ys_ref, xs_ref,
                     sc_ref, x_ref, out_ref):
    """meta (1, PT, 2) SMEM (per-tile UNION window over all taps);
    ys/xs/sc (1, K, TP); x (1, HW, C); out (1, TP, K*C)."""
    pt = pl.program_id(1)
    win = wrows * w
    e = _row_expander(w, wrows)
    tp = out_ref.shape[1]
    base = meta_ref[0, pt, 0]
    fits = meta_ref[0, pt, 1]

    for ks in _tap_groups(k_taps):
        def win_out(base_row, x_win, ks=ks):
            hy_l, hxs_l = [], []
            for k in ks:
                ys = ys_ref[0, k:k + 1, :]  # (1, TP)
                xs = xs_ref[0, k:k + 1, :]
                sc = sc_ref[0, k:k + 1, :].astype(jnp.float32)
                hy, hx = _factors(ys, xs, base_row, w, wrows)
                hy_l.append(hy)
                hxs_l.append(hx * sc)
            # lane-concat the group's factors -> ONE (WIN, G*TP) x (WIN, C)
            # dot instead of G small ones
            acc_t = _expand(e, jnp.concatenate(hy_l, axis=1),
                            jnp.concatenate(hxs_l, axis=1), wrows)
            return jax.lax.dot_general(
                acc_t.astype(jnp.bfloat16), x_win.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G*TP, C)

        # ONE window loop per group with a dynamic trip count: 1 iteration
        # over the tile's union window when every tap's samples fit (the
        # overwhelmingly common case), nwin full-map iterations when they
        # spill. A single `win_out` instantiation per group matters: a
        # statically unrolled sweep branch bloated the kernel enough to
        # cost ~2x in the backward (measured tools/microbench_hat_taps.py).
        def body(j, acc, base=base, fits=fits, win_out=win_out):
            base_j = jnp.where(fits > 0, base, j * wrows)
            r0 = pl.multiple_of(base_j * w, 8 if w % 8 == 0 else 1)
            return acc + win_out(base_j.astype(jnp.float32),
                                 x_ref[0, pl.ds(r0, win), :])

        acc = jax.lax.fori_loop(
            0, jnp.where(fits > 0, 1, nwin), body,
            jnp.zeros((len(ks) * tp, c), jnp.float32))
        for i, k in enumerate(ks):
            out_ref[0, :, k * c:(k + 1) * c] = (
                acc[i * tp:(i + 1) * tp].astype(out_ref.dtype))


def _bwd_taps_kernel(h, w, wrows, nwin, k_taps, c, meta_ref, ys_ref, xs_ref,
                     sc_ref, g_ref, x_ref, dx_ref, dys_ref, dxs_ref, dsc_ref,
                     dxacc_ref):
    """g (1, TP, K*C) — the dsamp layout the weight-matmul backward emits;
    meta (1, PT, 2) per-tile union window; dys/dxs/dsc (1, K, TP) f32; dx
    flushed from an f32 scratch image per batch element, as in the flat
    kernel."""
    pt = pl.program_id(1)
    npt = pl.num_programs(1)
    win = wrows * w
    e = _row_expander(w, wrows)
    et = _row_grouper(w, wrows)
    gc = _col_grouper(w, wrows)
    tp = g_ref.shape[1]
    base = meta_ref[0, pt, 0]
    fits = meta_ref[0, pt, 1]

    @pl.when(pt == 0)
    def _():
        dxacc_ref[:] = jnp.zeros_like(dxacc_ref)

    for ks in _tap_groups(k_taps):
        # g re-layout (TP, G*C lane slices) -> (G*TP, C): G aligned block
        # copies, so every per-tap dot below fuses into one per group
        g_stack = jnp.concatenate(
            [g_ref[0, :, k * c:(k + 1) * c] for k in ks], axis=0
        ).astype(jnp.bfloat16)  # (G*TP, C)
        def win_grads(base_row, x_win, ks=ks, g_stack=g_stack):
            # sc folds into a SECOND (sc-laden) hx per tap BEFORE the lane
            # concat: a direct concat of per-tap (1, TP) sc slices trips
            # Mosaic ("result/input offset mismatch on non-concat
            # dimension" — the slices carry sublane offset k), while the
            # elementwise hx * sc broadcast relayouts transparently
            hy_l, hx_l, hxs_l, dhy_l, dhx_l = [], [], [], [], []
            for k in ks:
                ys = ys_ref[0, k:k + 1, :]
                xs = xs_ref[0, k:k + 1, :]
                sc = sc_ref[0, k:k + 1, :].astype(jnp.float32)
                hy, hx, dhy, dhx = _factors(ys, xs, base_row, w, wrows,
                                            grad=True)
                hy_l.append(hy)
                hx_l.append(hx)
                hxs_l.append(hx * sc)
                dhy_l.append(dhy)
                dhx_l.append(dhx)
            hy = jnp.concatenate(hy_l, axis=1)    # (WROWS, G*TP)
            hx = jnp.concatenate(hx_l, axis=1)    # (W, G*TP)
            hxs = jnp.concatenate(hxs_l, axis=1)  # (W, G*TP), sc-laden
            dhy = jnp.concatenate(dhy_l, axis=1)
            dhx = jnp.concatenate(dhx_l, axis=1)
            hxe = pltpu.repeat(hx, wrows, axis=0)  # (WIN, G*TP), sc-free
            hye = jnp.dot(e, hy.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            acc_t = (hye * pltpu.repeat(hxs, wrows, axis=0)).astype(
                jnp.bfloat16)
            dxw = jnp.dot(acc_t, g_stack, preferred_element_type=jnp.float32)
            m = jax.lax.dot_general(
                x_win.astype(jnp.bfloat16), g_stack,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (WIN, G*TP)
            s1 = jnp.dot(et, (m * hxe).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            s2 = jnp.dot(gc, (m * hye).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            d_ys = jnp.sum(s1 * dhy, axis=0, keepdims=True)  # (1, G*TP)
            d_xs = jnp.sum(s2 * dhx, axis=0, keepdims=True)
            d_sc = jnp.sum(s1 * hy, axis=0, keepdims=True)
            return dxw, d_ys, d_xs, d_sc

        # single win_grads instantiation per group, dynamic trip count (see
        # the forward kernel's note — an unrolled sweep cost ~2x here)
        def body(j, carry, base=base, fits=fits, win_grads=win_grads):
            a_ys, a_xs, a_sc = carry
            base_j = jnp.where(fits > 0, base, j * wrows)
            r0 = pl.multiple_of(base_j * w, 8 if w % 8 == 0 else 1)
            dxw, d_ys, d_xs, d_sc = win_grads(base_j.astype(jnp.float32),
                                              x_ref[0, pl.ds(r0, win), :])
            dxacc_ref[pl.ds(r0, win), :] += dxw
            return (a_ys + d_ys, a_xs + d_xs, a_sc + d_sc)

        zero = jnp.zeros((1, len(ks) * tp), jnp.float32)
        a_ys, a_xs, a_sc = jax.lax.fori_loop(
            0, jnp.where(fits > 0, 1, nwin), body, (zero, zero, zero))
        for i, k in enumerate(ks):
            # the coordinate grads' trailing sc factor applies per tap at
            # write time (elementwise; no cross-offset concat needed)
            sc = sc_ref[0, k:k + 1, :].astype(jnp.float32)
            dys_ref[0, k:k + 1, :] = a_ys[:, i * tp:(i + 1) * tp] * sc
            dxs_ref[0, k:k + 1, :] = a_xs[:, i * tp:(i + 1) * tp] * sc
            dsc_ref[0, k:k + 1, :] = a_sc[:, i * tp:(i + 1) * tp]

    @pl.when(pt == npt - 1)
    def _flush():
        dx_ref[0] = dxacc_ref[:].astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _meta(ys, pp, tp, h, wrows):
    """(B, PT, 2) int32 [base_row, fits] per position tile."""
    b = ys.shape[0]
    tiles = ys.reshape(b, pp // tp, tp)
    lo = jnp.clip(jnp.floor(jnp.min(tiles, axis=2)), 0, h - 1).astype(jnp.int32)
    hi = jnp.clip(jnp.floor(jnp.max(tiles, axis=2)) + 1, 0, h - 1).astype(jnp.int32)
    base = jnp.minimum(lo, h - wrows)
    fits = (hi < base + wrows).astype(jnp.int32)
    if wrows >= h:
        base = jnp.zeros_like(base)
        fits = jnp.ones_like(fits)
    return jnp.stack([base, fits], axis=-1)


def _prep(ys, xs, scale, p):
    """Pad P to a tile multiple; padded samples get far-out coords (all hats
    zero) and zero scale, so they contribute nothing anywhere."""
    tp = min(_TILE_P, _pad_to(p, 128))
    pp = _pad_to(p, tp)
    if pp != p:
        pad = ((0, 0), (0, pp - p))
        ys = jnp.pad(ys, pad, constant_values=-1e6)
        xs = jnp.pad(xs, pad, constant_values=-1e6)
        scale = jnp.pad(scale, pad)
    return ys, xs, scale, tp, pp


def _fwd_pallas(x, ys, xs, scale, plan, interpret=False):
    b, hw, c = x.shape
    wrows, nwin, w = plan
    h = hw // w
    p = ys.shape[1]
    ys, xs, scale, tp, pp = _prep(ys, xs, scale, p)
    meta = _meta(ys, pp, tp, h, wrows)
    lane_t = pl.BlockSpec((1, 1, tp), lambda bi, pi: (bi, 0, pi),
                          memory_space=pltpu.VMEM)
    row = lambda a: a.reshape(b, 1, pp)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h, w, wrows, nwin),
        grid=(b, pp // tp),
        in_specs=[
            pl.BlockSpec((1, pp // tp, 2), lambda bi, pi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            lane_t, lane_t, lane_t,
            pl.BlockSpec((1, hw, c), lambda bi, pi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, c), lambda bi, pi: (bi, pi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, pp, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * pp * wrows * w * c,
            bytes_accessed=b * (hw * c + pp * c) * 2, transcendentals=0,
        ),
    )(meta, row(ys), row(xs), row(scale), x)
    return out[:, :p]


def _bwd_pallas(g, x, ys, xs, scale, plan, interpret=False):
    b, hw, c = x.shape
    wrows, nwin, w = plan
    h = hw // w
    p = ys.shape[1]
    ys, xs, scale, tp, pp = _prep(ys, xs, scale, p)
    if pp != p:
        g = jnp.pad(g, ((0, 0), (0, pp - p), (0, 0)))
    meta = _meta(ys, pp, tp, h, wrows)
    lane_t = pl.BlockSpec((1, 1, tp), lambda bi, pi: (bi, 0, pi),
                          memory_space=pltpu.VMEM)
    row = lambda a: a.reshape(b, 1, pp)
    dx, dys, dxs, dsc = pl.pallas_call(
        functools.partial(_bwd_kernel, h, w, wrows, nwin),
        grid=(b, pp // tp),
        in_specs=[
            pl.BlockSpec((1, pp // tp, 2), lambda bi, pi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            lane_t, lane_t, lane_t,
            pl.BlockSpec((1, tp, c), lambda bi, pi: (bi, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, c), lambda bi, pi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hw, c), lambda bi, pi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            lane_t, lane_t, lane_t,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hw, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, pp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, pp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, pp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((hw, c), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * pp * wrows * w * c,
            bytes_accessed=b * (hw * c * 2 + 2 * pp * c) * 2,
            transcendentals=0,
        ),
    )(meta, row(ys), row(xs), row(scale), g, x)
    return dx, dys[:, 0, :p], dxs[:, 0, :p], dsc[:, 0, :p]


# ---------------------------------------------------------------------------
# Tap-grouped host wrappers
# ---------------------------------------------------------------------------


def _meta_taps(ys, pp, tp, h, wrows):
    """(B, PT, 2) int32 [base_row, fits]: the UNION window of all K taps
    per position tile (tap-group fusion shares one window; per-tap windows
    would force one x-slice load + one small dot per tap — the r5 finding).
    The union spans ~2 extra rows vs a per-tap window (the 3x3 taps' +-1
    row offsets), so marginal tiles spill to the sweep slightly earlier;
    at bench shapes (TP=256 -> 4 position rows, wrows=8) it still fits."""
    b, k = ys.shape[0], ys.shape[1]
    tiles = ys.reshape(b, k, pp // tp, tp)
    lo = jnp.clip(jnp.floor(jnp.min(tiles, axis=(1, 3))),
                  0, h - 1).astype(jnp.int32)
    hi = jnp.clip(jnp.floor(jnp.max(tiles, axis=(1, 3))) + 1,
                  0, h - 1).astype(jnp.int32)
    base = jnp.minimum(lo, h - wrows)
    fits = (hi < base + wrows).astype(jnp.int32)
    if wrows >= h:
        base = jnp.zeros_like(base)
        fits = jnp.ones_like(fits)
    return jnp.stack([base, fits], axis=-1)


def _prep_taps(ys, xs, scale, p):
    tp = min(_TILE_P, _pad_to(p, 128))
    pp = _pad_to(p, tp)
    if pp != p:
        pad = ((0, 0), (0, 0), (0, pp - p))
        ys = jnp.pad(ys, pad, constant_values=-1e6)
        xs = jnp.pad(xs, pad, constant_values=-1e6)
        scale = jnp.pad(scale, pad)
    return ys, xs, scale, tp, pp


def _fwd_taps_pallas(x, ys, xs, scale, plan, interpret=False):
    b, hw, c = x.shape
    wrows, nwin, w = plan
    h = hw // w
    k, p = ys.shape[1], ys.shape[2]
    ys, xs, scale, tp, pp = _prep_taps(ys, xs, scale, p)
    meta = _meta_taps(ys, pp, tp, h, wrows)
    tap_t = pl.BlockSpec((1, k, tp), lambda bi, pi: (bi, 0, pi),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_taps_kernel, h, w, wrows, nwin, k, c),
        grid=(b, pp // tp),
        in_specs=[
            pl.BlockSpec((1, pp // tp, 2), lambda bi, pi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            tap_t, tap_t, tap_t,
            pl.BlockSpec((1, hw, c), lambda bi, pi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, k * c), lambda bi, pi: (bi, pi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, pp, k * c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * pp * k * wrows * w * c,
            bytes_accessed=b * (hw * c + pp * k * c) * 2, transcendentals=0,
        ),
    )(meta, ys, xs, scale, x)
    return out[:, :p]


def _bwd_taps_pallas(g, x, ys, xs, scale, plan, interpret=False):
    b, hw, c = x.shape
    wrows, nwin, w = plan
    h = hw // w
    k, p = ys.shape[1], ys.shape[2]
    ys, xs, scale, tp, pp = _prep_taps(ys, xs, scale, p)
    if pp != p:
        g = jnp.pad(g, ((0, 0), (0, pp - p), (0, 0)))
    meta = _meta_taps(ys, pp, tp, h, wrows)
    tap_t = pl.BlockSpec((1, k, tp), lambda bi, pi: (bi, 0, pi),
                         memory_space=pltpu.VMEM)
    dx, dys, dxs, dsc = pl.pallas_call(
        functools.partial(_bwd_taps_kernel, h, w, wrows, nwin, k, c),
        grid=(b, pp // tp),
        in_specs=[
            pl.BlockSpec((1, pp // tp, 2), lambda bi, pi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            tap_t, tap_t, tap_t,
            pl.BlockSpec((1, tp, k * c), lambda bi, pi: (bi, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, c), lambda bi, pi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hw, c), lambda bi, pi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            tap_t, tap_t, tap_t,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hw, c), x.dtype),
            jax.ShapeDtypeStruct((b, k, pp), jnp.float32),
            jax.ShapeDtypeStruct((b, k, pp), jnp.float32),
            jax.ShapeDtypeStruct((b, k, pp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((hw, c), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * pp * k * wrows * w * c,
            bytes_accessed=b * (hw * c * 2 + 2 * pp * k * c) * 2,
            transcendentals=0,
        ),
    )(meta, ys, xs, scale, g, x)
    return dx, dys[:, :, :p], dxs[:, :, :p], dsc[:, :, :p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _hat_taps_op(x, ys, xs, scale, plan, dtype, interpret):
    return _fwd_taps_pallas(x, ys, xs, scale, plan, interpret=interpret)


def _hat_taps_fwd(x, ys, xs, scale, plan, dtype, interpret):
    out = _hat_taps_op(x, ys, xs, scale, plan, dtype, interpret)
    return out, (x, ys, xs, scale)


def _hat_taps_bwd(plan, dtype, interpret, res, g):
    x, ys, xs, scale = res
    dx, dys, dxs, dsc = _bwd_taps_pallas(g, x, ys, xs, scale, plan,
                                         interpret=interpret)
    return (dx, dys.astype(ys.dtype), dxs.astype(xs.dtype),
            dsc.astype(scale.dtype))


_hat_taps_op.defvjp(_hat_taps_fwd, _hat_taps_bwd)


def _xla_taps(x, ys, xs, scale):
    """(B, K, P) coords -> (B, P, K*C) via the flat XLA sampler."""
    b, k, p = ys.shape
    c = x.shape[-1]
    out = _xla_path(x, ys.reshape(b, k * p), xs.reshape(b, k * p),
                    scale.reshape(b, k * p))  # (B, K*P, C)
    return out.reshape(b, k, p, c).transpose(0, 2, 1, 3).reshape(b, p, k * c)


def hat_sample_2d_taps(
    x: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    implementation: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Tap-grouped modulated sampling: (B, H, W, C) at (B, K, P) coords ->
    (B, P, K*C), tap k in lane slice [k*C, (k+1)*C).

    The layout a DCN weight contraction ``out @ W(K*C, Cout)`` consumes with
    zero relayout, fwd and bwd. Requires C % 128 == 0 on the Pallas path
    (lane-aligned per-tap slices); otherwise falls back to the XLA gather.
    """
    b, h, w, c = x.shape
    if scale is None:
        scale = jnp.ones_like(ys)
    impl = _resolve(x, implementation)
    plan = _plan(h, w, c, 2 if x.dtype == jnp.bfloat16 else 4)
    if impl != "pallas" or plan is None or (c % 128 and not interpret):
        return _xla_taps(x, ys, xs, scale)
    flat = x.reshape(b, h * w, c)
    return _hat_taps_op(flat, ys, xs, scale, (plan[0], plan[1], w), x.dtype,
                        interpret)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

def _xla_path(x, ys, xs, scale):
    out = _xla_sample(x, ys, xs, implementation="xla")
    return out * scale[..., None].astype(out.dtype)


def _resolve(x_hwc, implementation):
    if implementation != "auto":
        return implementation
    # an explicit jax.default_device(cpu) context (e.g. eager CPU init with
    # the TPU as the primary backend) must get the XLA path — Pallas only
    # lowers for TPU
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) not in ("tpu", "axon"):
        return "xla"
    on_tpu = any(d.platform in ("tpu", "axon") for d in jax.devices())
    return "pallas" if on_tpu else "xla"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _hat_op(x, ys, xs, scale, plan, dtype, interpret):
    return _fwd_pallas(x, ys, xs, scale, plan, interpret=interpret)


def _hat_fwd(x, ys, xs, scale, plan, dtype, interpret):
    out = _hat_op(x, ys, xs, scale, plan, dtype, interpret)
    return out, (x, ys, xs, scale)


def _hat_bwd(plan, dtype, interpret, res, g):
    x, ys, xs, scale = res
    dx, dys, dxs, dsc = _bwd_pallas(g, x, ys, xs, scale, plan,
                                    interpret=interpret)
    return (dx, dys.astype(ys.dtype), dxs.astype(xs.dtype),
            dsc.astype(scale.dtype))


_hat_op.defvjp(_hat_fwd, _hat_bwd)


def hat_sample_2d(
    x: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    implementation: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Modulated bilinear sampling: (B, H, W, C) at (B, P) coords -> (B, P, C).

    ``scale`` (B, P) multiplies each sample (DCNv2 modulation); out-of-bounds
    contributions are zero. Differentiable wrt x, ys, xs and scale.
    """
    b, h, w, c = x.shape
    if scale is None:
        scale = jnp.ones_like(ys)
    impl = _resolve(x, implementation)
    plan = _plan(h, w, c, 2 if x.dtype == jnp.bfloat16 else 4)
    if impl != "pallas" or plan is None:
        return _xla_path(x, ys, xs, scale)
    flat = x.reshape(b, h * w, c)
    return _hat_op(flat, ys, xs, scale, (plan[0], plan[1], w), x.dtype,
                   interpret)
