"""Batched weighted row-gather ("bilinear gather") — the TPU gather primitive.

XLA's native gather is catastrophically slow on TPU (measured ~60 ms to
bilinearly sample one 64x64x128 DCN layer — it serializes row loads). This
module implements the same operation as *one-hot matmuls built on the fly in
VMEM*: for each tile of output positions we materialize a (TILE, HW) selection
matrix A with 4 weighted non-zeros per row directly in vector registers and
immediately contract it with the (HW, C) feature map on the MXU. A never
touches HBM; the op's memory traffic is just inputs + outputs.

    out[b, p, :] = sum_c cw[b, p, c] * x[b, ci[b, p, c], :]      (c = 4 corners)

This one primitive backs DCNv2 sampling, ROIAlign, and grid-sample-style
warps. It carries a custom VJP whose backward kernels follow the same
one-hot-matmul pattern (transpose-scatter for dx, sampled row-dot for dcw).

Replaces the gather halves of the reference's native ops (Ascend
``ops.deformable_conv2d``, ``centernet/src/resnet.py:95-105``; ROIAlign in
``det3d_ms/ops``). A pure-XLA fallback (`implementation="xla"`) keeps CPU
tests and non-TPU backends working.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max VMEM we allow for the resident feature map (bf16 bytes).
_MAX_VMEM_X_BYTES = 6 * 1024 * 1024
_TILE_P = 256  # output positions per grid step


def _pad_to(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

_CHUNK = 512  # source-row chunk for sparse skipping


def _fwd_kernel(hit_ref, ci_ref, cw_ref, x_ref, out_ref):
    """Grid (B, P_tiles). Blocks: hit (1, PT, NC) SMEM (full bitmap for the
    batch element, read at program_id), ci/cw (1, TP, 4), x (1, HW, C),
    out (1, TP, C).

    Sampled indices cluster (DCN offsets are local; ROI bins are compact), so
    the (TP, HW) selection matrix is block-sparse in column chunks. The hit
    bitmap is computed outside; chunks with no hits skip both the one-hot
    build (VPU) and the matmul (MXU).
    """
    tp = out_ref.shape[1]
    hw = x_ref.shape[1]
    n_chunks = hit_ref.shape[2]
    chunk = hw // n_chunks
    p_tile = pl.program_id(1)
    out_ref[0] = jnp.zeros_like(out_ref[0])
    for cki in range(n_chunks):
        @pl.when(hit_ref[0, p_tile, cki] > 0)
        def _(cki=cki):
            qcols = (
                jax.lax.broadcasted_iota(jnp.int32, (tp, chunk), 1) + cki * chunk
            )
            acc = jnp.zeros((tp, chunk), jnp.bfloat16)
            for c in range(4):
                ci = ci_ref[0][:, c : c + 1]  # (TP, 1)
                cw = cw_ref[0][:, c : c + 1]
                acc += (qcols == ci).astype(jnp.bfloat16) * cw.astype(jnp.bfloat16)
            out_ref[0] += jnp.dot(
                acc,
                x_ref[0][cki * chunk : (cki + 1) * chunk].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)


def _bwd_dx_kernel(hit_ref, ci_t_ref, cw_t_ref, g_ref, dx_ref):
    """dx[q] += sum_p A[p, q] * g[p]  (transpose scatter).

    Grid (B, Q_tiles, P_tiles), innermost p accumulates into the dx block.
    Blocks: hit (1, PT, NC) SMEM (tile TQ == source chunk, so the fwd
    bitmap applies directly); ci_t/cw_t (1, 4, TPp) transposed corner data;
    g (1, TPp, C); dx (1, TQ, C) f32.
    """
    tq = dx_ref.shape[1]
    tpp = g_ref.shape[1]
    p_tile = pl.program_id(2)

    @pl.when(p_tile == 0)
    def _():
        dx_ref[0] = jnp.zeros_like(dx_ref[0])

    q_tile = pl.program_id(1)

    @pl.when(hit_ref[0, p_tile, q_tile] > 0)
    def _():
        q0 = q_tile * tq
        qrows = jax.lax.broadcasted_iota(jnp.int32, (tq, tpp), 0) + q0
        at = jnp.zeros((tq, tpp), jnp.bfloat16)
        for c in range(4):
            ci = ci_t_ref[0][c : c + 1, :]  # (1, TPp)
            cw = cw_t_ref[0][c : c + 1, :]
            at += (qrows == ci).astype(jnp.bfloat16) * cw.astype(jnp.bfloat16)
        dx_ref[0] += jnp.dot(
            at, g_ref[0].astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )


def _bwd_dcw_kernel(hit_ref, ci_ref, g_ref, xt_ref, dcw_ref):
    """dcw[p, c] = dot(g[p], x[ci[p, c]]).

    Grid (B, P_tiles). Blocks: hit (1,1,NC) SMEM; ci (1, TP, 4);
    g (1, TP, C); xt (1, C, HW) (feature map pre-transposed); dcw (1, TP, 4)
    f32. M = g @ x^T gives every <g[p], x[q]> pair; corner selection is a
    masked row-reduction of M — computed per hit chunk only (each ci lies in
    exactly one chunk, so the chunked accumulation is exact).
    """
    tp = g_ref.shape[1]
    hw = xt_ref.shape[2]
    n_chunks = hit_ref.shape[2]
    chunk = hw // n_chunks
    p_tile = pl.program_id(1)
    dcw_ref[0] = jnp.zeros_like(dcw_ref[0])
    for cki in range(n_chunks):
        @pl.when(hit_ref[0, p_tile, cki] > 0)
        def _(cki=cki):
            m = jnp.dot(
                g_ref[0].astype(jnp.bfloat16),
                xt_ref[0][:, cki * chunk : (cki + 1) * chunk].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # (TP, chunk)
            qcols = (
                jax.lax.broadcasted_iota(jnp.int32, (tp, chunk), 1) + cki * chunk
            )
            outs = []
            for c in range(4):
                ci = ci_ref[0][:, c : c + 1]
                sel = jnp.where(qcols == ci, m, 0.0)
                outs.append(jnp.sum(sel, axis=1, keepdims=True))  # (TP, 1)
            dcw_ref[0] += jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _chunk_count(hw: int) -> int:
    return hw // _CHUNK if (hw % _CHUNK == 0 and hw > _CHUNK) else 1


def _hit_bitmap(ci, pp, tp, hw):
    """(B, P_tiles, NC) int32: does tile pt touch source chunk c.

    Conservative range form: chunks between the tile's min and max sampled
    chunk are all marked (exact for the local/contiguous index patterns of
    DCN and ROIAlign, and only ever a superset otherwise) — two reductions
    instead of a (B, PT, TP*4, NC) one-hot.
    """
    b = ci.shape[0]
    nc = _chunk_count(hw)
    chunk = hw // nc
    tiles = ci.reshape(b, pp // tp, tp * ci.shape[-1])
    ck_lo = jnp.where(tiles >= 0, tiles // chunk, nc + 1)
    ck_hi = jnp.where(tiles >= 0, tiles // chunk, -1)
    lo = jnp.min(ck_lo, axis=2, keepdims=True)  # (B, PT, 1)
    hi = jnp.max(ck_hi, axis=2, keepdims=True)
    rng = jnp.arange(nc, dtype=jnp.int32)
    return ((rng >= lo) & (rng <= hi)).astype(jnp.int32)


def _fwd_pallas(ci, cw, x, interpret=False):
    b, p, _ = ci.shape
    _, hw, ch = x.shape
    tp = min(_TILE_P, _pad_to(p, 128))
    pp = _pad_to(p, tp)
    if pp != p:
        ci = jnp.pad(ci, ((0, 0), (0, pp - p), (0, 0)), constant_values=-1)
        cw = jnp.pad(cw, ((0, 0), (0, pp - p), (0, 0)))
    nc = _chunk_count(hw)
    hit = _hit_bitmap(ci, pp, tp, hw)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(b, pp // tp),
        in_specs=[
            pl.BlockSpec((1, pp // tp, nc), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tp, 4), lambda bi, pi: (bi, pi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, 4), lambda bi, pi: (bi, pi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, ch), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tp, ch), lambda bi, pi: (bi, pi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, pp, ch), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * pp * hw * ch, bytes_accessed=b * (hw * ch + pp * ch) * 2,
            transcendentals=0,
        ),
    )(hit, ci, cw, x)
    return out[:, :p]


def _bwd_dx_pallas(ci, cw, g, hw, interpret=False):
    b, p, _ = ci.shape
    ch = g.shape[-1]
    tpp = min(_TILE_P, _pad_to(p, 128))
    pp = _pad_to(p, tpp)
    nc = _chunk_count(hw)
    tq = hw // nc  # q-tile == source chunk so the fwd bitmap applies
    if pp != p:
        ci = jnp.pad(ci, ((0, 0), (0, pp - p), (0, 0)), constant_values=-1)
        cw = jnp.pad(cw, ((0, 0), (0, pp - p), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pp - p), (0, 0)))
    hit = _hit_bitmap(ci, pp, tpp, hw)
    ci_t = jnp.swapaxes(ci, 1, 2)  # (B, 4, P)
    cw_t = jnp.swapaxes(cw, 1, 2)
    dx = pl.pallas_call(
        _bwd_dx_kernel,
        grid=(b, nc, pp // tpp),
        in_specs=[
            pl.BlockSpec((1, pp // tpp, nc), lambda bi, qi, pi: (bi, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, tpp), lambda bi, qi, pi: (bi, 0, pi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tpp), lambda bi, qi, pi: (bi, 0, pi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpp, ch), lambda bi, qi, pi: (bi, pi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, ch), lambda bi, qi, pi: (bi, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, ch), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * pp * hw * ch, bytes_accessed=b * (hw * ch * 4 + pp * ch * 2),
            transcendentals=0,
        ),
    )(hit, ci_t, cw_t, g)
    return dx


def _bwd_dcw_pallas(ci, g, x, interpret=False):
    b, p, _ = ci.shape
    _, hw, ch = x.shape
    tp = min(_TILE_P, _pad_to(p, 128))
    pp = _pad_to(p, tp)
    if pp != p:
        ci = jnp.pad(ci, ((0, 0), (0, pp - p), (0, 0)), constant_values=-1)
        g = jnp.pad(g, ((0, 0), (0, pp - p), (0, 0)))
    nc = _chunk_count(hw)
    hit = _hit_bitmap(ci, pp, tp, hw)
    xt = jnp.swapaxes(x, 1, 2)  # (B, C, HW)
    dcw = pl.pallas_call(
        _bwd_dcw_kernel,
        grid=(b, pp // tp),
        in_specs=[
            pl.BlockSpec((1, pp // tp, nc), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tp, 4), lambda bi, pi: (bi, pi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, ch), lambda bi, pi: (bi, pi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch, hw), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tp, 4), lambda bi, pi: (bi, pi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, pp, 4), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * pp * hw * ch, bytes_accessed=b * (hw * ch + pp * ch) * 2,
            transcendentals=0,
        ),
    )(hit, ci, g, xt)
    return dcw[:, :p]


# ---------------------------------------------------------------------------
# XLA fallback (CPU / debugging / very large HW)
# ---------------------------------------------------------------------------

def _fwd_xla(ci, cw, x):
    b, p, _ = ci.shape
    ch = x.shape[-1]
    idx = jnp.clip(ci, 0, x.shape[1] - 1).reshape(b, p * 4, 1)
    g = jnp.take_along_axis(x, idx, axis=1).reshape(b, p, 4, ch)
    valid = (ci >= 0)[..., None]
    return jnp.sum(g * (cw[..., None] * valid).astype(g.dtype), axis=2)


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bilinear_gather(
    x: jnp.ndarray,
    ci: jnp.ndarray,
    cw: jnp.ndarray,
    implementation: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """out[b, p] = sum_{c<4} cw[b, p, c] * x[b, ci[b, p, c], :].

    x: (B, HW, C); ci: (B, P, 4) int32 row indices (negative = skip);
    cw: (B, P, 4) float weights. Returns (B, P, C) in x.dtype (f32 accum).
    """
    impl = _resolve_impl(x, implementation)
    if impl == "xla":
        return _fwd_xla(ci, cw, x)
    return _fwd_pallas(ci, cw, x, interpret=interpret)


def _resolve_impl(x, implementation):
    if implementation != "auto":
        return implementation
    # an explicit jax.default_device(cpu) context (eager CPU init while the
    # TPU is the primary backend, e.g. the bench children) must get the XLA
    # path — Pallas only lowers for TPU (same guard as hat_sample._resolve)
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) not in ("tpu", "axon"):
        return "xla"
    hw, ch = x.shape[1], x.shape[2]
    vmem_need = hw * ch * 2 + _TILE_P * hw * 2
    on_tpu = any(d.platform in ("tpu", "axon") for d in jax.devices())
    return "pallas" if (on_tpu and vmem_need <= _MAX_VMEM_X_BYTES) else "xla"


def _vjp_fwd(x, ci, cw, implementation, interpret):
    out = bilinear_gather(x, ci, cw, implementation, interpret)
    return out, (x, ci, cw)


def _vjp_bwd(implementation, interpret, res, g):
    x, ci, cw = res
    impl = _resolve_impl(x, implementation)
    g = g.astype(jnp.float32)
    if impl == "xla":
        b, p, _ = ci.shape
        ch = x.shape[-1]
        valid = (ci >= 0).astype(jnp.float32)
        idx = jnp.clip(ci, 0, x.shape[1] - 1)
        # dx: scatter-add of weighted g rows
        contrib = (cw * valid)[..., None] * g[:, :, None, :]  # (B, P, 4, C)
        dx = jnp.zeros_like(x, dtype=jnp.float32)
        dx = dx.at[
            jnp.arange(x.shape[0])[:, None], idx.reshape(x.shape[0], -1)
        ].add(contrib.reshape(x.shape[0], -1, ch))
        # dcw: dot of g with gathered rows
        gx = jnp.take_along_axis(x, idx.reshape(b, p * 4, 1), axis=1).reshape(b, p, 4, ch)
        dcw = jnp.sum(gx.astype(jnp.float32) * g[:, :, None, :], axis=-1) * valid
        return dx.astype(x.dtype), None, dcw
    valid = (ci >= 0).astype(cw.dtype)
    dx = _bwd_dx_pallas(ci, cw * valid, g, x.shape[1], interpret=interpret)
    dcw = _bwd_dcw_pallas(ci, g, x, interpret=interpret) * valid
    return dx.astype(x.dtype), None, dcw


bilinear_gather.defvjp(_vjp_fwd, _vjp_bwd)


def bilinear_sample_2d(
    x: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    implementation: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Sample (B, H, W, C) at float coords ys/xs (B, P) -> (B, P, C).

    Out-of-bounds contributions are zero. Gradients flow to x and to the
    coordinates (through the bilinear weights).
    """
    b, h, w, ch = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    dy = (ys - y0).astype(jnp.float32)
    dx = (xs - x0).astype(jnp.float32)

    cws = []
    cis = []
    for (cy, cx, wgt) in (
        (y0, x0, (1 - dy) * (1 - dx)),
        (y0, x0 + 1, (1 - dy) * dx),
        (y0 + 1, x0, dy * (1 - dx)),
        (y0 + 1, x0 + 1, dy * dx),
    ):
        inb = (cy >= 0) & (cy < h) & (cx >= 0) & (cx < w)
        idx = cy.astype(jnp.int32) * w + cx.astype(jnp.int32)
        cis.append(jnp.where(inb, idx, -1))
        cws.append(wgt)
    ci = jnp.stack(cis, axis=-1)
    cw = jnp.stack(cws, axis=-1)
    flat = x.reshape(b, h * w, ch)
    return bilinear_gather(flat, ci, cw, implementation, interpret)
