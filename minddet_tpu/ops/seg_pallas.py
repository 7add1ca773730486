"""Pallas TPU kernel for the bounded segmented full-max of the stream PFN.

The stream pillar path (``ops/voxelize.py`` + ``readers/pillar_encoder.py``)
computes, over a sorted point stream ``x`` (B, N, C) with segment-head flags
``first`` and last-kept flags ``last``, the FULL segment maximum at every row
(each segment is one pillar's points; the voxelizer caps segments at
``bound`` kept rows). The XLA formulation is ceil(log2(bound)) Hillis-Steele
shift+select levels for the running max plus the same again for the
broadcast-back — each level a separate ~15 MB HBM kernel, and autodiff saves
channel-wide masks per level. The r5 hlo_stats trace at nuScenes bs=8 billed
that cluster (maximum_select/maximum_compare/broadcast_select fusions) at
~8 ms/step.

Here the whole thing is ONE Pallas pass: blocks of the point axis load into
VMEM with a ``bound``-row halo on both sides (three views of the same input
at block offsets i-1, i, i+1), all levels run on registers/VMEM, and only
x-in / out-out touch HBM. Backward is a second single-pass kernel using the
reduce-max gradient convention (ties split evenly — ``lax.reduce_max``'s
JVP rule), with the per-segment gradient sum and tie count computed by the
same in-VMEM bounded scans.

Replaces the device-side sampling half of the reference's per-pillar max
(``pointpillars/src/pointpillars.py:180-224`` does it as a padded (V, P, C)
reduce; the stream form never materializes the padded tensor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # f32 -inf stand-in that casts to bf16 -inf-ish safely


def _levels(bound: int):
    d, out = 1, []
    while d < bound:
        out.append(d)
        d *= 2
    return out


def _ext(prev, cur, nxt, pad):
    """(TN, C) x3 -> (TN + 2*pad, C) halo window.

    Concat at TN-aligned offsets, then ONE hardware sublane rotate
    (`pltpu.roll`) and an offset-0 slice. The first draft sliced
    ``prev[-pad:]`` directly — an unaligned sublane access that Mosaic
    scalarizes (measured 1118 ms vs the XLA form's 12 ms for the whole
    fwd); every slice here starts at row 0 and every concat seam is a
    multiple of TN, so the only data movement is the rotate."""
    tn = cur.shape[0]
    big = jnp.concatenate([prev, cur, nxt], axis=0)
    # row i <- big[i + tn - pad]  (roll wants a non-negative shift)
    big = pltpu.roll(big, 2 * tn + pad, axis=0)
    return big[: tn + 2 * pad]


def _shift_down(v, d, fill, row):
    """Rows move down by d (row i sees row i-d); top filled.

    Hardware rotate + iota mask — never an unaligned sublane slice."""
    r = pltpu.roll(v, d, axis=0)
    return jnp.where(row < d, jnp.asarray(fill, v.dtype), r)


def _shift_up(v, d, fill, row):
    w = v.shape[0]
    r = pltpu.roll(v, w - d, axis=0)  # non-negative form of roll by -d
    return jnp.where(row >= w - d, jnp.asarray(fill, v.dtype), r)


def _full_max_window(xw, fw, lw, bound):
    """Bounded segmented FULL max on an in-VMEM window.

    xw (W, C) values in the INPUT dtype (max/select do no arithmetic, so
    bf16 stays exact and halves the unrolled levels' VMEM stack — every
    (W, k) temporary lane-pads to (W, 128) regardless of k, and the f32
    form blew Mosaic's 16 MB scoped-vmem limit). fw/lw (W, 1) 0/1 flags in
    int32: Mosaic rejects i1 vector concats AND bf16 `cmpf` ("Target does
    not support this comparison" on v5e), so every comparison in the kernel
    is integer — values only ever flow through max/select. Running max
    within segment (exact within ``bound`` of the head), then the last-row
    value broadcast backward. ``lrow`` is the window-local (W, 1) int32 row
    iota shared by all shift masks."""
    neg = jnp.asarray(_NEG, xw.dtype)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (xw.shape[0], 1), 0)
    v, f = xw, fw
    for d in _levels(bound):
        vs = _shift_down(v, d, neg, lrow)
        fs = _shift_down(f, d, jnp.int32(1), lrow)
        v = jnp.where(f > 0, v, jnp.maximum(vs, v))
        f = jnp.maximum(f, fs)
    u = jnp.where(lw > 0, v, neg)
    g = lw
    for d in _levels(bound):
        us = _shift_up(u, d, neg, lrow)
        gs = _shift_up(g, d, jnp.int32(0), lrow)
        u = jnp.where(g > 0, u, us)
        g = jnp.maximum(g, gs)
    return u


def _fwd_kernel(bound, pad, n, tn, x_m, x_c, x_p, f_m, f_c, f_p, l_m, l_c,
                l_p, out_ref):
    i = pl.program_id(1)
    row = jax.lax.broadcasted_iota(
        jnp.int32, (tn + 2 * pad, 1), 0) + i * tn - pad
    # at block 0 / last block the neighbor views clamp to the block itself
    # and their halo rows carry wrong data, but those rows' global ids are
    # out of [0, n) — the validity mask turns them into barriers.
    # Window math runs in f32: Mosaic's sublane rotate is 32-bit-only
    # ("Rotate with non-32-bit data"), HBM loads stay in the input dtype.
    dt = jnp.float32
    bad = ((row < 0) | (row >= n)).astype(jnp.int32)
    xw = jnp.where(bad > 0, jnp.asarray(_NEG, dt),
                   _ext(x_m[0].astype(dt), x_c[0].astype(dt),
                        x_p[0].astype(dt), pad))
    fw = jnp.maximum(_ext(f_m[0], f_c[0], f_p[0], pad), bad)
    lw = _ext(l_m[0], l_c[0], l_p[0], pad) * (1 - bad)
    u = _full_max_window(xw, fw, lw, bound)
    out_ref[0] = u[pad:pad + tn].astype(out_ref.dtype)


def _bwd_kernel(bound, pad, n, tn, x_m, x_c, x_p, f_m, f_c, f_p, l_m, l_c,
                l_p, m_m, m_c, m_p, g_m, g_c, g_p, dx_ref):
    """reduce-max convention: dx = (x == segmax) * seg_sum(g) / tie_count.

    seg sums run FORWARD (within bound of head) then broadcast back from the
    last row — the same window machinery with add instead of max."""
    i = pl.program_id(1)
    row = jax.lax.broadcasted_iota(
        jnp.int32, (tn + 2 * pad, 1), 0) + i * tn - pad
    dt = jnp.float32  # 32-bit window math (rotate constraint), exact for bf16
    bad = ((row < 0) | (row >= n)).astype(jnp.int32)

    xw = jnp.where(bad > 0, jnp.asarray(_NEG, dt),
                   _ext(x_m[0].astype(dt), x_c[0].astype(dt),
                        x_p[0].astype(dt), pad))
    fw = jnp.maximum(_ext(f_m[0], f_c[0], f_p[0], pad), bad)
    lw = _ext(l_m[0], l_c[0], l_p[0], pad) * (1 - bad)
    mw = _ext(m_m[0].astype(dt), m_c[0].astype(dt), m_p[0].astype(dt), pad)
    # bf16 -> f32 is exact, so the tie equality is exact; ties/counts are
    # small integers in f32, the gradient SUM also accumulates in f32
    tie = jnp.where((xw == mw) & (bad == 0), jnp.float32(1), jnp.float32(0))
    gw = jnp.where(bad > 0, jnp.float32(0),
                   _ext(g_m[0].astype(dt), g_c[0].astype(dt),
                        g_p[0].astype(dt), pad))

    lrow = jax.lax.broadcasted_iota(jnp.int32, (xw.shape[0], 1), 0)

    def seg_sum_full(z):
        zero = jnp.asarray(0, z.dtype)
        v, f = z, fw
        for d in _levels(bound):
            vs = _shift_down(v, d, zero, lrow)
            fs = _shift_down(f, d, jnp.int32(1), lrow)
            v = jnp.where(f > 0, v, vs + v)
            f = jnp.maximum(f, fs)
        u, g = jnp.where(lw > 0, v, zero), lw
        for d in _levels(bound):
            us = _shift_up(u, d, zero, lrow)
            gs = _shift_up(g, d, jnp.int32(0), lrow)
            u = jnp.where(g > 0, u, us)
            g = jnp.maximum(g, gs)
        return u

    gsum = seg_sum_full(gw)
    cnt = seg_sum_full(tie)
    dx = tie * gsum / jnp.maximum(cnt, 1.0)
    dx_ref[0] = dx[pad:pad + tn].astype(dx_ref.dtype)


def _views(nblocks):
    """Three index maps over the same (B, N, C) array at block offsets
    i-1 / i / i+1 (clamped; the kernel masks the clamped halos by global
    row id)."""
    def clamp_prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def cur(b, i):
        return (b, i, 0)

    def clamp_next(b, i):
        return (b, jnp.minimum(i + 1, nblocks - 1), 0)

    return clamp_prev, cur, clamp_next


def _pad_to_blocks(a, tn, fill):
    b, n = a.shape[0], a.shape[1]
    npad = (tn - n % tn) % tn
    if npad:
        cfg = [(0, 0), (0, npad)] + [(0, 0)] * (a.ndim - 2)
        a = jnp.pad(a, cfg, constant_values=fill)
    return a


def _run_fwd(first, last, x, bound, tn, interpret):
    b, n, c = x.shape
    pad = max(8, ((bound + 7) // 8) * 8)
    xp = _pad_to_blocks(x, tn, 0)
    # int32 flags: the in-kernel sublane rotate is 32-bit-only, and the
    # flag planes are (B, N, 1) — the wider dtype is noise next to x
    fp = _pad_to_blocks(first.astype(jnp.int32)[..., None], tn, 1)
    lp = _pad_to_blocks(last.astype(jnp.int32)[..., None], tn, 0)
    np_ = xp.shape[1]
    prev, cur, nxt = _views(np_ // tn)
    spec_x = [pl.BlockSpec((1, tn, c), ix, memory_space=pltpu.VMEM)
              for ix in (prev, cur, nxt)]
    spec_f = [pl.BlockSpec((1, tn, 1), ix, memory_space=pltpu.VMEM)
              for ix in (prev, cur, nxt)]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bound, pad, n, tn),
        grid=(b, np_ // tn),
        in_specs=spec_x + spec_f + spec_f,
        out_specs=pl.BlockSpec((1, tn, c), cur, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * np_ * c, transcendentals=0,
            bytes_accessed=2 * b * np_ * c * 2,
        ),
    )(xp, xp, xp, fp, fp, fp, lp, lp, lp)
    return out[:, :n]


def _run_bwd(first, last, x, m, g, bound, tn, interpret):
    b, n, c = x.shape
    pad = max(8, ((bound + 7) // 8) * 8)
    xp = _pad_to_blocks(x, tn, 0)
    mp = _pad_to_blocks(m, tn, 0)
    gp = _pad_to_blocks(g, tn, 0)
    fp = _pad_to_blocks(first.astype(jnp.int32)[..., None], tn, 1)
    lp = _pad_to_blocks(last.astype(jnp.int32)[..., None], tn, 0)
    np_ = xp.shape[1]
    prev, cur, nxt = _views(np_ // tn)
    spec_x = [pl.BlockSpec((1, tn, c), ix, memory_space=pltpu.VMEM)
              for ix in (prev, cur, nxt)]
    spec_f = [pl.BlockSpec((1, tn, 1), ix, memory_space=pltpu.VMEM)
              for ix in (prev, cur, nxt)]
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, bound, pad, n, tn),
        grid=(b, np_ // tn),
        in_specs=spec_x + spec_f + spec_f + spec_x + spec_x,
        out_specs=pl.BlockSpec((1, tn, c), cur, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * b * np_ * c, transcendentals=0,
            bytes_accessed=5 * b * np_ * c * 2,
        ),
    )(xp, xp, xp, fp, fp, fp, lp, lp, lp, mp, mp, mp, gp, gp, gp)
    return dx[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _seg_full_max_op(first, last, x, bound, tn, interpret):
    return _run_fwd(first, last, x, bound, tn, interpret)


def _op_fwd(first, last, x, bound, tn, interpret):
    m = _seg_full_max_op(first, last, x, bound, tn, interpret)
    return m, (first, last, x, m)


def _op_bwd(bound, tn, interpret, res, g):
    first, last, x, m = res
    dx = _run_bwd(first, last, x, m, g, bound, tn, interpret)
    return (None, None, dx)


_seg_full_max_op.defvjp(_op_fwd, _op_bwd)


def seg_full_max_bounded(first, last, x, bound: int,
                         block_rows: int | None = None,
                         implementation: str = "auto",
                         interpret: bool = False):
    """FULL segment max at every row of a sorted stream, one Pallas pass.

    first/last: (B, N) bool segment-head / last-kept flags; x: (B, N, C);
    segments are capped at ``bound`` kept rows (the voxelizer guarantee) —
    rows further than ``bound`` from their head get partial values exactly
    like the XLA Hillis-Steele form, and only kept rows are consumed.

    Gradient uses ``lax.reduce_max``'s convention (ties split evenly).

    ``implementation``: "auto" (default) uses the XLA shift-level form —
    the Pallas kernel is a MEASURED NEGATIVE on v5e and is opt-in
    ("pallas") for future re-tuning. A/B at (8, 120000, 64) bf16,
    bound=20, 2026-08-20: XLA fwd 12-14 ms; Pallas fwd 1118 ms as
    concat-shift windows (Mosaic scalarizes unaligned sublane slices),
    113 ms after rewriting every shift as a 32-bit `pltpu.roll` + iota
    mask — still ~8x off, the residual being rotate throughput and the
    128-lane padding of C=64 blocks. The in-graph XLA form also fuses
    into the surrounding PFN, so the standalone 12 ms overstates its real
    step cost (~8 ms of a 92 ms CenterPoint bs=8 step).
    """
    from minddet_tpu.ops.voxelize import _seg_bcast_bounded, seg_running_max

    if block_rows is None:
        # Mosaic's scoped-VMEM stack scales with block ROWS alone (every
        # (W, k) temporary lane-pads to (W, 128)); 1024 rows of f32 chains
        # measured inside the 16 MB limit at bound=20
        block_rows = 1024
    # the halo pad must fit inside one block (the window is built from the
    # block plus its two neighbors) — fail loudly, not with a Mosaic shape
    # error deep in the kernel
    pad = max(8, ((bound + 7) // 8) * 8)
    if block_rows < pad:
        raise ValueError(
            f"block_rows={block_rows} must be >= the halo pad "
            f"{pad} (= round_up(max(bound, 8), 8)) for bound={bound}")
    use_pallas = interpret or (
        implementation == "pallas"
        and jax.devices()[0].platform != "cpu")
    if not use_pallas or x.shape[1] < 2 * block_rows:
        m = seg_running_max(first, x, axis=1, bound=bound)
        return _seg_bcast_bounded(last, m, bound, axis=1)
    tn = block_rows
    return _seg_full_max_op(first, last, x, bound, tn, interpret)
