"""Micro-A/B: s2d-layout canvas scatter strategies at PointPillars scale.

The r4 PP trace (docs/STATUS.md) shows the space-to-depth stream path's
UNSORTED sentinel scatter at 93 GiB/s (1.11 ms/step fwd) plus a ~1.25 ms
backward gather — the s2d cell remap is non-monotone, so the sorted-indices
hint the raster path rides is lost. Candidates:

  A unsorted_sentinel  current: 18k rows/sample, sentinel-except-last,
                       .set into the s2d canvas with no sorted hint
  B compact_srcsorted  gather the 16k pillar rows at ascending slotsrc
                       (sorted gather), scatter at s2d cellid (unsorted)
  C compact_cellsorted re-sort (cellid, slotsrc) pairs by s2d cellid:
                       unsorted 16k gather, SORTED 16k scatter
  D raster_sorted      reference point: the non-s2d sorted whole-stream
                       scatter (what the raster path pays)

Each timed fwd + bwd (sum-of-squares consumer) chained K iters in one jit.
Run: python tools/microbench_s2d_scatter.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, C = 4, 18000, 65
NY, NX = 496, 432
CELLS = NY * NX
V = 16000
K = 20


def s2d_remap(idx):
    y, x = idx // NX, idx % NX
    s = ((y // 2) * (NX // 2) + x // 2) * 4 + (y % 2) * 2 + x % 2
    return jnp.where(idx < CELLS, s, CELLS)


def make_inputs():
    rs = np.random.RandomState(0)
    rows = rs.randn(B, N, C).astype(np.float32)
    # per-sample: ~16k unique ascending raster cells at ascending row
    # positions (the voxelize_stream sorted contract: idx per-row
    # nondecreasing, each group's last row carries the pillar)
    idx_rows = np.full((B, N), CELLS, np.int32)     # sentinel-except-last
    idx_all = np.zeros((B, N), np.int32)            # per-row nondecreasing
    slotsrc = np.full((B, V), N, np.int32)
    cellid = np.full((B, V), CELLS, np.int32)
    for b in range(B):
        cells = np.sort(rs.choice(CELLS, V, replace=False))
        pos = np.sort(rs.choice(N, V, replace=False))
        idx_rows[b, pos] = cells
        # fill per-row ids by forward-fill of group ids
        grp = np.zeros(N, np.int32)
        grp[pos] = 1
        g = np.cumsum(grp) - 1
        idx_all[b] = cells[np.clip(g, 0, V - 1)]
        slotsrc[b] = pos
        cellid[b] = cells
    dev = jax.devices()[0]
    put = lambda a, dt: jax.device_put(jnp.asarray(a, dt), dev)
    return (put(rows, jnp.bfloat16), put(idx_rows, jnp.int32),
            put(idx_all, jnp.int32), put(slotsrc, jnp.int32),
            put(cellid, jnp.int32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _compact(rows, slotsrc, cellid, src_sorted, cell_sorted):
    def one(r, src, cid):
        sel = r.at[src].get(mode="fill", fill_value=0,
                            indices_are_sorted=src_sorted)
        flat = jnp.zeros((CELLS, r.shape[-1]), r.dtype)
        return flat.at[cid].set(sel, mode="drop", unique_indices=True,
                                indices_are_sorted=cell_sorted)
    return jax.vmap(one)(rows, slotsrc, cellid)


def _compact_fwd(rows, slotsrc, cellid, src_sorted, cell_sorted):
    return _compact(rows, slotsrc, cellid, src_sorted, cell_sorted), (
        slotsrc, cellid)


def _compact_bwd(src_sorted, cell_sorted, res, g):
    slotsrc, cellid = res

    def one(gi, src, cid):
        gsel = gi.at[cid].get(mode="fill", fill_value=0,
                              indices_are_sorted=cell_sorted)
        grows = jnp.zeros((N, gi.shape[-1]), gi.dtype)
        return grows.at[src].add(gsel, mode="drop", unique_indices=True,
                                 indices_are_sorted=src_sorted)
    return jax.vmap(one)(g, slotsrc, cellid), None, None


_compact.defvjp(_compact_fwd, _compact_bwd)


def make_fn(variant, args):
    rows, idx_rows, idx_all, slotsrc, cellid = args

    if variant == "unsorted_sentinel":
        s2d_rows = s2d_remap(idx_rows)

        def scatter(r):
            def one(ri, ii):
                flat = jnp.zeros((CELLS, C), ri.dtype)
                return flat.at[ii].set(ri, mode="drop", unique_indices=True)
            return jax.vmap(one)(r, s2d_rows)
    elif variant == "compact_srcsorted":
        s2d_cells = s2d_remap(cellid)

        def scatter(r):
            return _compact(r, slotsrc, s2d_cells, True, False)
    elif variant == "compact_cellsorted":
        s2d_cells = s2d_remap(cellid)
        cs, ss = jax.vmap(
            lambda c, s: jax.lax.sort((c, s), num_keys=1, is_stable=True)
        )(s2d_cells, slotsrc)

        def scatter(r):
            return _compact(r, ss, cs, False, True)
    elif variant == "raster_sorted":
        from minddet_tpu.ops.voxelize import scatter_stream_canvas_sorted

        def scatter(r):
            return scatter_stream_canvas_sorted(r, idx_all, CELLS)
    else:
        raise SystemExit(variant)

    def loss(r):
        return jnp.sum(scatter(r).astype(jnp.float32) ** 2)

    @jax.jit
    def chained(r):
        def body(i, acc):
            v, g = jax.value_and_grad(loss)(r + i * jnp.bfloat16(0))
            return acc + v + jnp.sum(g.astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, 0.0)

    return chained


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    args = make_inputs()
    rows = args[0]
    for name in ("unsorted_sentinel", "compact_srcsorted",
                 "compact_cellsorted", "raster_sorted"):
        fn = make_fn(name, args)
        float(fn(rows))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(rows))
            times.append((time.perf_counter() - t0) * 1e3 / K)
        print(f"{name:>20}: {np.median(times):.3f} ms/iter (fwd+bwd+consume)")
