"""Micro-A/B: s2d canvas + full-res occupancy extraction variants.

The r4 PointPillars trace attributes ~1.7 ms/step to separating the 65-wide
scattered canvas into (256-ch s2d canvas, full-res occupancy):
  dynamic_slice [4,248,216,4,1] 655 us + relayout copy 390 us (occ) and
  slice_bitcast [4,248,216,256] 656 us (canvas).
Variants measured here (amortized over K chained iters, one jit):
  a) current: reshape (b,Y,X,4,65) -> sub[...,:-1] + sub[...,-1]-transpose
  b) canvas kept 260-wide (consumer conv carries zero taps), occ via
     one-hot dot over the 65-dim then transpose
  c) canvas 260-wide, occ from a SEPARATE width-1 ones scatter at full res
Run: python tools/microbench_occ.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, C1 = 4, 18000, 65
NY, NX = 496, 432
Y, X = NY // 2, NX // 2
K = 30


def make_inputs():
    rs = np.random.RandomState(0)
    rows = rs.randn(B, N, C1).astype(np.float32)
    gy = rs.randint(0, NY, (B, N))
    gx = rs.randint(0, NX, (B, N))
    # ~1/3 of rows are sentinels (dropped), like real pillar streams
    drop = rs.rand(B, N) < 0.33
    full_idx = np.where(drop, NY * NX, gy * NX + gx).astype(np.int32)
    s2d_idx = ((gy // 2) * X + gx // 2) * 4 + (gy % 2) * 2 + gx % 2
    s2d_idx = np.where(drop, NY * NX, s2d_idx).astype(np.int32)
    dev = jax.devices()[0]
    return (jax.device_put(jnp.asarray(rows, jnp.bfloat16), dev),
            jax.device_put(jnp.asarray(full_idx), dev),
            jax.device_put(jnp.asarray(s2d_idx), dev))


def scatter(rows, idx):
    def one(r, i):
        flat = jnp.zeros((NY * NX, r.shape[-1]), r.dtype)
        return flat.at[i].set(r, mode="drop", unique_indices=True)
    return jax.vmap(one)(rows, idx)


def variant_a(rows, full_idx, s2d_idx):
    flat = scatter(rows, s2d_idx)
    sub = flat.reshape(B, Y, X, 4, C1)
    canvas = sub[..., :-1].reshape(B, Y, X, 4 * (C1 - 1))
    occ = sub[..., -1].reshape(B, Y, X, 2, 2)
    occ = occ.transpose(0, 1, 3, 2, 4).reshape(B, NY, NX).astype(jnp.float32)
    return canvas, occ


def variant_b(rows, full_idx, s2d_idx):
    flat = scatter(rows, s2d_idx)
    canvas = flat.reshape(B, Y, X, 4 * C1)  # occupancy stays in-band
    e = jnp.zeros((C1,), flat.dtype).at[C1 - 1].set(1)
    occ = jnp.einsum("bric,c->bri", flat.reshape(B, Y * X, 4, C1), e)
    occ = occ.reshape(B, Y, X, 2, 2).transpose(0, 1, 3, 2, 4)
    return canvas, occ.reshape(B, NY, NX).astype(jnp.float32)


def variant_c(rows, full_idx, s2d_idx):
    flat = scatter(rows, s2d_idx)
    canvas = flat.reshape(B, Y, X, 4 * C1)

    def occ_one(i):
        return jnp.zeros((NY * NX,), jnp.float32).at[i].set(
            jnp.ones(i.shape, jnp.float32), mode="drop", unique_indices=True)
    occ = jax.vmap(occ_one)(full_idx).reshape(B, NY, NX)
    return canvas, occ


def run(name, fn, args):
    @jax.jit
    def chained(rows, full_idx, s2d_idx):
        def body(i, acc):
            c, o = fn(rows + i * jnp.bfloat16(0), full_idx, s2d_idx)
            return acc + jnp.sum(c.astype(jnp.float32)) + jnp.sum(o)
        return jax.lax.fori_loop(0, K, body, 0.0)

    r = chained(*args)
    float(r)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append((time.perf_counter() - t0) * 1e3 / K)
    print(f"{name}: {np.median(times):.3f} ms/iter")


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    args = make_inputs()
    for name, fn in (("a_slice", variant_a), ("b_onehot_dot", variant_b),
                     ("c_sep_scatter", variant_c)):
        run(name, fn, args)
