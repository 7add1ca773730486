"""Micro-A/B: canvas scatter fwd+bwd with/without indices_are_sorted.

CenterPoint r4 trace: canvas scatter 5.8 ms/step fwd (bf16[65,1048576])
+ 6.6 ms/step bwd gather (bf16[480000,64]). JAX propagates
indices_are_sorted/unique_indices from the scatter into its transpose
gather, and the stream voxelizer's sort-1 order makes canvas_idx ascending
— this measures what the hint buys at that scale.
Run: python tools/microbench_scatter.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, C1 = 4, 120000, 65
CELLS = 512 * 512
K = 20


def make_inputs():
    rs = np.random.RandomState(0)
    rows = rs.randn(B, N, C1).astype(np.float32)
    # ~20k unique ascending cells per sample, sentinel elsewhere (like the
    # real stream: only each pillar's last kept row scatters)
    idx = np.full((B, N), CELLS, np.int32)
    for b in range(B):
        cells = np.sort(rs.choice(CELLS, 20000, replace=False))
        at = np.sort(rs.choice(N, 20000, replace=False))
        idx[b, at] = cells
    dev = jax.devices()[0]
    return (jax.device_put(jnp.asarray(rows, jnp.bfloat16), dev),
            jax.device_put(jnp.asarray(idx), dev))


def make_fn(sorted_hint):
    def scatter(rows, idx):
        def one(r, i):
            flat = jnp.zeros((CELLS, C1), r.dtype)
            return flat.at[i].set(r, mode="drop", unique_indices=True,
                                  indices_are_sorted=sorted_hint)
        return jax.vmap(one)(rows, idx)

    def loss(rows, idx):
        return jnp.sum(scatter(rows, idx).astype(jnp.float32) ** 2)

    @jax.jit
    def chained(rows, idx):
        def body(i, acc):
            v, g = jax.value_and_grad(loss)(rows + i * jnp.bfloat16(0), idx)
            return acc + v + jnp.sum(g.astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, 0.0)

    return chained


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    args = make_inputs()
    for name, hint in (("unsorted", False), ("sorted_hint", True)):
        fn = make_fn(hint)
        float(fn(*args))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            times.append((time.perf_counter() - t0) * 1e3 / K)
        print(f"{name}: {np.median(times):.3f} ms/iter (fwd scatter + bwd "
              f"gather + consume)")
