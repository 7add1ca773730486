"""A/B the flat vs tap-grouped hat samplers at CenterNet DCN shapes.

Times fwd and fwd+bwd of `hat_sample_2d` (flat (B, P*K) coords -> (B, P*K, C))
against `hat_sample_2d_taps` ((B, K, P) coords -> (B, P, K*C)) on the real
chip, including the downstream weight contraction so the relayout cost the
taps kernel removes is part of the measurement.

    python tools/microbench_hat_taps.py --h 64 --c 128 --cout 128 --batch 16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--cout", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--k", type=int, default=9)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from minddet_tpu.ops.hat_sample import hat_sample_2d, hat_sample_2d_taps

    b, h, w, c, k, cout = args.batch, args.h, args.h, args.c, args.k, args.cout
    p = h * w
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
    base_y = np.repeat(np.arange(h), w).astype(np.float32)  # (P,)
    base_x = np.tile(np.arange(w), h).astype(np.float32)
    tap_dy = (np.arange(k) // 3 - 1.0).astype(np.float32)
    tap_dx = (np.arange(k) % 3 - 1.0).astype(np.float32)
    noise = rs.randn(b, k, p).astype(np.float32) * 0.3
    ys_t = jnp.asarray(base_y[None, None] + tap_dy[None, :, None] + noise)
    xs_t = jnp.asarray(base_x[None, None] + tap_dx[None, :, None] + noise)
    sc_t = jnp.asarray(rs.rand(b, k, p).astype(np.float32))
    # flat layout: position-major sample order (p * K + k)
    ys_f = jnp.swapaxes(ys_t, 1, 2).reshape(b, p * k)
    xs_f = jnp.swapaxes(xs_t, 1, 2).reshape(b, p * k)
    sc_f = jnp.swapaxes(sc_t, 1, 2).reshape(b, p * k)
    wmat = jnp.asarray(rs.randn(k * c, cout).astype(np.float32) * 0.05
                       ).astype(jnp.bfloat16)
    g = jnp.asarray(rs.randn(b, p, cout).astype(np.float32)).astype(jnp.bfloat16)

    def flat_out(x, ys, xs, sc, wm):
        samp = hat_sample_2d(x, ys, xs, sc, implementation="pallas")
        return jnp.dot(samp.reshape(b, p, k * c).astype(jnp.bfloat16), wm,
                       preferred_element_type=jnp.float32)

    def taps_out(x, ys, xs, sc, wm):
        samp = hat_sample_2d_taps(x, ys, xs, sc, implementation="pallas")
        return jnp.dot(samp.astype(jnp.bfloat16), wm,
                       preferred_element_type=jnp.float32)

    def bench(name, fn, *inputs):
        # sync by pulling a scalar: block_until_ready returns early under the
        # axon tunnel (verify skill gotcha)
        f = jax.jit(
            lambda *a: jax.tree_util.tree_reduce(
                lambda s, t: s + jnp.sum(t.astype(jnp.float32)), fn(*a), 0.0))
        float(f(*inputs))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            s = f(*inputs)
        float(s)
        dt = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"{name:28s} {dt:8.3f} ms")
        return dt

    def grad_fn(out_fn):
        def loss(x, ys, xs, sc, wm):
            return jnp.sum(out_fn(x, ys, xs, sc, wm).astype(jnp.float32) *
                           g.astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    print(f"shapes: x ({b},{h},{w},{c}) k={k} cout={cout}")
    bench("flat fwd+matmul", flat_out, x, ys_f, xs_f, sc_f, wmat)
    bench("taps fwd+matmul", taps_out, x, ys_t, xs_t, sc_t, wmat)
    bench("flat grad", grad_fn(flat_out), x, ys_f, xs_f, sc_f, wmat)
    bench("taps grad", grad_fn(taps_out), x, ys_t, xs_t, sc_t, wmat)


if __name__ == "__main__":
    main()
