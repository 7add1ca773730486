"""Capture an xprof trace of one train step and print HLO-level attribution.

The round-3/4 perf loop's workhorse (docs/STATUS.md): run N steps of the
exact bench-child program under ``jax.profiler.trace``, then parse the
xplane with xprof's ``hlo_stats`` converter (per-HLO times WITH shapes and
a 'Bound by' column — better than framework_op_stats for optimization).

    python tools/trace_step.py --model pointpillars --steps 6 \
        --out /tmp/pp_trace
    python tools/trace_step.py --model centerpoint --top 40

Prints the top rows by self time plus a category rollup. Uses a FRESH trace
dir per capture (two sessions in one dir break the converter).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(model_name: str, batch_size: int | None = None):
    import jax
    import jax.numpy as jnp

    from minddet_tpu.core.optim import adamw
    from minddet_tpu.train.loop import TrainState, make_train_step
    from minddet_tpu.train.train import synthetic_points_batches

    if model_name == "centernet":
        # the bench program itself (bs via CN_BS or an explicit --batch):
        # donate off, params generated on device, compile-cache shared with
        # bench/entry. --batch only overrides CN_BS when the caller passed
        # it (argparse default None), so `CN_BS=128 trace_step --model
        # centernet` traces the bench's own program.
        import bench

        if batch_size is not None:
            os.environ["CN_BS"] = str(batch_size)
        step_fn, state, batch, _ = bench.headline_setup()
        return step_fn, state, batch
    if batch_size is None:
        batch_size = 4
    if model_name == "centernet_legacy":
        import numpy as np

        from minddet_tpu.models.detectors.centernet import CenterNet
        from minddet_tpu.ops.targets import centernet_targets_batch

        BATCH, RES, NC = batch_size, 512, 80
        model = CenterNet(num_classes=NC, depth=18, dcn=True,
                          dtype=jnp.bfloat16)
        rs = np.random.RandomState(0)
        ho = wo = RES // 4
        image = rs.randn(BATCH, RES, RES, 3).astype(np.float32)
        boxes = np.zeros((BATCH, 128, 4), np.float32)
        classes = rs.randint(0, NC, (BATCH, 128)).astype(np.int32)
        gmask = np.zeros((BATCH, 128), bool)
        boxes[:, :8] = rs.uniform(4, 90, (BATCH, 8, 4))
        boxes[:, :8, 2:] += boxes[:, :8, :2]
        gmask[:, :8] = True
        with jax.default_device(jax.devices("cpu")[0]):
            targets = centernet_targets_batch(
                jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(gmask),
                ho, wo, NC, 0.7)
            batch = {"image": jnp.asarray(image), "targets": targets}
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.asarray(image[:1]), train=False)
            state = TrainState.create(variables["params"],
                                      variables.get("batch_stats", {}),
                                      adamw(5e-4, clip_global_norm=35.0))
        dev = jax.devices()[0]
        state = jax.device_put(state, dev)
        batch = jax.device_put(batch, dev)

        def loss_apply(vs, b, train=True):
            return model.apply(vs, b["image"], b["targets"], train=train,
                               method=model.loss, mutable=["batch_stats"])

        return make_train_step(loss_apply, donate=True), state, batch
    # 3D models mirror the bench programs EXACTLY (same flags/defaults) so
    # the persistent compile cache the benches warm is hit here, and reuse
    # bench's on-device param generation (the old CPU-init + full-state
    # device_put path cost minutes of tunnel upload per capture).
    import bench

    if model_name == "pointpillars":
        from minddet_tpu.models.detectors.pointpillars import PointPillars

        pcr = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
        model = PointPillars(
            num_classes=1, dtype=jnp.bfloat16,
            rpn_space_to_depth=os.environ.get("PP_S2D", "1") != "0",
            rpn_scan_inner=not os.environ.get("PP_UNROLL"),
            rpn_scan_min_layers=int(os.environ.get("PP_SCAN_MIN", "6")),
            rpn_stacked_params=os.environ.get("PP_STACKED", "0") == "1")
        raw = next(synthetic_points_batches(batch_size, pcr,
                                            num_points=18000, max_gt=24))
        raw.pop("step", None)
        method = model.loss_from_gt
        extra = model.anchor_set
        spec_name = ("pointpillars" if os.environ.get("PP_S2D", "1") == "0"
                     else "pointpillars_s2d") + (
            f"_stk{model.rpn_scan_min_layers}"
            if model.rpn_stacked_params else "")  # mirror bench's spec key
        tx = adamw(2e-4)
    elif model_name == "centerpoint":
        from minddet_tpu.models.detectors.centerpoint import CenterPoint

        pcr = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
        model = CenterPoint(dtype=jnp.bfloat16,
                            rpn_space_to_depth=bool(os.environ.get("CP_S2D")),
                            rpn_scan_inner=not os.environ.get("CP_UNROLL"),
                            rpn_scan_min_layers=int(
                                os.environ.get("CP_SCAN_MIN", "6")),
                            rpn_stacked_params=os.environ.get(
                                "CP_STACKED", "0") == "1")
        raw = next(synthetic_points_batches(batch_size, pcr,
                                            num_points=120000,
                                            max_gt=64, num_classes=10,
                                            num_features=5, box_dim=9))
        raw.pop("step", None)
        method = model.loss_from_gt
        extra = None
        spec_name = ("centerpoint_s2d" if os.environ.get("CP_S2D")
                     else "centerpoint") + (
            f"_stk{model.rpn_scan_min_layers}"
            if model.rpn_stacked_params else "")  # mirror bench's spec key
        tx = adamw(1e-3, clip_global_norm=35.0)
    else:
        raise SystemExit(f"unknown model {model_name}")

    with jax.default_device(jax.devices("cpu")[0]):
        batch = {k: jnp.asarray(v) for k, v in raw.items()}
        if extra is not None:
            batch.update(extra())
    # bench batch sizes differ from trace batch sizes only through the
    # (batch-size-independent) parameter tree, so the spec cache is shared
    variables = bench._device_init(
        spec_name,
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch,
                           method=method))
    dev = jax.devices()[0]
    state = jax.jit(lambda p, b: TrainState.create(p, b, tx))(
        variables["params"], variables.get("batch_stats", {}))
    batch = jax.device_put(batch, dev)

    def loss_apply(vs, b, train=True):
        return model.apply(vs, b, train=train, method=method,
                           mutable=["batch_stats"])

    return make_train_step(loss_apply, donate=True), state, batch


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def hlo_stats(trace_dir: str, top: int = 30):
    """Parse the newest xplane in trace_dir -> rows sorted by self time."""
    from xprof.convert import raw_to_tool_data as rtd

    xplanes = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not xplanes:
        raise SystemExit(f"no xplane under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data([xplanes[-1]], "hlo_stats",
                                      {"tqx": "out:csv"})
    obj = json.loads(data)
    if isinstance(obj, list):
        obj = obj[0]
    cols = [c["label"] if isinstance(c, dict) else c for c in obj["cols"]]
    rows = [[c["v"] if isinstance(c, dict) else c for c in r["c"]]
            if isinstance(r, dict) else r for r in obj["rows"]]
    return cols, rows


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pointpillars")
    p.add_argument("--batch", type=int, default=None,
                   help="batch size; centernet defaults to the bench's "
                        "CN_BS (128), other models to 4")
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--out", default=None)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--parse-only", default=None,
                   help="skip running; parse this existing trace dir")
    args = p.parse_args(argv)

    trace_dir = args.parse_only
    if trace_dir is None:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        step_fn, state, batch = _build(args.model, args.batch)
        state, metrics = step_fn(state, batch)
        _sync(metrics["loss"])
        print("warmed; tracing...", flush=True)
        trace_dir = args.out or f"/tmp/trace_{args.model}_{os.getpid()}"
        with jax.profiler.trace(trace_dir):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, metrics = step_fn(state, batch)
            _sync(metrics["loss"])
            dt = time.perf_counter() - t0
        print(f"{args.steps} steps in {dt:.3f}s -> "
              f"{dt / args.steps * 1e3:.2f} ms/step", flush=True)

    cols, rows = hlo_stats(trace_dir, args.top)

    def col(name_frag):
        for i, c in enumerate(cols):
            if name_frag.lower() in str(c).lower():
                return i
        return None

    def first(*frags):
        for f in frags:
            i = col(f)
            if i is not None:
                return i
        return None

    i_self = first("total self time (us)", "self time")
    i_name = first("hlo op name", "name")
    i_cat = first("category", "hlo op category")
    i_text = col("hlo op text")
    i_bound = col("bound")
    rows = [r for r in rows if r[i_self] not in (None, "")]
    rows.sort(key=lambda r: -float(r[i_self]))
    total = sum(float(r[i_self]) for r in rows)
    print(f"\ntotal device self time: {total / 1e3:.2f} ms "
          f"(over {args.steps} steps)")
    agg = {}
    for r in rows:
        c = str(r[i_cat]) if i_cat is not None else "?"
        agg[c] = agg.get(c, 0.0) + float(r[i_self])
    print("\nby category:")
    for c, v in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {c:<28}{v / 1e3:9.2f} ms  {100 * v / total:5.1f}%")
    print(f"\ntop {args.top} ops:")
    for r in rows[: args.top]:
        text = str(r[i_text])[:90] if i_text is not None else ""
        bound = str(r[i_bound]) if i_bound is not None else ""
        print(f"  {float(r[i_self]) / 1e3:8.3f} ms  {str(r[i_name])[:40]:<42}"
              f"{bound:<12}{text}")


if __name__ == "__main__":
    main()
