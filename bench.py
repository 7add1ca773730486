"""North-star benchmark set. Prints ONE JSON line per metric; the HEADLINE
metric (CenterNet-R18-DCN train img/s/chip vs the reference's only published
throughput-at-parity number) is printed LAST so single-line consumers get it.

Metrics (BASELINE.md / VERDICT r1 #6):
  - pointpillars train samples/s at full KITTI scale (baseline ~24.5, 1 chip)
  - p50 decode+rotated-NMS latency for one CenterPoint task head (reference
    inline timings: decode 3.3-3.7 ms + CPU-custom-op NMS 1.3-30 ms/task,
    center_head.py:349-368 -> best-case baseline 4.8 ms)
  - YOLOv8-s bs=1 640x640 inference img/s (no published reference number)
  - Faster R-CNN R50-FPN bs=1 inference img/s (no published reference number)
  - HEADLINE: CenterNet train throughput vs 74 img/s/chip
    (590 img/s on 8x Ascend 910, minddet/models/centernet/README.md:443-444)

Budget design (VERDICT r2 item 1): every bench runs in its OWN subprocess
with its own wall-clock cap, so one overrun can never starve the rest. The
headline runs first with the largest slice; secondaries run cheapest-first.
A repo-local persistent compile cache (.jax_cache, gitignored — it persists
in the working tree across rounds) makes the driver's run start warm — cold
remote compiles of the zoo models take tens of minutes each.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE_CANDIDATES = (
    os.path.join(_REPO, ".jax_cache"),
    os.path.expanduser("~/.cache/jax_comp"),
)


def _setup_cache() -> None:
    import jax

    for cand in _CACHE_CANDIDATES:
        try:
            os.makedirs(cand, exist_ok=True)
            probe = os.path.join(cand, ".probe")
            with open(probe, "w") as f:
                f.write("ok")
            os.remove(probe)
        except OSError:
            continue
        jax.config.update("jax_compilation_cache_dir", cand)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return


BASELINE_IMG_PER_SEC_PER_CHIP = 74.0
BASELINE_PP_SAMPLES_PER_SEC = 24.5
BASELINE_DECODE_NMS_MS = 4.8  # reference best case per task head


def _sync(x) -> float:
    """Pull a scalar to host: under the axon tunnel block_until_ready can
    return before execution finishes, a host read cannot."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


_T0 = time.perf_counter()


def _phase(msg: str) -> None:
    """Per-phase wall timestamps to stderr so a killed child is attributable
    (VERDICT r3 weak #1)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _peak_flops() -> float:
    """Chip peak for MFU. TPU v5e bf16 ~197 TFLOP/s; override with
    TPU_PEAK_FLOPS for other parts."""
    return float(os.environ.get("TPU_PEAK_FLOPS", 197e12))


def _mfu_from_cost(cost, step_s: float):
    try:
        flops = float(cost["flops"])
    except Exception:
        return None
    if flops <= 0 or step_s <= 0:
        return None
    return round(flops / step_s / _peak_flops(), 4)


def _analytic_cost(traced):
    """Exact dot/conv flops from the jaxpr. XLA's cost_analysis counts a
    lax.scan body ONCE, so the scanned-RPN programs under-report by ~2.3x
    (r4 A/B: same model, 4.3% "MFU" scanned vs 9.6% unrolled); the jaxpr
    walker multiplies by trip count (utils/flops.py)."""
    try:
        from minddet_tpu.utils.flops import traced_flops

        f = traced_flops(traced)
        return {"flops": f} if f > 0 else None
    except Exception:
        return None


def _cost_analysis(lowered, compiled):
    """flops dict for MFU. ``lowered.cost_analysis()`` returns None on the
    axon backend; ``compiled.cost_analysis()`` works (dict, or a one-element
    list of dicts on older jaxlibs)."""
    for obj in (compiled, lowered):
        try:
            c = obj.cost_analysis()
        except Exception:
            continue
        if isinstance(c, (list, tuple)):
            c = c[0] if c else None
        if isinstance(c, dict) and c.get("flops"):
            return c
    return {}


def _pkg_fingerprint() -> str:
    """sha256 over the package sources: any code change invalidates the
    cached init pytrees below (conservative but always safe)."""
    import hashlib

    h = hashlib.sha256()
    pkg = os.path.join(_REPO, "minddet_tpu")
    for root, _, files in sorted(os.walk(pkg)):
        for f in sorted(files):
            if f.endswith(".py"):
                with open(os.path.join(root, f), "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()


def _cached_init(name: str, make):
    """Persist a bench's init pytree (variables/targets) in .jax_cache.

    model.init TRACES the whole loss program on the single host core
    (~45-65 s per heavy bench, measured) — at driver time that's pure
    repeated work, so the materialized pytree is msgpack-cached next to the
    compile cache (both persist in the working tree across rounds) and
    reloaded in ~1-2 s. Keyed by a package-source fingerprint; any code
    change falls back to a fresh init and rewrites the file.
    """
    import flax
    import jax
    import numpy as np

    d = os.path.join(_REPO, ".jax_cache")
    path = os.path.join(d, f"bench_init_{name}.msgpack")
    fp = _pkg_fingerprint()
    try:
        with open(path, "rb") as f:
            blob = flax.serialization.msgpack_restore(f.read())
        if blob.get("fingerprint") == fp:
            _phase(f"init cache hit ({name})")
            return blob["tree"]
    except Exception:
        pass
    def _canon(t):
        # msgpack rejects tuples; lists/dicts of arrays round-trip
        if isinstance(t, tuple):
            return [_canon(x) for x in t]
        if isinstance(t, list):
            return [_canon(x) for x in t]
        if isinstance(t, dict):
            return {k: _canon(v) for k, v in t.items()}
        return np.asarray(t)

    tree = make()
    # round-trip even the fresh path so container types (tuple vs list,
    # FrozenDict vs dict) are canonical either way — otherwise the cached
    # and fresh runs would produce DIFFERENT input pytrees and miss each
    # other's compiled-executable cache entries
    blob = flax.serialization.msgpack_serialize(
        {"fingerprint": fp, "tree": _canon(
            flax.serialization.to_state_dict(tree))})
    _ = jax
    try:
        os.makedirs(d, exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    except Exception:
        pass
    return flax.serialization.msgpack_restore(blob)["tree"]


def bench_centernet_train() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minddet_tpu.core.optim import adamw
    from minddet_tpu.models.detectors.centernet import CenterNet
    from minddet_tpu.ops.targets import centernet_targets_batch
    from minddet_tpu.train.loop import TrainState, make_train_step

    # CN_BS: batch lever. r4 sweep: bs=32 measured 351.0 img/s (+4.5% over
    # bs=16's 336.5) on an isolated child, but its larger executable pays
    # more per-run tunnel load (squeezed faster_rcnn out of two full-budget
    # rehearsals) and one rehearsal wobbled to 303 — the stable
    # reference-comparable bs=16 stays the default.
    BATCH, RES, NUM_CLASSES, STEPS = (
        int(os.environ.get("CN_BS", "16")), 512, 80, 20)
    model = CenterNet(num_classes=NUM_CLASSES, depth=18, dcn=True,
                      dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ho = wo = RES // 4

    # only init's example input lives on host; the benched image is
    # generated on device (see below)
    image_np = np.random.RandomState(0).randn(1, RES, RES, 3).astype(
        np.float32)
    rs = np.random.RandomState(1)
    o = 128
    boxes = np.zeros((BATCH, o, 4), np.float32)
    classes = rs.randint(0, NUM_CLASSES, (BATCH, o)).astype(np.int32)
    mask = np.zeros((BATCH, o), bool)
    for b in range(BATCH):
        n = 8
        xy = rs.uniform(0, wo - 30, (n, 2))
        wh = rs.uniform(4, 30, (n, 2))
        boxes[b, :n] = np.concatenate([xy, xy + wh], 1)
        mask[b, :n] = True

    # init runs as an EAGER op-by-op program; through the axon tunnel each
    # eager dispatch pays a remote round trip (~185 s total measured), so
    # run it on the CPU backend. Everything ELSE materializes ON DEVICE in
    # three tiny jitted programs: host->device transfer through the tunnel
    # is the dominant cost of this child (~150 s measured for the old
    # ~315 MB f32 device_put: params 60 + Adam zeros 120 + target maps 84 +
    # image 50), so ship only the ~75 MB of params/BN stats and the
    # few-KB box lists — opt-state zeros, Gaussian target maps and the
    # random image are cheaper to COMPUTE remotely than to SEND.
    tx = adamw(5e-4, clip_global_norm=35.0)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = _cached_init(
            "centernet_vars",
            lambda: model.init(rng, jnp.asarray(image_np[:1]), train=False))
    _phase("cpu init done")
    dev = jax.devices()[0]
    params = jax.device_put(variables["params"], dev)
    bstats = jax.device_put(variables.get("batch_stats", {}), dev)
    small = jax.device_put(
        {"boxes": boxes, "classes": classes, "mask": mask,
         "key": jax.random.PRNGKey(0)}, dev)
    state = jax.jit(lambda p, b: TrainState.create(p, b, tx))(params, bstats)
    targets = jax.jit(lambda s: centernet_targets_batch(
        s["boxes"], s["classes"], s["mask"], ho, wo, NUM_CLASSES, 0.7,
    ))(small)
    image = jax.jit(lambda s: jax.random.normal(
        s["key"], (BATCH, RES, RES, 3), jnp.float32))(small)
    batch = {"image": image, "targets": targets}
    _phase("device_put done (params only; state/targets/image on device)")

    def loss_apply(variables, batch, train=True):
        return model.apply(
            variables, batch["image"], batch["targets"], train=train,
            method=model.loss, mutable=["batch_stats"],
        )

    step_fn = make_train_step(loss_apply, donate=True)
    traced = step_fn.trace(state, batch)
    lowered = traced.lower()
    _phase("lowered")
    compiled = lowered.compile()
    cost = _analytic_cost(traced) or _cost_analysis(lowered, compiled)
    _phase("compiled (cache hit = local)")
    state, metrics = compiled(state, batch)
    _sync(metrics["loss"])
    _phase("first step synced (executable load)")

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = compiled(state, batch)
    _sync(metrics["loss"])
    dt = time.perf_counter() - t0
    _phase("timed steps done")

    img_per_sec = BATCH * STEPS / dt
    return {
        "metric": "centernet_r18dcn_train_img_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": f"img/s/chip (bs={BATCH}, 512x512, bf16, incl. on-device "
                "target gen)",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
        "mfu": _mfu_from_cost(cost, dt / STEPS),
    }


def bench_pointpillars_train() -> dict:
    """Full production KITTI scale: 496x432 grid, 18k points, 214k anchors,
    the fused loss_from_gt path (device voxelize + anchor mask + assign).

    The anchor grids ride in the batch as runtime inputs (fast data path)
    instead of trace-time constants (slow executable-load path) — see
    ``PointPillars.loss_from_gt``."""
    import jax
    import jax.numpy as jnp

    from minddet_tpu.core.optim import adamw
    from minddet_tpu.models.detectors.pointpillars import PointPillars
    from minddet_tpu.train.loop import TrainState, make_train_step
    from minddet_tpu.train.train import synthetic_points_batches

    # bs=8/chip default: the r4 batch sweep measured 91/136/142 samples/s
    # at bs=4/8/16 (per-step fixed costs — param stacking, sort/scatter
    # index plumbing — dominate at bs=4), so the throughput metric runs at
    # the knee. The reference's 24-25 samples/s is bs=4/chip (BASELINE.md:
    # 15); the unit string carries our bs=4 number for like-for-like.
    BATCH, STEPS = int(os.environ.get("PP_BS", "8")), 10
    pcr = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    # PP_S2D=1 flips the space-to-depth RPN layout for A/B measurement
    # (tests pin output equality; only speed/executable size differ):
    # s2d scatter+RPN 89.3 vs 85.8 samples/s in the early-r4 sweep.
    # PP_SCAN_MIN picks which RPN blocks scan vs unroll: the late-r4 sweep
    # (after custom-VJP BN stats + 65-wide canvas + sort-compact) measured
    # 161.4 / 178.5 / 191.5 / 191.6 samples/s at scan-min 2 / 4 / 6 /
    # full-unroll — the big-activation blocks' scan stacking dominates, so
    # blocks 0+1 unroll by default and block2 keeps the small executable.
    model = PointPillars(
        num_classes=1, dtype=jnp.bfloat16,
        rpn_space_to_depth=os.environ.get("PP_S2D", "1") != "0",
        rpn_scan_inner=not os.environ.get("PP_UNROLL"),
        rpn_scan_min_layers=int(os.environ.get("PP_SCAN_MIN", "6")),
        # pre-stacked scan params: no per-step kernel restack / grad unstack
        rpn_stacked_params=os.environ.get("PP_STACKED", "0") == "1")
    raw = next(synthetic_points_batches(BATCH, pcr, num_points=18000,
                                        max_gt=24))
    raw.pop("step", None)
    _phase("data ready")
    # init eagerly on CPU (each eager TPU dispatch pays a tunnel round trip)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_batch = {k: jnp.asarray(v) for k, v in raw.items()}
        cpu_batch.update(model.anchor_set())
        variables = _cached_init(
            ("pointpillars" if os.environ.get("PP_S2D", "1") == "0"
             else "pointpillars_s2d")
            + ("_stk" if model.rpn_stacked_params else ""),
            lambda: model.init({"params": jax.random.PRNGKey(0)}, cpu_batch,
                               method=model.loss_from_gt))
    _phase("cpu init done")
    dev = jax.devices()[0]
    tx = adamw(2e-4)
    params = jax.device_put(variables["params"], dev)
    bstats = jax.device_put(variables.get("batch_stats", {}), dev)
    # Adam zeros materialize on device — host->device bytes are the
    # bottleneck under the tunnel, not FLOPs
    state = jax.jit(lambda p, b: TrainState.create(p, b, tx))(params, bstats)
    batch = jax.device_put(cpu_batch, dev)
    _phase("device_put done")

    def loss_apply(vs, b, train=True):
        return model.apply(vs, b, train=train, method=model.loss_from_gt,
                           mutable=["batch_stats"])

    step_fn = make_train_step(loss_apply, donate=True)
    traced = step_fn.trace(state, batch)
    lowered = traced.lower()
    _phase("lowered")
    compiled = lowered.compile()
    cost = _analytic_cost(traced) or _cost_analysis(lowered, compiled)
    _phase("compiled (cache hit = local)")
    state, metrics = compiled(state, batch)
    _sync(metrics["loss"])
    _phase("first step synced (executable load)")
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = compiled(state, batch)
    _sync(metrics["loss"])
    dt = time.perf_counter() - t0
    _phase("timed steps done")
    sps = BATCH * STEPS / dt
    return {
        "metric": "pointpillars_train_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": f"samples/s/chip (bs={BATCH}, 496x432 grid, 18k pts, fused "
                "voxelize+assign+train, bf16; 89.0 at the reference's "
                "bs=4/chip)",
        "vs_baseline": round(sps / BASELINE_PP_SAMPLES_PER_SEC, 3),
        "mfu": _mfu_from_cost(cost, dt / STEPS),
    }


def bench_centerpoint_train() -> dict:
    """CenterPoint-pillar at nuScenes production scale (512x512 canvas,
    120k points, 6 task heads, fused voxelize + Gaussian target assignment
    + train step — configs/centerpoint_pp_nusc.yaml). The reference never
    publishes a train throughput for it, so vs_baseline is None; the number
    answers VERDICT r3 item 5 (CenterPoint step never measured)."""
    import jax
    import jax.numpy as jnp

    from minddet_tpu.core.optim import adamw
    from minddet_tpu.models.detectors.centerpoint import CenterPoint
    from minddet_tpu.train.loop import TrainState, make_train_step
    from minddet_tpu.train.train import synthetic_points_batches

    # bs=8 default (r4 batch sweep: 39.6 -> 59.1 samples/s from bs=4 -> 8;
    # per-step fixed costs amortize, same story as PointPillars)
    BATCH, STEPS = int(os.environ.get("CP_BS", "8")), 10
    pcr = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    model = CenterPoint(dtype=jnp.bfloat16,
                        rpn_space_to_depth=bool(os.environ.get("CP_S2D")),
                        rpn_scan_inner=not os.environ.get("CP_UNROLL"),
                        # late-r4 sweep: 80.7 / 87.5 / 90.3 / 89.7
                        # samples/s at scan-min 2 / 4 / 6 / full-unroll
                        # (the big-activation blocks' scan stacking
                        # dominates) — blocks 0+1 unroll by default
                        rpn_scan_min_layers=int(
                            os.environ.get("CP_SCAN_MIN", "6")),
                        rpn_stacked_params=os.environ.get(
                            "CP_STACKED", "0") == "1")
    raw = next(synthetic_points_batches(
        BATCH, pcr, num_points=120000, max_gt=64, num_classes=10,
        num_features=5, box_dim=9))
    raw.pop("step", None)
    _phase("data ready")
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_batch = {k: jnp.asarray(v) for k, v in raw.items()}
        variables = _cached_init(
            ("centerpoint_s2d" if os.environ.get("CP_S2D") else "centerpoint")
            + ("_stk" if model.rpn_stacked_params else ""),
            lambda: model.init({"params": jax.random.PRNGKey(0)}, cpu_batch,
                               method=model.loss_from_gt))
    _phase("cpu init done")
    dev = jax.devices()[0]
    tx = adamw(1e-3, clip_global_norm=35.0)
    params = jax.device_put(variables["params"], dev)
    bstats = jax.device_put(variables.get("batch_stats", {}), dev)
    # Adam zeros materialize on device (see bench_pointpillars_train)
    state = jax.jit(lambda p, b: TrainState.create(p, b, tx))(params, bstats)
    batch = jax.device_put(cpu_batch, dev)
    _phase("device_put done")

    def loss_apply(vs, b, train=True):
        return model.apply(vs, b, train=train, method=model.loss_from_gt,
                           mutable=["batch_stats"])

    step_fn = make_train_step(loss_apply, donate=True)
    traced = step_fn.trace(state, batch)
    lowered = traced.lower()
    _phase("lowered")
    compiled = lowered.compile()
    cost = _analytic_cost(traced) or _cost_analysis(lowered, compiled)
    _phase("compiled (cache hit = local)")
    state, metrics = compiled(state, batch)
    _sync(metrics["loss"])
    _phase("first step synced (executable load)")
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = compiled(state, batch)
    _sync(metrics["loss"])
    dt = time.perf_counter() - t0
    _phase("timed steps done")
    sps = BATCH * STEPS / dt
    return {
        "metric": "centerpoint_train_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": f"samples/s/chip (bs={BATCH}, 512x512 canvas, 120k pts, 6 "
                "task heads, fused voxelize+assign+train, bf16; no "
                "published reference throughput)",
        "vs_baseline": None,
        "mfu": _mfu_from_cost(cost, dt / STEPS),
    }


def bench_decode_nms_p50() -> dict:
    """One CenterPoint task head's decode + rotated NMS as a single device
    program (the reference splits this device->CPU via nms_fast.so).

    The axon tunnel adds ~40-60 ms per dispatch+host-read round trip, so a
    per-call wall clock would measure the tunnel, not the chip. K dependent
    iterations are chained inside ONE jit (each on a perturbed heatmap) and
    the wall time is divided — the standard amortized device-latency
    measurement."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minddet_tpu.ops.nms import rotated_nms

    H = W = 128
    NMS_PRE, NMS_POST = 1000, 83
    K = 20
    rs = np.random.RandomState(0)
    dev = jax.devices()[0]
    hm = jax.device_put(rs.randn(H, W).astype(np.float32), dev)
    reg = jax.device_put(rs.rand(H, W, 2).astype(np.float32), dev)
    dim = jax.device_put(rs.rand(H, W, 3).astype(np.float32), dev)
    rot = jax.device_put(rs.randn(H, W, 2).astype(np.float32), dev)

    def decode_nms(hm, reg, dim, rot):
        scores = jax.nn.sigmoid(hm).reshape(-1)
        k_scores, k_idx = jax.lax.top_k(scores, NMS_PRE)
        ys = (k_idx // W).astype(jnp.float32)
        xs = (k_idx % W).astype(jnp.float32)
        r2 = reg.reshape(-1, 2)[k_idx]
        d2 = jnp.exp(dim.reshape(-1, 3)[k_idx]) * 0.8
        rr = rot.reshape(-1, 2)[k_idx]
        yaw = jnp.arctan2(rr[:, 0], rr[:, 1])
        cx = (xs + r2[:, 0]) * 0.8 - 51.2
        cy = (ys + r2[:, 1]) * 0.8 - 51.2
        bev = jnp.stack([cx, cy, d2[:, 0], d2[:, 1], yaw], -1)
        keep, _ = rotated_nms(bev, k_scores, iou_threshold=0.2,
                              score_threshold=0.1, max_outputs=NMS_POST)
        return jnp.sum(k_scores[jnp.clip(keep, 0, NMS_PRE - 1)])

    @jax.jit
    def chained(hm, reg, dim, rot):
        def body(i, acc):
            return acc + decode_nms(hm + 0.01 * i, reg, dim, rot)
        return jax.lax.fori_loop(0, K, body, 0.0)

    _sync(chained(hm, reg, dim, rot))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(chained(hm, reg, dim, rot))
        times.append((time.perf_counter() - t0) * 1e3 / K)
    p50 = float(np.median(times))
    return {
        "metric": "decode_rotated_nms_p50_ms",
        "value": round(p50, 2),
        "unit": "ms p50 device time (amortized over 20 chained iters), one "
                "task head, 128x128 hm -> top1000 -> Pallas rotated NMS 83 "
                "(vs_baseline = baseline/ours, >1 is faster)",
        "vs_baseline": round(BASELINE_DECODE_NMS_MS / p50, 3),
    }


def _bf16_params(variables):
    """Cast f32 param leaves to bf16 before device_put: these inference
    models compute in bf16 anyway, and host->device bytes through the
    tunnel are the child's dominant cost (Faster R-CNN R50: ~160 MB f32)."""
    import jax
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        return x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x

    return jax.tree_util.tree_map(cast, variables)


def _bench_infer(model, variables, image, steps=30):
    """bs=1 PIPELINED inference throughput (not per-call latency): all steps
    are dispatched back-to-back and synced once, keeping the device queue
    full — the axon tunnel costs ~40-60 ms per dispatch+host-read round trip
    so a per-call sync would measure the tunnel, not the chip. Per-image
    device latency for the postprocess stage is what bench_decode_nms_p50
    reports."""
    import jax

    @jax.jit
    def predict(img):
        return model.apply(variables, img, method=model.predict)

    out = predict(image)
    _sync(out["scores"])
    t0 = time.perf_counter()
    outs = [predict(image) for _ in range(steps)]
    _sync(outs[-1]["scores"])
    return steps / (time.perf_counter() - t0)


def bench_yolov8s_infer() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minddet_tpu.models.detectors.yolov8 import YOLOv8

    model = YOLOv8(num_classes=80, image_hw=(640, 640), dtype=jnp.bfloat16)
    image_np = np.random.RandomState(0).rand(1, 640, 640, 3).astype(np.float32)
    # eager init on CPU — each eager TPU dispatch pays a tunnel round trip
    with jax.default_device(jax.devices("cpu")[0]):
        variables = _cached_init(
            "yolov8s",
            lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(image_np)))
    dev = jax.devices()[0]
    variables = jax.device_put(_bf16_params(variables), dev)
    image = jax.device_put(image_np, dev)
    ips = _bench_infer(model, variables, image)
    return {
        "metric": "yolov8s_infer_img_per_sec_bs1",
        "value": round(ips, 2),
        "unit": "img/s (bs=1, 640x640, bf16, PIPELINED throughput incl. "
                "fused NMS; no published reference number)",
        "vs_baseline": None,
    }


def bench_faster_rcnn_infer() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minddet_tpu.models.detectors.faster_rcnn import FasterRCNN

    model = FasterRCNN(num_classes=80, depth=50, image_hw=(512, 512),
                       dtype=jnp.bfloat16)
    image_np = np.random.RandomState(0).rand(1, 512, 512, 3).astype(np.float32)
    # init through predict (the ROI box head only materializes on that
    # path), eagerly on CPU — eager TPU dispatches are tunnel round trips
    with jax.default_device(jax.devices("cpu")[0]):
        variables = _cached_init(
            "faster_rcnn",
            lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(image_np),
                               method=model.predict))
    dev = jax.devices()[0]
    variables = jax.device_put(_bf16_params(variables), dev)
    image = jax.device_put(image_np, dev)
    ips = _bench_infer(model, variables, image, steps=20)
    return {
        "metric": "faster_rcnn_r50_infer_img_per_sec_bs1",
        "value": round(ips, 2),
        "unit": "img/s (bs=1, 512x512, bf16, PIPELINED throughput incl. "
                "RPN/ROI/NMS; no published reference number)",
        "vs_baseline": None,
    }


# name -> (fn, cold-cache wall estimate s, warm-cache estimate s).
# Warm numbers measured 2026-08-18 (the tunnel's executable-load cost
# collapsed from ~10 s/MB in r3 to ~1-2.5 s/MB): centernet ~105 s (66 s of
# that is loading the 26 MB step), decode ~7 s, pointpillars ~45 s,
# centerpoint ~110 s, yolov8s ~70 s. Cold numbers include remote compiles.
_HEADLINE = "centernet_train"
_BENCHES = {
    "centernet_train": (bench_centernet_train, 2100, 130),
    "decode_nms": (bench_decode_nms_p50, 300, 30),
    "pointpillars_train": (bench_pointpillars_train, 1900, 70),
    "centerpoint_train": (bench_centerpoint_train, 2400, 140),
    "yolov8s_infer": (bench_yolov8s_infer, 1200, 90),
    # rcnn warm: 185 s measured 2026-08-18 (09:42-09:45 child), most of it
    # CPU-side eager predict-path init — now msgpack-cached like the others
    "faster_rcnn_infer": (bench_faster_rcnn_infer, 3000, 160),
}
# secondaries cheapest-first so a tight budget lands the most lines
_SECONDARY_ORDER = ("decode_nms", "pointpillars_train", "centerpoint_train",
                    "yolov8s_infer", "faster_rcnn_infer")


def _install_fake_benches() -> None:
    """BENCH_FAKE='{name: {sleep: s, fail: bool}}' swaps every bench for a
    stub — lets tests drive the parent orchestration (budgeting, one-process
    core chunk, partial-stdout salvage, SIGTERM flush) without a device."""
    spec = json.loads(os.environ["BENCH_FAKE"])

    def make(name, metric):
        cfg = spec.get(name, {})

        def fake():
            time.sleep(float(cfg.get("sleep", 0)))
            if cfg.get("fail"):
                raise RuntimeError(f"fake {name} failure")
            return {"metric": metric, "value": 1.0, "unit": "fake",
                    "vs_baseline": None}

        return fake

    for metric, name in _METRIC_TO_NAME.items():
        est = spec.get(name, {}).get("est")
        old = _BENCHES[name]
        _BENCHES[name] = (make(name, metric),
                          est or old[1], est or old[2])
# the one-process core chunk: headline first, then the metrics VERDICT r3
# item 1 requires, then centerpoint (all four fit ~360 s warm, measured)
_CORE_SEQ = ("centernet_train", "decode_nms", "pointpillars_train",
             "centerpoint_train")
_METRIC_TO_NAME = {
    "centernet_r18dcn_train_img_per_sec_per_chip": "centernet_train",
    "decode_rotated_nms_p50_ms": "decode_nms",
    "pointpillars_train_samples_per_sec_per_chip": "pointpillars_train",
    "centerpoint_train_samples_per_sec_per_chip": "centerpoint_train",
    "yolov8s_infer_img_per_sec_bs1": "yolov8s_infer",
    "faster_rcnn_r50_infer_img_per_sec_bs1": "faster_rcnn_infer",
}


def _run_seq(names) -> None:
    """Child mode: run benches sequentially in ONE process (one python/jax/
    tunnel startup for all of them) and print each JSON line AS IT LANDS, so
    a mid-run kill loses only the unfinished bench."""
    if not os.environ.get("BENCH_FAKE"):
        _setup_cache()
    for name in names:
        _phase(f"start {name}")
        try:
            print(json.dumps(_BENCHES[name][0]()), flush=True)
        except Exception as e:  # keep going: later benches may still fit
            print(f"bench {name} raised: {e!r}", file=sys.stderr, flush=True)


def _collect_lines(stdout: str, done: dict) -> None:
    """Parse every metric line a child printed into ``done``."""
    for line in (stdout or "").strip().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        name = _METRIC_TO_NAME.get(rec.get("metric"))
        if name:
            done[name] = line


def _spawn_seq(names, timeout_s: float, done: dict) -> None:
    """Run benches in one child; salvage completed lines even on
    timeout/crash (TimeoutExpired carries the partial stdout)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--seq",
           ",".join(names)]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout_s, cwd=_REPO)
        stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
    except subprocess.TimeoutExpired as e:
        stdout = e.stdout.decode() if isinstance(e.stdout, bytes) else (
            e.stdout or "")
        stderr = e.stderr.decode() if isinstance(e.stderr, bytes) else (
            e.stderr or "")
        rc = "timeout"
        print(f"bench chunk {names} hit its {timeout_s:.0f}s cap",
              file=sys.stderr, flush=True)
    if rc not in (0, "timeout"):
        print(f"bench chunk {names} rc={rc}:\n{(stderr or '')[-2000:]}",
              file=sys.stderr, flush=True)
    _collect_lines(stdout, done)


def main() -> None:
    """Parent orchestration for the driver's fixed wall budget.

    The three must-land metrics (headline CenterNet train, decode+NMS,
    PointPillars train) run sequentially in ONE child process: the dominant
    cost is the tunnel's per-executable load (~10 s/MB) plus ~30-40 s of
    python/jax startup per process, so sharing one process buys a whole
    extra metric. Each completed line prints immediately (a hard kill keeps
    everything already finished); remaining zoo benches get their own
    subprocesses with individual caps. At exit (or SIGTERM/SIGINT) the lines
    re-print in canonical order with the headline LAST, plus a
    'bench_incomplete' marker when anything is missing (ADVICE r2)."""
    import signal

    start = time.monotonic()
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))
    warm = os.path.isdir(os.path.join(_REPO, ".jax_cache")) and any(
        f != ".probe" for f in os.listdir(os.path.join(_REPO, ".jax_cache")))
    if os.environ.get("BENCH_ASSUME_COLD"):  # cache-repopulation runs
        warm = False
    est_idx = 2 if warm else 1

    done: dict = {}

    def _flush_and_exit(signum=None, frame=None):
        missing = [n for n in _BENCHES if n not in done]
        if missing:
            print(json.dumps({
                "metric": "bench_incomplete", "value": len(missing),
                "unit": f"benches not run: {','.join(missing)}",
                "vs_baseline": None,
            }), flush=True)
        for n in _SECONDARY_ORDER:
            if n in done:
                print(done[n], flush=True)
        if _HEADLINE in done:
            print(done[_HEADLINE], flush=True)
        os._exit(0 if _HEADLINE in done else 1)

    signal.signal(signal.SIGTERM, _flush_and_exit)
    signal.signal(signal.SIGINT, _flush_and_exit)

    def remaining():
        return budget - (time.monotonic() - start)

    # preflight: the device tunnel can be DOWN for hours (2026-08-17 outage:
    # backend init hangs instead of erroring). A 75 s probe subprocess makes
    # a dead-tunnel run fail fast with a self-explanatory marker instead of
    # six children each hanging to their caps.
    if os.environ.get("BENCH_FAKE"):
        device_ok = True  # orchestration dry runs never touch the device
    else:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=75, cwd=_REPO)
            device_ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            device_ok = False
    if not device_ok:
        print(json.dumps({
            "metric": "bench_device_unreachable", "value": 1,
            "unit": "TPU backend init hung/failed in a 75s probe — tunnel "
                    "down (see docs/STATUS.md 'TPU outage'); no benches run",
            "vs_baseline": None,
        }), flush=True)
        _flush_and_exit()

    # core chunk: headline + the two VERDICT-required secondaries, one
    # process, essentially the whole budget (the child prints lines as they
    # finish, so a cap hit keeps whatever landed)
    _spawn_seq(_CORE_SEQ, max(120.0, remaining() - 5.0), done)

    # remaining zoo benches share ONE child: python/jax/tunnel startup is a
    # flat ~30-40 s per process, so grouping saves a whole startup and the
    # later benches inherit the earlier ones' leftover slack (the r4 margin
    # by which faster_rcnn kept missing the budget). The child prints each
    # line as it lands, so a cap kill salvages completed metrics. Names
    # whose estimate can't fit the leftover at all are still skipped.
    rest = []
    budget_left = remaining() - 5.0
    need = 45.0  # one startup for the whole chunk
    for name in _SECONDARY_ORDER:
        if name in done:
            continue
        fn, est_cold, est_warm = _BENCHES[name]
        est = (est_cold, est_warm)[est_idx - 1]
        if need + est * 0.8 + 10.0 > budget_left:
            print(f"bench budget low ({remaining():.0f}s left), skipping "
                  f"{name}", file=sys.stderr, flush=True)
            continue
        rest.append(name)
        need += est
    if rest:
        _spawn_seq(tuple(rest), max(60.0, remaining() - 5.0), done)

    _flush_and_exit()


if __name__ == "__main__":
    if os.environ.get("BENCH_FAKE"):
        _install_fake_benches()
    if len(sys.argv) >= 3 and sys.argv[1] in ("--one", "--seq"):
        _run_seq(sys.argv[2].split(","))
    else:
        main()
