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

Budget design (VERDICT r2 item 1 + r4 item 1): the headline runs FIRST in
its own subprocess with a hard slice; everything else runs value-ordered in
one shared child whose completed lines are salvaged even when the budget cap
kills it. A repo-local persistent compile cache (.jax_cache) makes repeated
runs warm — but the working tree is re-created at round transitions (the r4
post-mortem), so the DRIVER's run starts with whatever its own earlier steps
cached. That is why ``__graft_entry__.entry()`` returns the exact
``_headline_setup`` program below: the driver's entry compile-check then
seeds both the local compile cache and the server-side compile for the
headline bench ~1 h before the bench itself runs.

Measured cost structure (2026-08-20, 1-core host):
  - host->device transfers: ~0.2-0.5 MB/s (!). The old 60 MB param upload
    was ~200 s of the headline child; ``_device_init`` eliminates it
    (first-sync measured 202 s -> 1.4 s).
  - fresh REMOTE compile of the 25.7 MB headline step: ~21 s, and the
    first call afterward is free (the server keeps the executable).
  - LOCAL persistent-cache hit: compile ~1 s, but the first call uploads
    the serialized executable to the server (~5 s/MB today, 1-10 s/MB
    across rounds) — 25.7 MB -> ~126 s measured. Still the safe path:
    bounded and deterministic, vs a server compile of unknown state.
  - timed steps: ~1 s. Executable SIZE therefore still decides the
    driver-budget fit of each bench.
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


# per-bench fingerprint scopes (VERDICT r4 item 1b): each bench's init cache
# keys on the package subpaths its program actually depends on, so e.g. a
# tracking-eval or data-loader edit cannot cold-start the CenterNet headline
# (the r4 failure mode). Every scope includes bench.py itself (it defines the
# bench's shapes).
_FP_COMMON = ("minddet_tpu/core", "minddet_tpu/ops", "minddet_tpu/models",
              "minddet_tpu/train/loop.py", "minddet_tpu/parallel", "bench.py")
_FP_SCOPES = {
    "centernet": _FP_COMMON,
    "pointpillars": _FP_COMMON + ("minddet_tpu/train/train.py",),
    "centerpoint": _FP_COMMON + ("minddet_tpu/train/train.py",),
    "yolov8s": _FP_COMMON,
    "faster_rcnn": _FP_COMMON,
    "two_stage": _FP_COMMON + ("minddet_tpu/train/train.py",),
}


def _fingerprint(paths) -> str:
    """sha256 over the given repo-relative files/dirs (.py files only).

    Hashes REPO-RELATIVE paths, never absolute ones — the committed
    bench_cache/ spec pack must stay valid when the driver's recreated
    working tree (or any clone) lands at a different absolute path."""
    import hashlib

    h = hashlib.sha256()
    for rel in paths:
        p = os.path.join(_REPO, rel)
        if os.path.isfile(p):
            files = [p]
        else:
            files = []
            for root, _, names in sorted(os.walk(p)):
                files.extend(os.path.join(root, f) for f in sorted(names)
                             if f.endswith(".py"))
        for f in files:
            h.update(os.path.relpath(f, _REPO).encode())
            with open(f, "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()


def _scope_fingerprint(name: str) -> str:
    for scope, paths in _FP_SCOPES.items():
        if name.startswith(scope):
            return _fingerprint(paths)
    return _fingerprint(_FP_COMMON)


def _device_init(name: str, make, dtype=None):
    """Materialize a bench's init variables ON DEVICE from a cached per-leaf
    spec — no host->device parameter upload at all.

    The tunnel moves ~2.4 s/MB (measured 2026-08-20), so shipping CenterNet's
    60 MB f32 init from host was ~140 s of the headline child — the dominant
    cost after the r4 executable-size work. Instead the CPU init runs ONCE
    (keyed by the per-bench ``_FP_SCOPES`` source fingerprint, with a loud
    ``cache_stale`` marker on mismatch) and only a
    per-leaf spec {path, shape, dtype, mean, std} is persisted (a few KB);
    every later run regenerates values in one tiny jitted program on the
    device: zeros/constant leaves exactly (BN stats, zero-inited offset
    convs, focal-prior biases), weight leaves as normal(mean, std) — the
    same distribution, which is all a throughput benchmark consumes. Step
    timing is data-independent (dense static-shape compute), so metric
    values are unaffected; what changes is ~150 s of driver-budget upload.

    ``dtype`` optionally casts float leaves (the bf16 inference benches).
    Returns variables as nested plain dicts, resident on the default device.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    d = os.path.join(_REPO, ".jax_cache")
    path = os.path.join(d, f"bench_spec_{name}.json")
    fp = _scope_fingerprint(name)
    spec = None
    # second candidate: the COMMITTED spec pack (bench_cache/). The driver's
    # working tree is recreated at round transitions, wiping .jax_cache —
    # the committed copies (a few KB each, fingerprint-guarded like any
    # other spec) give its run warm init without a builder-session cache.
    for cand, tag in ((path, "cache"),
                      (os.path.join(_REPO, "bench_cache",
                                    f"bench_spec_{name}.json"), "repo")):
        try:
            with open(cand) as f:
                blob = json.load(f)
        except OSError:
            continue
        except Exception as e:
            _phase(f"init spec unreadable ({name}, {tag}): {e!r}")
            continue
        if blob.get("fingerprint") == fp:
            spec = blob["leaves"]
            _phase(f"init spec {tag} hit ({name})")
            break
        _phase(f"cache_stale: bench_spec_{name} ({tag}) fingerprint "
               "mismatch — source changed since the last warm-up; "
               "rehearse before shipping")
    if spec is None:
        _phase(f"init spec cold ({name})")

    if spec is None:
        import flax

        with jax.default_device(jax.devices("cpu")[0]):
            tree = flax.serialization.to_state_dict(make())
        leaves = []

        def walk(node, pth):
            if isinstance(node, dict):
                for k in sorted(node):
                    walk(node[k], pth + (k,))
                return
            arr = np.asarray(node)
            leaves.append({
                "path": list(pth), "shape": list(arr.shape),
                "dtype": str(arr.dtype),
                "mean": float(arr.mean()) if arr.size else 0.0,
                "std": float(arr.std()) if arr.size else 0.0,
            })

        walk(tree, ())
        spec = leaves
        try:
            os.makedirs(d, exist_ok=True)
            with open(path, "w") as f:
                json.dump({"fingerprint": fp, "leaves": leaves}, f)
        except OSError:
            pass
        _phase(f"cpu init -> spec ({name}, {len(leaves)} leaves)")

    def generate(key):
        out: dict = {}
        for i, leaf in enumerate(spec):
            dt = jnp.dtype(leaf["dtype"])
            if dtype is not None and jnp.issubdtype(dt, jnp.floating):
                dt = dtype
            shape = tuple(leaf["shape"])
            mean, std = leaf["mean"], leaf["std"]
            if std == 0.0:
                x = jnp.full(shape, mean, dt)
            else:
                x = (mean + std * jax.random.normal(
                    jax.random.fold_in(key, i), shape, jnp.float32)
                ).astype(dt)
            node = out
            for p in leaf["path"][:-1]:
                node = node.setdefault(p, {})
            node[leaf["path"][-1]] = x
        return out

    dev = jax.devices()[0]
    key = jax.device_put(jax.random.PRNGKey(7), dev)
    variables = jax.jit(generate)(key)
    _phase(f"device init generated ({name})")
    return variables


def headline_setup():
    """Build the EXACT headline program: CenterNet-R18-DCN 512x512 bf16
    (bs = CN_BS, default 128) full train step + its (state, batch) on the
    device.

    Shared verbatim with ``__graft_entry__.entry()``: the driver's entry
    compile-check lowers/compiles this very program ~1 h before the bench
    runs, seeding the persistent compile cache (and the server-side compile)
    in the fresh working tree — without this the driver's bench always
    compiles cold (r4 post-mortem: the tree is re-created at round
    transitions, so builder-session cache warm-ups never reach the driver).

    donate is OFF here (unlike the other train benches): the entry check
    calls the function with the same args it would hand back, and donation
    would invalidate them between calls; the A/B on chip measured the same
    step time either way (state copies hide under the step's compute).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minddet_tpu.core.optim import adamw
    from minddet_tpu.models.detectors.centernet import CenterNet
    from minddet_tpu.ops.targets import centernet_targets_batch
    from minddet_tpu.train.loop import TrainState, make_train_step

    _setup_cache()
    # CN_BS: batch lever. r5 chip sweep (2026-08-20): 336.4 / 350.3 /
    # 361.5 / 420.0 img/s at bs 16/32/64/128; bs=256 OOMs (the DCN
    # sampler's bf16[B,4096,1152] window temporaries, 3 live at 2.25G
    # each). bs=128 is the default now that the r4 "bigger executable
    # squeezes the zoo" objection is gone: the headline runs FIRST and
    # ALONE, and __graft_entry__.entry() compiles this exact program in
    # the driver's entry check, so the headline child's first call hits
    # the server-resident executable (isolated-child total measured 155 s
    # vs the 215 s estimate).
    BATCH, RES, NUM_CLASSES = int(os.environ.get("CN_BS", "128")), 512, 80
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

    # EVERYTHING heavy materializes ON DEVICE: params/BN stats regenerate
    # from the cached per-leaf spec in one jitted program (``_device_init``
    # — the old 60 MB f32 device_put was ~140 s of this child at the
    # tunnel's 2.4 s/MB), opt-state zeros / Gaussian target maps / the
    # random image compute remotely in three more tiny jitted programs.
    # Only the few-KB box lists ship from host.
    tx = adamw(5e-4, clip_global_norm=35.0)
    variables = _device_init(
        "centernet_vars",
        lambda: model.init(rng, jnp.asarray(image_np[:1]), train=False))
    dev = jax.devices()[0]
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
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

    step_fn = make_train_step(loss_apply, donate=False)
    return step_fn, state, batch, BATCH


def bench_centernet_train() -> dict:
    step_fn, state, batch, BATCH = headline_setup()
    STEPS = 20
    traced = step_fn.trace(state, batch)
    lowered = traced.lower()
    _phase("lowered")
    compiled = lowered.compile()
    cost = _analytic_cost(traced) or _cost_analysis(lowered, compiled)
    _phase("compiled (cache hit = local)")
    import jax

    # decompose first-sync: uploads (params shipped at device_put, running
    # asynchronously under trace/compile) vs the executable load proper
    jax.block_until_ready((state, batch))
    _phase("inputs resident on device")
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

    # bs=32/chip default after the r5 sweep: 191.7 / 199.3 / 212.7 / 209.3
    # samples/s at bs 8/16/32/64 (2026-08-20 chip) — the bs=32 knee, same
    # amortization story as the r4 bs=4->8 move (91/136/142 at 4/8/16
    # then). The reference's 24-25 samples/s is bs=4/chip (BASELINE.md:
    # 15); the unit string carries our bs=4 number for like-for-like.
    BATCH, STEPS = int(os.environ.get("PP_BS", "32")), 10
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
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_batch = {k: jnp.asarray(v) for k, v in raw.items()}
        cpu_batch.update(model.anchor_set())
        # init on a ONE-sample slice: param shapes are batch-independent,
        # and the cold CPU init (the driver's first run has no spec cache)
        # scales ~linearly with batch — bs=32 measured ~400 s vs ~60 s
        # at bs=8 on this 1-core host
        init_batch = {k: v[:1] if hasattr(v, "ndim") and v.ndim and
                      v.shape[0] == BATCH else v
                      for k, v in cpu_batch.items()}
    # params regenerate on device from the cached leaf spec (no upload)
    variables = _device_init(
        ("pointpillars" if os.environ.get("PP_S2D", "1") == "0"
         else "pointpillars_s2d")
        # stacked-params trees also depend on WHICH blocks scan, so the
        # scan-min lever joins the key only then (default trees don't)
        + (f"_stk{model.rpn_scan_min_layers}"
           if model.rpn_stacked_params else ""),
        lambda: model.init({"params": jax.random.PRNGKey(0)}, init_batch,
                           method=model.loss_from_gt))
    dev = jax.devices()[0]
    tx = adamw(2e-4)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
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
                            "CP_STACKED", "0") == "1",
                        # CP_SC65=0: lane-exact 64-ch canvas scatter A/B
                        scatter_extra_channel=os.environ.get(
                            "CP_SC65", "1") == "1")
    raw = next(synthetic_points_batches(
        BATCH, pcr, num_points=120000, max_gt=64, num_classes=10,
        num_features=5, box_dim=9))
    raw.pop("step", None)
    _phase("data ready")
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_batch = {k: jnp.asarray(v) for k, v in raw.items()}
        # one-sample init slice (see pointpillars bench: cold CPU init
        # scales with batch; param shapes don't)
        init_batch = {k: v[:1] if hasattr(v, "ndim") and v.ndim and
                      v.shape[0] == BATCH else v
                      for k, v in cpu_batch.items()}
    variables = _device_init(
        ("centerpoint_s2d" if os.environ.get("CP_S2D") else "centerpoint")
        + (f"_stk{model.rpn_scan_min_layers}"
           if model.rpn_stacked_params else "")
        + ("" if model.scatter_extra_channel else "_sc64"),
        lambda: model.init({"params": jax.random.PRNGKey(0)}, init_batch,
                           method=model.loss_from_gt))
    dev = jax.devices()[0]
    tx = adamw(1e-3, clip_global_norm=35.0)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
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
    # params regenerate on device, directly in bf16 (no upload)
    variables = _device_init(
        "yolov8s",
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(image_np)),
        dtype=jnp.bfloat16)
    dev = jax.devices()[0]
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
    # path); params regenerate on device in bf16 (no upload)
    variables = _device_init(
        "faster_rcnn",
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(image_np),
                           method=model.predict),
        dtype=jnp.bfloat16)
    dev = jax.devices()[0]
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
# Estimates are DOCUMENTATION ONLY now (the r4 estimate-based skipping
# starved real benches and is gone); fake-bench tests still override them.
_HEADLINE = "centernet_train"
_BENCHES = {
    # warm estimates re-measured 2026-08-20 after _device_init (headline:
    # 131 s fresh-remote-compile path, 213 s local-cache-hit path incl. a
    # 60 s backend-init hiccup)
    "centernet_train": (bench_centernet_train, 600, 215),
    "decode_nms": (bench_decode_nms_p50, 120, 35),
    "pointpillars_train": (bench_pointpillars_train, 600, 160),
    "centerpoint_train": (bench_centerpoint_train, 700, 200),
    "yolov8s_infer": (bench_yolov8s_infer, 400, 120),
    "faster_rcnn_infer": (bench_faster_rcnn_infer, 600, 160),
}
# the six metrics the driver run reports; two_stage (below) is an extra
# --one lever, not part of the budgeted set
_DRIVER_SET = tuple(_BENCHES)
# secondaries value-ordered (VERDICT r4 requires headline + decode + PP + CP
# driver-captured), cheap first within that
_SECONDARY_ORDER = ("decode_nms", "pointpillars_train", "centerpoint_train",
                    "yolov8s_infer", "faster_rcnn_infer")


def bench_two_stage() -> dict:
    """CenterPointTwoStage full train step (stage-1 + NMS-free proposals +
    BEV refinement) at nuScenes scale — the beyond-reference second stage's
    perf spot (VERDICT r4 item 9). Not in the driver's budgeted set; run
    with ``python bench.py --one two_stage``."""
    import jax
    import jax.numpy as jnp

    from minddet_tpu.core.optim import adamw
    from minddet_tpu.models.detectors.centerpoint import CenterPointTwoStage
    from minddet_tpu.train.loop import TrainState, make_train_step
    from minddet_tpu.train.train import synthetic_points_batches

    BATCH, STEPS = int(os.environ.get("TS_BS", "8")), 10
    pcr = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    model = CenterPointTwoStage(
        dtype=jnp.bfloat16,
        rpn_scan_min_layers=int(os.environ.get("CP_SCAN_MIN", "6")))
    raw = next(synthetic_points_batches(
        BATCH, pcr, num_points=120000, max_gt=64, num_classes=10,
        num_features=5, box_dim=9))
    raw.pop("step", None)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_batch = {k: jnp.asarray(v) for k, v in raw.items()}
        init_batch = {k: v[:1] if hasattr(v, "ndim") and v.ndim and
                      v.shape[0] == BATCH else v
                      for k, v in cpu_batch.items()}
    variables = _device_init(
        "two_stage",
        lambda: model.init({"params": jax.random.PRNGKey(0)}, init_batch,
                           method=model.loss_from_gt))
    dev = jax.devices()[0]
    tx = adamw(1e-3, clip_global_norm=35.0)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    state = jax.jit(lambda p, b: TrainState.create(p, b, tx))(params, bstats)
    batch = jax.device_put(cpu_batch, dev)
    _phase("device_put done")

    def loss_apply(vs, b, train=True):
        return model.apply(vs, b, train=train, method=model.loss_from_gt,
                           mutable=["batch_stats"])

    step_fn = make_train_step(loss_apply, donate=True)
    compiled = step_fn.trace(state, batch).lower().compile()
    _phase("compiled")
    state, metrics = compiled(state, batch)
    _sync(metrics["loss"])
    _phase("first step synced")
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = compiled(state, batch)
    _sync(metrics["loss"])
    dt = time.perf_counter() - t0
    sps = BATCH * STEPS / dt
    return {
        "metric": "centerpoint_two_stage_train_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": f"samples/s/chip (bs={BATCH}, stage1+refine, 512x512 canvas, "
                "120k pts; beyond-reference — no baseline)",
        "vs_baseline": None,
    }


_BENCHES["two_stage"] = (bench_two_stage, 700, 280)


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
        # the child's per-phase stderr timestamps make the kill attributable
        # (the r4 wipeout left no trace of WHERE the child was stuck)
        print(f"bench chunk {names} hit its {timeout_s:.0f}s cap; child "
              f"stderr tail:\n{(stderr or '')[-1500:]}",
              file=sys.stderr, flush=True)
    if rc not in (0, "timeout"):
        print(f"bench chunk {names} rc={rc}:\n{(stderr or '')[-2000:]}",
              file=sys.stderr, flush=True)
    _collect_lines(stdout, done)


def main() -> None:
    """Parent orchestration for the driver's fixed wall budget.

    Layout (VERDICT r4 item 1c/d): the HEADLINE runs first, ALONE, in its
    own child with a hard slice that always leaves room for the cheap
    decode bench — r3's layout landed the headline this way and r4's shared
    chunk didn't. The five secondaries then share ONE child (one python/jax/
    tunnel startup), value-ordered, printing each JSON line the moment it
    lands; the budget cap kills the child wherever it is and the parent
    salvages everything already printed. There is NO estimate-based
    skipping anymore: r4's estimates mis-skipped real benches, and salvage
    makes skipping pointless. At exit (or SIGTERM/SIGINT) lines re-print in
    canonical order with the headline LAST, plus a 'bench_incomplete'
    marker when anything is missing (ADVICE r2)."""
    import signal

    start = time.monotonic()
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))

    done: dict = {}

    def _flush_and_exit(signum=None, frame=None):
        missing = [n for n in _DRIVER_SET if n not in done]
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

    # headline child, ALONE: its slice reserves ~90 s at the tail so the
    # cheap decode bench lands even if the headline hangs to its cap.
    # Warm path today: ~260 s (startup 15 + init reload 4 + lambda hits 8 +
    # trace/lower 15 + compile-cache hit 20 + executable load/first-sync
    # ~200 + 20 timed steps ~1).
    headline_cap = max(60.0, min(remaining() - 90.0, 370.0))
    headline_cap = min(headline_cap, max(10.0, remaining() - 5.0))
    _spawn_seq((_HEADLINE,), headline_cap, done)

    # secondaries share ONE child, value-ordered; the cap kills it wherever
    # it is and completed lines are salvaged.
    rest = tuple(n for n in _SECONDARY_ORDER if n not in done)
    if rest and remaining() > 20.0:
        _spawn_seq(rest, remaining() - 8.0, done)

    _flush_and_exit()


if __name__ == "__main__":
    if os.environ.get("BENCH_FAKE"):
        _install_fake_benches()
    if len(sys.argv) >= 3 and sys.argv[1] in ("--one", "--seq"):
        _run_seq(sys.argv[2].split(","))
    else:
        main()
