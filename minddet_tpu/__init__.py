"""minddet_tpu — a TPU-native detection & segmentation framework in JAX.

Built from scratch with the capabilities of mindspore-lab/minddet (see SURVEY.md):
a registry-driven model zoo (CenterNet, PointPillars, CenterPoint, SSD, YOLO,
Faster/Mask R-CNN, DeepLabV3+, UNet), detection ops as XLA/Pallas kernels
(voxelization, NMS, rotated IoU, DCNv2, ROIAlign, heatmap decode), and pjit
data-parallel training over a `jax.sharding.Mesh`.

Unlike the reference — which forks its stack three times per model family —
minddet_tpu has ONE config system, ONE registry, ONE train loop, and a shared
ops library, all designed for XLA's static-shape, functional compilation model.
"""

__version__ = "0.1.0"


def _honor_cpu_pin() -> None:
    """Re-assert a CPU-pinned JAX_PLATFORMS env var over plugin overrides.

    The axon TPU plugin's sitecustomize force-sets ``jax_platforms`` to
    "axon,cpu" at interpreter start, overriding the env var. A process the
    user pinned to CPU (tests, data-prep CLIs, multi-host CPU rigs, the
    driver's multichip dryrun) must not try to initialize the TPU backend —
    with the device tunnel down that hangs or errors instead of falling
    back. Only the pin-AWAY-from-the-TPU direction is honored: the login
    profile exports JAX_PLATFORMS=axon globally, so blindly re-asserting the
    env var would UNDO a deliberate in-process CPU override (e.g. the test
    conftest's). Only possible before backends initialize; best-effort.
    """
    import os

    env = os.environ.get("JAX_PLATFORMS", "")
    if not env or "axon" in env or "tpu" in env:
        return
    try:
        import jax

        if "axon" in (jax.config.jax_platforms or ""):
            jax.config.update("jax_platforms", env)
    except Exception:  # backend already initialized or jax absent
        pass


_honor_cpu_pin()

from minddet_tpu.core.registry import (  # noqa: F401
    BACKBONES,
    DATASETS,
    DETECTORS,
    HEADS,
    LOSSES,
    NECKS,
    READERS,
    Registry,
    build_from_cfg,
)
