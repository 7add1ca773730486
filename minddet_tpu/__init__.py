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
