"""Model export: serialize jitted inference programs (the MINDIR equivalent).

The reference exports MindSpore graphs to MINDIR at fixed shapes
(``centernet/export.py:26-60``, ``centerpoint/tools_ms/mindir.py:7-35``) and
re-runs them with ``eval_mindir.py``. The TPU-native equivalent is
``jax.export``: the jitted predict program is lowered to StableHLO and
serialized; it can be reloaded and invoked without the model code.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_predict_fn(
    fn: Callable,
    example_args: Sequence[Any],
    path: str,
) -> str:
    """Lower ``fn(*example_args)`` to StableHLO and write it to ``path``.

    Returns the path. Shapes are fixed at the example args' shapes, exactly
    like the reference's fixed-shape MINDIR export.
    """
    exported = jax_export.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported(path: str):
    """Reload a serialized program -> callable (the eval_mindir equivalent)."""
    return load_exported_program(path)[0]


def load_exported_program(path: str):
    """Reload a serialized program -> (callable, input avals).

    The avals carry the fixed export shapes, so offline consumers
    (``evaluate.py --exported``, the 310-postprocess role:
    ``centernet/postprocess.py:12-59``, ``centerpoint/tools_ms/
    eval_mindir.py:118``) can derive batch size and resolution from the
    artifact instead of the config.
    """
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax_export.deserialize(blob)
    return (lambda *args: exported.call(*args)), exported.in_avals


def export_detector(model, variables, example_image: jnp.ndarray, path: str, **predict_kwargs) -> str:
    """Export a zoo detector's fused predict (forward + decode + NMS)."""

    def predict(image):
        return model.apply(variables, image, method=model.predict, **predict_kwargs)

    return export_predict_fn(predict, (example_image,), path)


def export_detector_3d(
    model,
    variables,
    example_points: jnp.ndarray,
    example_mask: jnp.ndarray,
    path: str,
    refined: bool = False,
    **predict_kwargs,
) -> str:
    """Export a points-model's fused predict (voxelize + forward + decode +
    NMS) at fixed point-capacity shapes — the reference's CenterPoint MINDIR
    export role (``tools_ms/mindir.py:7-35`` exports at fixed
    (4, 60000, 20, 5) voxel shapes; here the raw padded point cloud is the
    fixed shape and voxelization is part of the program). ``refined=True``
    exports the two-stage ``predict_refined`` program."""
    method = model.predict_refined if refined else model.predict_from_points

    def predict(points, mask):
        return model.apply(variables, points, mask, method=method,
                           **predict_kwargs)

    return export_predict_fn(predict, (example_points, example_mask), path)
