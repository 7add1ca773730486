"""Device mesh & sharding helpers.

The reference's only parallelism is HCCL data-parallel with explicit
``DistributedGradReducer`` allreduces and rank-table launchers (SURVEY.md §2.5;
``centernet/train.py:124-136``, ``get_distribute_train_cmd.py:74-190``). On TPU
all of that collapses into a `jax.sharding.Mesh`: the batch is sharded over a
``data`` axis, parameters are replicated (or FSDP-sharded over ``fsdp``), and
XLA inserts the gradient psum — no rank tables, no reducers, no launchers.

Axes:
  data  — pure data parallelism (the reference's only mode)
  fsdp  — parameter/optimizer sharding (ZeRO-style), optional second axis
  model — reserved for tensor/spatial sharding of large backbones
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape; -1 means "all remaining devices"."""

    data: int = -1
    fsdp: int = 1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple:
        dims = [self.data, self.fsdp, self.model]
        known = int(np.prod([d for d in dims if d > 0]))
        dims = [n_devices // known if d == -1 else d for d in dims]
        if int(np.prod(dims)) != n_devices:
            raise ValueError(f"MeshSpec {self} does not tile {n_devices} devices")
        return tuple(dims)


_DEFAULT_MESH: Optional[Mesh] = None


def create_mesh(
    spec: MeshSpec = MeshSpec(),
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data", "fsdp", "model"),
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def set_default_mesh(mesh: Mesh) -> None:
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def get_default_mesh() -> Mesh:
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None:
        _DEFAULT_MESH = create_mesh()
    return _DEFAULT_MESH


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over data+fsdp, replicate the rest.

    0-d arrays (step counters, scalars) are replicated.
    """
    if ndim == 0:
        return NamedSharding(mesh, P())
    batch_axes = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names and mesh.shape[a] > 1)
    spec = P(batch_axes if batch_axes else None, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-dim sharded."""

    def _place(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_place, batch)


def constrain(x, spec: Optional[Sequence[Optional[str]]]):
    """``with_sharding_constraint`` from a tuple spec; no-op for ``None``.

    Call inside ``jit`` under an active ``Mesh`` context. E.g.
    ``constrain(canvas, ("data", "model"))`` shards the batch dim over the
    data axis and the BEV canvas rows over the model axis — XLA's SPMD
    partitioner then spatially partitions every downstream convolution with
    halo exchanges over ICI (the "model axis for spatial sharding of the
    512x512 BEV canvas" option from SURVEY.md §2.5). Trailing dims are
    replicated. Outside any mesh context (e.g. ``model.init`` tracing on a
    single device) this is a no-op, so spec'd models still init normally.
    """
    if spec is None:
        return x
    from jax._src import mesh as _mesh_lib

    if (_mesh_lib.thread_resources.env.physical_mesh.empty
            and jax.sharding.get_abstract_mesh().empty):
        return x
    spec = tuple(spec) + (None,) * (x.ndim - len(spec))
    return jax.lax.with_sharding_constraint(x, P(*spec))


def tp_shard_params(mesh: Mesh, params, min_size: int = 2**10):
    """Tensor parallelism over the mesh ``model`` axis (Megatron-style lite).

    Shards the OUTPUT-channel (last) dim of every conv/dense kernel — and
    the matching per-channel vectors (BN scale/bias, biases) — over the
    ``model`` axis; XLA's SPMD partitioner then propagates channel sharding
    through the elementwise chain and inserts the contraction collectives
    where a following kernel consumes the sharded channels as its input
    dim. No module changes needed: like :func:`shard_params` this is pure
    placement, the model code stays sharding-agnostic. (The reference has
    no tensor parallelism at all — DP via HCCL is its only mode,
    SURVEY.md §2.5.)

    Leaves whose last dim does not divide by the axis size (or that are
    smaller than ``min_size``) stay replicated — correctness never depends
    on which leaves end up sharded.
    """
    tp = mesh.shape.get("model", 1)

    def _place(x):
        if (tp > 1 and x.ndim >= 1 and x.size >= min_size
                and x.shape[-1] % tp == 0):
            spec = [None] * (x.ndim - 1) + ["model"]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(_place, params)


def shard_params(mesh: Mesh, params, fsdp_min_size: int = 2**18):
    """Place parameters: replicated by default; if the mesh has a non-trivial
    ``fsdp`` axis, shard the largest dim of big tensors over it (ZeRO-3-lite).
    """
    fsdp = mesh.shape.get("fsdp", 1)

    def _place(x):
        if fsdp > 1 and x.size >= fsdp_min_size:
            # shard the largest axis divisible by the fsdp size
            sizes = list(x.shape)
            order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
            for i in order:
                if sizes[i] % fsdp == 0:
                    spec = [None] * len(sizes)
                    spec[i] = "fsdp"
                    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(_place, params)
