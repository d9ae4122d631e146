"""Device-mesh construction for dp/fsdp/tp axes.

TPU-native counterpart of the reference's process-group topology
(prismatic/training/strategies/fsdp.py:84-89: FSDP HYBRID_SHARD = shard within
node, replicate across): here the same intent is expressed as a
`jax.sharding.Mesh` with named axes — `fsdp` rides fast ICI links inside a
slice, `dp` spans slices/DCN, `tp` (not present in the reference) shards
attention-head/MLP dims for models that exceed one chip's HBM.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from {axis_name: size}; -1 means "remaining devices".

    Default: all devices on a single `fsdp` axis (ZeRO-3-style, the
    reference's "full-shard" strategy mapped to one slice).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    axes = dict(axes or {"fsdp": n})
    n_fixed = 1
    wild = None
    for name, size in axes.items():
        if size == -1:
            if wild is not None:
                raise ValueError("only one axis may be -1")
            wild = name
        else:
            n_fixed *= size
    if wild is not None:
        if n % n_fixed != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes {axes}")
        axes[wild] = n // n_fixed
    total = math.prod(axes.values())
    if total != n:
        raise ValueError(f"mesh {axes} needs {total} devices, have {n}")
    dev_array = np.asarray(devices).reshape(*axes.values())
    return Mesh(dev_array, tuple(axes.keys()))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Batch-dim sharding for input pytrees."""
    if axis not in mesh.axis_names:
        return replicated(mesh)
    return NamedSharding(mesh, P(axis))


def sequence_sharding(mesh: Mesh, batch, seq_axis: str = "sp",
                      batch_axis: str = "dp"):
    """Sequence-parallel batch shardings: [B, T] token arrays shard their
    token dim over `seq_axis` (and batch over `batch_axis`); everything else
    (pixel_values etc.) shards batch-only.

    This is the whole of sequence parallelism under GSPMD: the train step is
    UNCHANGED — XLA inserts the all-gathers where attention needs the full
    sequence and keeps embedding/FFN/loss math on local token shards. No
    reference counterpart (torch-FSDP has no SP; SURVEY.md §2.5). Each [B, T]
    leaf's T must divide by the sp axis size (pad the bucket otherwise —
    collators already pad to multiples of 64)."""
    if seq_axis not in mesh.axis_names:
        return jax.tree.map(lambda _: data_sharding(mesh, batch_axis), batch)
    sp = mesh.shape[seq_axis]
    b_axis = batch_axis if batch_axis in mesh.axis_names else None

    def spec(x):
        if getattr(x, "ndim", 0) == 2 and x.shape[1] % sp == 0:
            return NamedSharding(mesh, P(b_axis, seq_axis))
        return data_sharding(mesh, batch_axis)

    return jax.tree.map(spec, batch)
