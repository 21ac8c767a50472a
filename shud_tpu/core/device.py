"""Device-side mesh: registers MeshData as a JAX pytree and moves arrays.

Static scalars (entity counts) become aux data so they stay Python ints at
trace time; array fields become pytree leaves.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from shud_tpu.core.mesh import MeshData

_STATIC_FIELDS = ("num_ele", "num_riv", "num_seg", "num_lake",
                  "watershed_area", "roll_offsets")
_ARRAY_FIELDS = tuple(
    f.name for f in dataclasses.fields(MeshData) if f.name not in _STATIC_FIELDS
)

jax.tree_util.register_dataclass(
    MeshData, data_fields=list(_ARRAY_FIELDS), meta_fields=list(_STATIC_FIELDS)
)


def to_device(md: MeshData, float_dtype=jnp.float64) -> MeshData:
    """Move all array fields to device, casting floats to *float_dtype* and
    index arrays to int32."""
    kwargs = {}
    for name in _STATIC_FIELDS:
        kwargs[name] = getattr(md, name)
    for name in _ARRAY_FIELDS:
        raw = getattr(md, name)
        if raw is None:
            kwargs[name] = None
            continue
        if name == "edge_blocks":
            from shud_tpu.core.pallas_edge import edge_blocks_to_device

            kwargs[name] = edge_blocks_to_device(raw)
            continue
        v = np.asarray(raw)
        if np.issubdtype(v.dtype, np.floating):
            kwargs[name] = jnp.asarray(v, dtype=float_dtype)
        else:
            kwargs[name] = jnp.asarray(v, dtype=jnp.int32)
    return MeshData(**kwargs)
