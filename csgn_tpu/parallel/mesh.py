"""Mesh construction helpers.

Axis conventions:
  * ``"c"`` — the chunk axis of a ciphertext (the superlinear growth axis;
    the analogue of sequence length, SURVEY.md §5 "long-context").
  * ``"b"`` — the batch axis over independent ciphertexts (data parallel).
"""

from __future__ import annotations

import jax
from jax.sharding import AxisType, Mesh

__all__ = ["make_mesh", "chunk_mesh", "CHUNK_AXIS", "BATCH_AXIS"]

CHUNK_AXIS = "c"
BATCH_AXIS = "b"


def make_mesh(shape: tuple[int, ...], axis_names: tuple[str, ...], devices=None) -> Mesh:
    """A mesh with Auto axis types (collectives via shard_map / sharding hints)."""
    if devices is None:
        return jax.make_mesh(shape, axis_names, axis_types=(AxisType.Auto,) * len(shape))
    import numpy as np

    return Mesh(
        np.asarray(devices).reshape(shape),
        axis_names,
        axis_types=(AxisType.Auto,) * len(shape),
    )


def chunk_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the chunk axis (or batch axis for batched workloads)."""
    n = n_devices if n_devices is not None else len(jax.devices())
    return make_mesh((n,), (CHUNK_AXIS,))
