"""Multi-chip scale-out: device mesh + sharded query pipeline.

The reference is single-process (SURVEY.md §2.3); this layer is the
framework's distribution backend built on jax.sharding:

  * axis "data"  — read/k-mer batches are data-parallel (the reference's
    thread-per-chunk design, ref: seed_finder.hpp:386-399, scaled out);
  * axis "shard" — index sharding for chr-scale occ tables (components
    partitioned across devices; queries routed, hits allgathered).

Index arrays are replicated for DP (pan-genome occ tables are small
relative to HBM); stats counters merge with psum-style reductions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from psi_tpu.ops.fm import FMArrays, backward_search_codes


def device_mesh(n_devices: Optional[int] = None, axes=("data",)) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) if len(axes) == 1 else None
    if shape is None:
        raise ValueError("only 1-D meshes supported for now")
    return Mesh(np.asarray(devs).reshape(shape), axes)


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        tree,
    )


def shard_batch(mesh: Mesh, arr: jax.Array, axis: str = "data") -> jax.Array:
    """Shard the leading dimension over the given mesh axis (padding to a
    multiple of the axis size)."""
    n = mesh.shape[axis]
    pad = (-arr.shape[0]) % n
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def sharded_backward_search(
    mesh: Mesh, arrays: FMArrays, codes: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Data-parallel batched FM search: queries sharded over "data",
    index replicated; XLA inserts no collectives on the forward path —
    hit ranges come back fully addressable (allgather on host fetch)."""
    n_queries = codes.shape[0]
    arrays_r = replicate(mesh, arrays)
    codes_d = shard_batch(mesh, jnp.asarray(codes))
    lo, hi = backward_search_codes(arrays_r, codes_d)
    return np.asarray(lo)[:n_queries], np.asarray(hi)[:n_queries]


def make_train_step(mesh: Mesh):
    """The framework's "training step" analogue: one fused sharded
    iteration of the query pipeline — batched backward search over the
    data axis plus a psum'd gocc-statistics reduction (the reference's
    atomic counters, ref: traverser_base.hpp:103-268, as collectives)."""

    @jax.jit
    def step(arrays: FMArrays, codes: jax.Array):
        lo, hi = backward_search_codes(arrays, codes)
        counts = hi - lo
        # global stats reduce (psum over the sharded batch axis happens
        # inside XLA's partitioner via the full-reduce below)
        total_occ = jnp.sum(counts)
        nonzero = jnp.sum((counts > 0).astype(jnp.int32))
        return counts, total_occ, nonzero

    return step
