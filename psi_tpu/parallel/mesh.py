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
    """Place a pytree fully replicated on the mesh (multi-process
    safe: every process contributes its addressable replicas)."""
    from psi_tpu.parallel.distributed import put_global

    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: put_global(np.asarray(x), sharding)
        if hasattr(x, "shape") else x,
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


def sharded_trie_search(
    mesh: Mesh,
    stream_arrays,
    keys: np.ndarray,
    k: int,
    use_pallas: bool = False,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Data-parallel trie-batched search (ops/fm_trie.py): sorted
    distinct keys split into contiguous per-device chunks (each stays
    sorted), per-shard host schedules stacked and sharded over "data",
    index replicated; shard_map runs the frontier kernels per device.

    Returns (lo, hi) int32 [N] in key order.
    """
    from psi_tpu.ops import fm_trie
    from psi_tpu.ops.fm_stream import QTILE

    D = mesh.shape["data"]
    N = len(keys)
    per = -(-N // D)
    Npad = QTILE
    while Npad < per:
        Npad *= 2

    parents = np.zeros((D, k, Npad), dtype=np.int32)
    chars = np.ones((D, k, Npad), dtype=np.int32)
    perms = []
    sizes = []
    for d in range(D):
        chunk = keys[d * per: (d + 1) * per]
        sizes.append(len(chunk))
        if len(chunk) == 0:
            perms.append(np.zeros(0, dtype=np.int64))
            continue
        sched = fm_trie.build_schedule(chunk, k)
        for j in range(k):
            parents[d, j] = fm_trie._pad_level(
                sched.parents[j], Npad, max(int(sched.parents[j][-1]), 0)
            )
            chars[d, j] = fm_trie._pad_level(
                sched.chars[j], Npad, int(sched.chars[j][-1])
            )
        perms.append(sched.leaf_perm)

    arrays_r = replicate(mesh, stream_arrays)

    def local(parents_d, chars_d):
        return fm_trie._trie_device(
            arrays_r, parents_d[0], chars_d[0],
            use_pallas=use_pallas, interpret=interpret,
        )

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    from psi_tpu.parallel.distributed import put_global

    sharding = NamedSharding(mesh, P("data"))
    lo, hi = fn(put_global(parents, sharding), put_global(chars, sharding))
    if jax.process_count() > 1:
        # DCN-spanning mesh: gather every process's data-shard results
        from jax.experimental import multihost_utils

        lo = multihost_utils.process_allgather(lo, tiled=True)
        hi = multihost_utils.process_allgather(hi, tiled=True)
    lo = np.asarray(lo).reshape(D, Npad)
    hi = np.asarray(hi).reshape(D, Npad)
    out_lo = np.empty(N, dtype=np.int32)
    out_hi = np.empty(N, dtype=np.int32)
    for d in range(D):
        if sizes[d]:
            out_lo[d * per: d * per + sizes[d]] = lo[d][perms[d]]
            out_hi[d * per: d * per + sizes[d]] = hi[d][perms[d]]
    return out_lo, out_hi
