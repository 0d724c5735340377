"""Multi-host runtime + component-sharded path index.

Two scaling axes (SURVEY.md §2.3 mapping):
  * data  — read/k-mer batches (embarrassingly parallel);
  * shard — the path index partitioned by graph *component* (the
    reference's per-component block-diagonal partitioning,
    ref: seed_finder.hpp:1178-1235, reused as the index-sharding axis).

Sharded counting: each shard holds an FM index over the path sequences
of its components; a query batch is broadcast, each shard counts its own
occurrences, and the global genome-occurrence count (gocc) is the psum
over shards — identical to the single-index count because components are
disjoint. Locate stays shard-local; hit sets merge by allgather
(host-side fetch here; ICI collective on a real slice).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from psi_tpu.fmindex import FMIndex


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Bring up the JAX multi-host runtime (N-host pod slice). No-op when
    unconfigured (single host)."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def put_global(x, sharding) -> jax.Array:
    """Place host data as a GLOBAL array on a (possibly multi-process)
    mesh: every process passes the same full-size host array and
    contributes its addressable shards. Single-process this is a plain
    device_put."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(
        x.shape, sharding, lambda idx: x[idx]
    )


class ShardedFMArrays(NamedTuple):
    """Stacked per-shard FM arrays, padded to a common size and sharded
    on the leading (shard) axis."""

    occ_dense: jax.Array  # int32 [S, n_pad+1, 4]
    C: jax.Array          # int32 [S, SIGMA+1]
    sa: jax.Array         # int32 [S, n_pad]
    sizes: jax.Array      # int32 [S] true text sizes
    n_pad: int


def build_sharded_index(
    fms: List[FMIndex], mesh: Mesh, axis: str = "shard"
) -> ShardedFMArrays:
    """Stack per-shard FM indexes (one per component group) and place
    them sharded over the mesh axis."""
    n_shards = mesh.shape[axis]
    assert len(fms) == n_shards, (len(fms), n_shards)
    n_pad = max(fm.size for fm in fms)
    S = n_shards
    occ = np.zeros((S, n_pad + 1, 4), dtype=np.int32)
    C = np.zeros((S, 7), dtype=np.int32)
    sa = np.zeros((S, n_pad), dtype=np.int32)
    sizes = np.zeros(S, dtype=np.int32)
    for s, fm in enumerate(fms):
        n = fm.size
        sizes[s] = n
        for c in range(1, 5):
            occ[s, 1: n + 1, c - 1] = np.cumsum(fm.bwt == c, dtype=np.int32)
        occ[s, n + 1:] = occ[s, n]
        C[s, : len(fm.C)] = fm.C
        sa[s, :n] = fm.sa
    sharding = NamedSharding(mesh, P(axis))
    return ShardedFMArrays(
        occ_dense=put_global(occ, sharding),
        C=put_global(C, sharding),
        sa=put_global(sa, sharding),
        sizes=put_global(sizes, sharding),
        n_pad=n_pad,
    )


def sharded_count(
    mesh: Mesh, arrays: ShardedFMArrays, codes: np.ndarray, axis: str = "shard"
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Count a query batch against every shard.

    Returns (total_counts [N], per-shard lo [S, N], per-shard hi [S, N]);
    total counts equal the unsharded gocc (components are disjoint).
    """
    shard_map = jax.shard_map

    codes_j = put_global(codes, NamedSharding(mesh, P()))

    def kernel(occ, C, sizes, codes):
        # occ: [1, n_pad+1, 4] local shard slice
        occ = occ[0]
        C = C[0]
        n = sizes[0]
        N = codes.shape[0]
        hi0 = jnp.full(N, n, dtype=jnp.int32).astype(jnp.int32)
        lo0 = jnp.zeros_like(hi0)  # varying over the shard axis, like hi0

        def step(state, c):
            lo, hi = state
            alive = lo < hi
            new_lo = C[c] + occ[lo, c - 1]
            new_hi = C[c] + occ[hi, c - 1]
            lo = jnp.where(alive, new_lo, lo)
            hi = jnp.where(alive, jnp.maximum(new_lo, new_hi), hi)
            return (lo, hi), None

        (lo, hi), _ = jax.lax.scan(step, (lo0, hi0), codes.T)
        total = jax.lax.psum(hi - lo, axis)
        return total[None], lo[None], hi[None]

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    total, lo, hi = fn(arrays.occ_dense, arrays.C, arrays.sizes, codes_j)
    if jax.process_count() > 1:
        # totals are psum-replicated across shards: any addressable
        # shard's copy is the global answer; lo/hi come back for the
        # LOCAL shards only (locate stays shard-local by design)
        def local_rows(a):
            shards = sorted(
                a.addressable_shards, key=lambda s: s.index[0].start or 0
            )
            return np.concatenate([np.asarray(s.data) for s in shards])

        return (
            np.asarray(total.addressable_data(0))[0],
            local_rows(lo),
            local_rows(hi),
        )
    # every shard holds the same psum'd total; take shard 0's copy
    return np.asarray(total)[0], np.asarray(lo), np.asarray(hi)


def sharded_count_2d(
    mesh: Mesh,
    arrays: ShardedFMArrays,
    codes: np.ndarray,
    data_axis: str = "data",
    shard_axis: str = "shard",
) -> np.ndarray:
    """Fully composed 2-D parallelism: the query batch shards over the
    `data` axis while the index shards over the `shard` axis — every
    device holds one (query-slice, index-shard) tile; global gocc is the
    psum over the shard axis only. Returns total counts [N]."""
    shard_map = jax.shard_map
    n_data = mesh.shape[data_axis]
    pad = (-codes.shape[0]) % n_data
    padded = np.concatenate(
        [codes, np.ones((pad,) + codes.shape[1:], codes.dtype)]
    ) if pad else codes
    codes_j = jnp.asarray(padded)

    def kernel(occ, C, sizes, codes_local):
        occ = occ[0]
        C = C[0]
        n = sizes[0]
        N = codes_local.shape[0]
        hi0 = jnp.full(N, n, dtype=jnp.int32).astype(jnp.int32)
        lo0 = jnp.zeros_like(hi0)
        # carry varies over both mesh axes (index over shard, queries
        # over data) — align the initial carry's varying axes
        hi0 = jax.lax.pcast(hi0, (data_axis,), to="varying")
        lo0 = jax.lax.pcast(lo0, (data_axis,), to="varying")

        def step(state, c):
            lo, hi = state
            alive = lo < hi
            new_lo = C[c] + occ[lo, c - 1]
            new_hi = C[c] + occ[hi, c - 1]
            lo = jnp.where(alive, new_lo, lo)
            hi = jnp.where(alive, jnp.maximum(new_lo, new_hi), hi)
            return (lo, hi), None

        (lo, hi), _ = jax.lax.scan(step, (lo0, hi0), codes_local.T)
        return jax.lax.psum(hi - lo, shard_axis)[None]

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(shard_axis), P(shard_axis), P(shard_axis), P(data_axis)),
        out_specs=P(shard_axis, data_axis),
    )
    total = fn(arrays.occ_dense, arrays.C, arrays.sizes, codes_j)
    # every shard row holds the same psum'd totals for its data slice
    return np.asarray(total)[0][: codes.shape[0]]


def sharded_locate(
    arrays: ShardedFMArrays, lo: np.ndarray, hi: np.ndarray,
    max_width: int, axis: str = "shard",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gather text positions per shard for the given ranges.

    Returns (shard_idx, query_idx, positions) flattened across shards —
    the host-side allgather merge of per-shard hit sets. The SA stays
    DEVICE-RESIDENT: the occurrence expansion plans shard-local SA
    indices on host (lo/hi are small), a shard_map gathers positions on
    every shard's own device, and only the hits come down (cap-padded
    int32 per shard) — at chr scale the former full-SA host fetch was a
    multi-GB download per call and defeated the point of sharding."""
    S, N = lo.shape
    widths = np.maximum(hi - lo, 0).astype(np.int64)
    per_tot = widths.sum(axis=1)
    total = int(per_tot.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    cap = max(16, 1 << (int(per_tot.max()) - 1).bit_length())
    idx = np.zeros((S, cap), dtype=np.int32)
    query_l = []
    for s in range(S):
        w = widths[s]
        t = int(per_tot[s])
        rows = np.repeat(np.arange(N, dtype=np.int64), w)
        within = np.arange(t, dtype=np.int64) - np.repeat(
            np.cumsum(w) - w, w
        )
        idx[s, :t] = lo[s][rows] + within
        query_l.append(rows)
    mesh = arrays.sa.sharding.mesh
    sharding = NamedSharding(mesh, jax.sharding.PartitionSpec(axis))
    idx_d = put_global(idx, sharding)

    def local(sa_d, idx_d):
        safe = jnp.clip(idx_d[0], 0, sa_d.shape[1] - 1)
        return sa_d[0][safe][None]

    pos_d = jax.shard_map(
        local, mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(axis),) * 2,
        out_specs=jax.sharding.PartitionSpec(axis),
        check_vma=False,
    )(arrays.sa, idx_d)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        pos_d = multihost_utils.process_allgather(pos_d, tiled=True)
    pos2 = np.asarray(pos_d)
    shard = np.repeat(np.arange(S, dtype=np.int64), per_tot)
    query = np.concatenate(query_l)
    pos = np.concatenate(
        [pos2[s, : int(per_tot[s])] for s in range(S)]
    ).astype(np.int64)
    return shard, query, pos


def partition_paths_by_component(
    graph, pindex, n_shards: int
) -> Tuple[List[List[int]], List[int]]:
    """Assign indexed paths to shards by their component, balancing total
    sequence length. Returns (per-shard path-index lists, component of
    each path)."""
    ranges = graph.component_ranges()

    def comp_of(path) -> int:
        first = path.get_nodes()[0]
        rank = graph.id_to_rank(first)
        for ci, (lo_r, hi_r) in enumerate(ranges):
            if lo_r <= rank < hi_r:
                return ci
        return 0

    pset = pindex.get_paths_set()
    comp = [comp_of(p) for p in pset]
    comp_len = {}
    for p, c in zip(pset, comp):
        comp_len[c] = comp_len.get(c, 0) + p.get_sequence_len()
    # greedy bin packing of components over shards
    shard_load = [0] * n_shards
    comp_shard = {}
    for c in sorted(comp_len, key=comp_len.get, reverse=True):
        s = int(np.argmin(shard_load))
        comp_shard[c] = s
        shard_load[s] += comp_len[c]
    per_shard = [[] for _ in range(n_shards)]
    for i, c in enumerate(comp):
        per_shard[comp_shard[c]].append(i)
    return per_shard, comp
