"""Batched FM-index queries on device (JAX/XLA; Pallas fast path for the
rank kernel).

This is HOT LOOP #1 of the engine (the reference's per-char
sdsl::backward_search, ref: include/psi/fmindex.hpp:851-869) recast as a
data-parallel kernel: one backward-search step for a whole batch of
k-mers is two `rank` evaluations per query — a checkpoint gather plus an
intra-block count over the BWT — executed for 10^4..10^6 queries at once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.fmindex import BLOCK, FMIndex, SIGMA


class FMArrays(NamedTuple):
    """Device-resident FM index.

    Two rank layouts:
      * checkpointed (compact): occ rows every BLOCK positions + BWT
        blocks for the intra-block count (~1.3 bytes/bp);
      * dense (fast): a full per-position occ table for the 4 query
        symbols — one gather per rank, no intra-block pass (16 bytes/bp;
        the TPU trade: spend HBM to kill the latency-bound inner loop).
    """

    bwt_blocks: jax.Array   # uint8 [nblocks+1, BLOCK] (padded with 255)
    occ: jax.Array          # int32 [nblocks+1, SIGMA]
    C: jax.Array            # int32 [SIGMA+1]
    sa: jax.Array           # int32 [n]
    n: int                  # text length (static)
    occ_dense: Optional[jax.Array] = None  # int32 [n+1, 4] (ACGT only)


def to_device(fm: FMIndex, dense_occ: bool = False) -> FMArrays:
    n = fm.size
    nblocks = (n + BLOCK - 1) // BLOCK
    # one spare block: position n (range end) may index block nblocks
    bwt_pad = np.full((nblocks + 1) * BLOCK, 255, dtype=np.uint8)
    bwt_pad[:n] = fm.bwt
    occ_dense = None
    if dense_occ:
        dense = np.zeros((n + 1, 4), dtype=np.int32)
        for c in range(1, 5):  # ACGT codes
            dense[1:, c - 1] = np.cumsum(fm.bwt == c, dtype=np.int32)
    return FMArrays(
        bwt_blocks=jnp.asarray(bwt_pad.reshape(nblocks + 1, BLOCK)),
        occ=jnp.asarray(fm.occ.astype(np.int32)),
        C=jnp.asarray(fm.C.astype(np.int32)),
        sa=jnp.asarray(fm.sa.astype(np.int32)),
        n=n,
        occ_dense=jnp.asarray(dense) if dense_occ else None,
    )


def _rank(arrays: FMArrays, c: jax.Array, i: jax.Array) -> jax.Array:
    """Batched rank: # of symbol c in bwt[0:i]. c,i: int32 [N]."""
    b = i // BLOCK
    base = arrays.occ[b, c]
    block = arrays.bwt_blocks[b]                       # [N, BLOCK]
    within = jnp.arange(BLOCK, dtype=jnp.int32)[None, :] < (i % BLOCK)[:, None]
    hits = (block == c[:, None].astype(jnp.uint8)) & within
    return base + jnp.sum(hits, axis=1, dtype=jnp.int32)


@jax.jit
def backward_search_codes(
    arrays: FMArrays, codes: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """SA ranges for a batch of k-mers given as a code matrix.

    codes: int32 [N, k] with FM symbol codes (ACGT = 1..4), consumed in
    FORWARD character order — the convention for the reversed-text path
    index (ref: reversed path sequences, seed_finder.hpp:779;
    forward-order go_down per char, index_iter.hpp:838-841).

    Uses the dense occ table when present (one gather per rank),
    otherwise the checkpointed layout.

    Returns (lo, hi) int32 [N]; empty ranges have lo == hi.
    """
    n = arrays.n
    N = codes.shape[0]
    lo0 = jnp.zeros(N, dtype=jnp.int32)
    hi0 = jnp.full(N, n, dtype=jnp.int32)

    if arrays.occ_dense is not None:
        def rank(c, i):
            return arrays.occ_dense[i, c - 1]
    else:
        def rank(c, i):
            return _rank(arrays, c, i)

    def step(state, c):
        lo, hi = state
        alive = lo < hi
        new_lo = arrays.C[c] + rank(c, lo)
        new_hi = arrays.C[c] + rank(c, hi)
        lo = jnp.where(alive, new_lo, lo)
        hi = jnp.where(alive, jnp.maximum(new_lo, new_hi), hi)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(step, (lo0, hi0), codes.T)
    return lo, hi


def keys_to_codes(keys: np.ndarray, k: int) -> np.ndarray:
    """Host: unpack uint64 keys to an int32 [N, k] FM-code matrix (1..4)."""
    shifts = (2 * (k - 1 - np.arange(k, dtype=np.uint64))).astype(np.uint64)
    return (((keys[:, None] >> shifts[None, :]) & np.uint64(3)) + 1).astype(
        np.int32
    )


@functools.partial(jax.jit, static_argnames=("max_width",))
def locate_ranges(
    arrays: FMArrays, lo: jax.Array, hi: jax.Array, max_width: int
) -> tuple[jax.Array, jax.Array]:
    """Gather text positions for SA ranges, padded to max_width per query.

    Returns (positions int32 [N, max_width], mask bool [N, max_width]).
    Dense-SA design: locate is a single gather (no LF walk).
    """
    widths = hi - lo
    j = jnp.arange(max_width, dtype=jnp.int32)[None, :]
    mask = j < widths[:, None]
    idx = jnp.clip(lo[:, None] + j, 0, arrays.sa.shape[0] - 1)
    pos = arrays.sa[idx]
    return pos, mask


def count_kmers_device(fm: FMIndex, keys: np.ndarray, k: int) -> np.ndarray:
    """Convenience host wrapper: counts for packed k-mers."""
    arrays = to_device(fm)
    lo, hi = backward_search_codes(arrays, jnp.asarray(keys_to_codes(keys, k)))
    return np.asarray(hi - lo)
