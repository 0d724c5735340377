"""Pallas TPU kernel for the FM backward-search step.

The rank inner loop is random access: per (query, step) two small reads
from HBM-resident tables. XLA lowers such gathers to serialized
dynamic-slice loops; this kernel instead streams a query tile through
VMEM with an explicitly double-buffered DMA pipeline — the fetch for
query i+1 is in flight while query i computes — hiding HBM latency the
way the hardware allows (guide: Async DMA / double-buffering pattern).

Layout: dense per-position occ table occ[n+1, 8] int32 (ACGT in columns
0..3, padded to 8 lanes). One backward-search step for a tile:

    new_lo = C[c] + occ[lo, c-1]
    new_hi = C[c] + occ[hi, c-1]

Opt-in via PSI_USE_PALLAS=1 (bench A/Bs it against the XLA gather path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _step_kernel(
    pos_ref,      # SMEM int32 [2*Q] scalar-prefetch: lo/hi positions
    occ_hbm,      # HBM int32 [n+1, 8]
    out_ref,      # VMEM int32 [2*Q, 8] gathered occ rows
):
    """Gather occ rows for 2*Q positions with a 2-deep DMA pipeline."""

    def body(scratch, sems):
        n_rows = pos_ref.shape[0]

        def get_dma(slot, idx):
            return pltpu.make_async_copy(
                occ_hbm.at[pl.ds(pos_ref[idx], 1), :],
                scratch.at[slot],
                sems.at[slot],
            )

        get_dma(0, 0).start()

        def loop(i, _):
            slot = jax.lax.rem(i, 2)
            nslot = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_rows)
            def _():
                get_dma(nslot, i + 1).start()

            get_dma(slot, i).wait()
            out_ref[pl.ds(i, 1), :] = scratch[slot]
            return 0

        jax.lax.fori_loop(0, n_rows, loop, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, 1, 8), jnp.int32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def gather_occ_rows(occ_padded: jax.Array, positions: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """occ_padded: int32 [n+1, 8]; positions: int32 [M] -> int32 [M, 8]."""
    M = positions.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _step_kernel,
        out_shape=jax.ShapeDtypeStruct((M, 8), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(positions, occ_padded)


@functools.partial(jax.jit, static_argnames=("interpret",))
def backward_search_pallas(
    occ_padded: jax.Array,  # int32 [n+1, 8] dense occ (cols 0..3 used)
    C: jax.Array,           # int32 [SIGMA+1]
    n: jax.Array,           # int32 scalar text length
    codes: jax.Array,       # int32 [N, k]
    interpret: bool = False,
):
    """Full k-step backward search using the Pallas row-gather kernel."""
    N = codes.shape[0]
    lo0 = jnp.zeros(N, dtype=jnp.int32)
    hi0 = jnp.full(N, n, dtype=jnp.int32).astype(jnp.int32)

    def step(state, c):
        lo, hi = state
        pos = jnp.concatenate([lo, hi])
        rows = gather_occ_rows(occ_padded, pos, interpret=interpret)
        occ_c = jnp.take_along_axis(
            rows, jnp.concatenate([c, c])[:, None] - 1, axis=1
        )[:, 0]
        alive = lo < hi
        new_lo = C[c] + occ_c[:N]
        new_hi = C[c] + occ_c[N:]
        lo = jnp.where(alive, new_lo, lo)
        hi = jnp.where(alive, jnp.maximum(new_lo, new_hi), hi)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(step, (lo0, hi0), codes.T)
    return lo, hi


def occ_dense_padded(fm) -> np.ndarray:
    """Host: dense per-position occ padded to 8 int32 lanes."""
    n = fm.size
    dense = np.zeros((n + 1, 8), dtype=np.int32)
    for c in range(1, 5):
        dense[1:, c - 1] = np.cumsum(fm.bwt == c, dtype=np.int32)
    return dense
