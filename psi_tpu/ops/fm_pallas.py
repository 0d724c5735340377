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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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
        # empty ranges keep stepping (stays empty; see fm.py step note)
        return (C[c] + occ_c[:N], C[c] + occ_c[N:]), None

    (lo, hi), _ = jax.lax.scan(step, (lo0, hi0), codes.T)
    return lo, hi


# --- blocked-gather variant -------------------------------------------------
#
# Random occ-row gathers are the latency wall. This variant sorts the
# pointers, partitions them into groups whose rows fall inside one
# H-row aligned occ window, DMAs each window HBM->VMEM once (sequential,
# full-bandwidth traffic), and gathers *within* VMEM. Groups are padded
# to a fixed size so the kernel grid is static.

H_ROWS = 2048      # occ window height (2048 x 8 x 4B = 64 KB VMEM)
GROUP = 512        # pointers per grid step (padded)


def partition_pointers(pos: np.ndarray):
    """Host: sort pointers and cut into groups that fit one H_ROWS-aligned
    occ window with <= GROUP pointers each.

    Returns (order, padded_rel int32 [G, GROUP], window_idx int32 [G],
    group_of int32 [M]) where pos[order][i] belongs to group group_of[i]
    at slot i - group_start."""
    order = np.argsort(pos, kind="stable")
    sp = pos[order]
    windows = sp // H_ROWS
    M = len(sp)
    if M == 0:
        return order, np.zeros((1, GROUP), np.int32), np.zeros(1, np.int32), []
    # vectorized cut: window-change runs, subdivided at GROUP size
    change = np.nonzero(np.diff(windows))[0] + 1
    run_starts = np.concatenate([[0], change])
    run_ends = np.concatenate([change, [M]])
    n_sub = -(-(run_ends - run_starts) // GROUP)
    g_run = np.repeat(np.arange(len(run_starts)), n_sub)
    within = np.arange(len(g_run)) - np.repeat(
        np.cumsum(n_sub) - n_sub, n_sub
    )
    g_starts = run_starts[g_run] + within * GROUP
    g_ends = np.minimum(g_starts + GROUP, run_ends[g_run])
    groups = list(zip(windows[g_starts].tolist(), g_starts.tolist(),
                      g_ends.tolist()))
    G = len(groups)
    padded_rel = np.zeros((G, GROUP), dtype=np.int32)
    window_idx = windows[g_starts].astype(np.int32)
    # scatter relative offsets into the padded matrix
    rows = np.repeat(np.arange(G), g_ends - g_starts)
    cols = np.arange(M) - np.repeat(g_starts, g_ends - g_starts)
    padded_rel[rows, cols] = (sp - windows * H_ROWS).astype(np.int32)
    return order, padded_rel, window_idx, groups


def _blocked_gather_kernel(window_idx_ref, rel_ref, occ_ref, out_ref):
    """One grid step: gather GROUP rows from the prefetched occ window."""
    rel = rel_ref[:]                       # [GROUP] int32
    out_ref[:, :] = occ_ref[rel, :]        # VMEM gather


def blocked_gather_occ(
    occ_padded: jax.Array, padded_rel: jax.Array, window_idx: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """occ rows for grouped pointers: int32 [G, GROUP, 8].

    occ_padded must be padded to a multiple of H_ROWS rows.
    """
    G = padded_rel.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # window_idx drives the occ BlockSpec
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, GROUP),
                lambda g, widx: (g, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H_ROWS, 8),
                lambda g, widx: (widx[g], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, GROUP, 8), lambda g, widx: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def kernel(widx_ref, rel_ref, occ_ref, out_ref):
        out_ref[0, :, :] = occ_ref[rel_ref[0, :], :]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, GROUP, 8), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(window_idx, padded_rel, occ_padded)


def gather_occ_rows_blocked(
    occ_padded_np: np.ndarray, positions: np.ndarray, interpret: bool = False
) -> np.ndarray:
    """End-to-end blocked gather: positions [M] -> occ rows [M, 8]."""
    n_rows = occ_padded_np.shape[0]
    pad_rows = (-n_rows) % H_ROWS
    if pad_rows:
        occ_padded_np = np.concatenate(
            [occ_padded_np,
             np.zeros((pad_rows, occ_padded_np.shape[1]), occ_padded_np.dtype)]
        )
    order, padded_rel, window_idx, groups = partition_pointers(positions)
    rows = blocked_gather_occ(
        jnp.asarray(occ_padded_np), jnp.asarray(padded_rel),
        jnp.asarray(window_idx), interpret=interpret,
    )
    rows = np.asarray(rows)
    out_sorted = np.empty((len(positions), occ_padded_np.shape[1]), np.int32)
    for gi, (w, s, e) in enumerate(groups):
        out_sorted[s:e] = rows[gi, : e - s]
    out = np.empty_like(out_sorted)
    out[order] = out_sorted
    return out


def occ_dense_padded(fm) -> np.ndarray:
    """Host: dense per-position occ padded to 8 int32 lanes."""
    n = fm.size
    dense = np.zeros((n + 1, 8), dtype=np.int32)
    for c in range(1, 5):
        dense[1:, c - 1] = np.cumsum(fm.bwt == c, dtype=np.int32)
    return dense
