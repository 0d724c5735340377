"""Streaming-rank Pallas kernels: batched FM rank for (mostly) sorted
position batches.

The TPU-native reformulation of HOT LOOP #1 (per-char backward search,
ref: include/psi/fmindex.hpp:851-869). XLA lowers the rank gathers to a
serialized dynamic-slice loop (~1e6 rows/s measured on v5e); these
kernels instead stream query slabs through VMEM via BlockSpec while
walking occ-table windows, each window DMA'd once per distinct window
visit (SMEM-cached across the grid).

Positions are MONOTONE when the batch is ordered by PATTERN value —
lo(p) = |{suffixes < p}| and hi(p) = lo(p) + count(p) are monotone in
pattern order whether or not p occurs, provided empty ranges keep
LF-stepping (an empty range stays empty: lo == hi gives rank(c, lo) ==
rank(c, hi)). NOTE backward search PREPENDS the fed char, so after one
LF step a key-sorted batch is ordered by the REVERSED fed prefix, not
the key: per-query scans scatter, and the fast consumer is the trie
level extension (ops/fm_trie.py) whose frontier stays pattern-sorted
by construction. All kernels remain CORRECT for arbitrary positions
via per-slab min/max window bounds (masked multi-pass); sortedness is
a performance property only.

Layout: one transposed payload table with 32-position checkpoint blocks

    payloadT[16, NB]  int32;  rows 0..5 = occ checkpoints (per symbol)
                              rows 6..8 = BWT bit-plane words (one
                              32-bit word per plane per block)

so a block's whole rank context is one lane and the intra-block count
is a single masked popcount. The in-kernel lookup uses the one
dynamic-gather form the hardware supports natively: a lane gather whose
source spans a single vreg (Mosaic rejects "multiple source vregs along
gather dimension") — hence 128-block windows and per-component gathers
from a broadcast (8, 128) source.

Queries are laid out so each (8, 128) lane-slab holds a CONTIGUOUS run
of 1024 queries (pos[..., s*1024 : (s+1)*1024]); per-slab window
bounds come in as scalar prefetch, so a slab is computed once per
window it actually intersects (one, when sorted).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psi_tpu.fmindex import FMIndex

SBLOCK = 32        # text positions per stream checkpoint block
WB = 128           # blocks per window (one vreg of payloadT lanes)
SPAN = SBLOCK * WB  # text positions per window
QROWS = 8
# slabs per grid step: larger steps amortize Mosaic's fixed per-step
# cost (~30 us measured on v5e) at the price of VMEM for the out block
# ((1, SLABS, 4, 8, 128) int32 = SLABS * 16 KB); 8..64 all correct
import os as _os

SLABS = int(_os.environ.get("PSI_SLABS", "8"))
SLAB_Q = QROWS * WB          # 1024 contiguous queries per slab
QTILE = SLABS * SLAB_Q       # 8192 queries per grid step
PAYLOAD_ROWS = 16  # 6 occ + 3 plane words + pad


class StreamArrays(NamedTuple):
    payloadT: jax.Array  # int32 [16, NBpad] (NBpad multiple of WB)
    C: jax.Array         # int32 [SIGMA+1]
    n: int               # text length (static)
    nblocks: int         # real blocks incl. the position-n spare
    #: windowed dense layout [NW, 8, WB] (occ(ACGT) rows 0..3, plane
    #: rows 4..6, pad) for the VMEM-RESIDENT kernels: payloads that fit
    #: the budget are DMA'd whole in ONE descriptor per kernel call —
    #: per-window DMA descriptor issue (~2 us of scalar-core time each)
    #: is what dominates the windowed kernels on dense sorted batches
    payload8: jax.Array | None = None
    #: match-format windowed layout [NW, 8, WB] (occ(ACGT) rows 0..3,
    #: per-char match-mask words rows 4..7): rank for a KNOWN char is
    #: 2 gathers + 1 popcount. Consumed by the fused whole-trie kernel
    #: (ops/fm_fused.py); built when it fits the residency budget.
    payloadW: jax.Array | None = None


#: resident-payload VMEM budget (bytes): texts up to ~10 Mbp qualify
RESIDENT_BUDGET = int(_os.environ.get("PSI_RESIDENT_BUDGET", 10 << 20))


def payload_host(fm: FMIndex) -> np.ndarray:
    """Host-side checkpointed bit-plane payload [16, nbpad] int32 (the
    layout StreamArrays.payloadT carries to device). Also consumed
    directly by the native single-core baseline (native/psi_fm.cpp)."""
    payload, _, _ = _payload_parts(fm)
    return payload


def _payload_parts(fm: FMIndex):
    n = fm.size
    nblocks = n // SBLOCK + 1  # block of position n always addressable
    nbpad = -(-nblocks // WB) * WB
    payload = np.zeros((PAYLOAD_ROWS, nbpad), dtype=np.int32)
    bwt_pad = np.full(nbpad * SBLOCK, 255, dtype=np.uint8)
    bwt_pad[:n] = fm.bwt
    sym = bwt_pad.reshape(nbpad, SBLOCK)
    for c in range(6):
        counts = np.count_nonzero(sym == c, axis=1)
        payload[c, 1:nblocks] = np.cumsum(counts, dtype=np.int64)[
            : nblocks - 1
        ].astype(np.int32)
    # bit-plane words (pad symbol 255 -> plane bits 1,1,1, distinct from
    # real codes 0..5)
    weights = np.uint32(1) << np.arange(SBLOCK, dtype=np.uint32)
    symu = sym.astype(np.uint32)
    for p in range(3):
        words = (((symu >> p) & 1) * weights[None, :]).sum(
            axis=1, dtype=np.uint32
        )
        payload[6 + p, :] = words.view(np.int32)
    return payload, symu, weights


def build_stream_arrays(fm: FMIndex) -> StreamArrays:
    n = fm.size
    nblocks = n // SBLOCK + 1
    nbpad = -(-nblocks // WB) * WB
    payload, symu, weights = _payload_parts(fm)
    nw = nbpad // WB
    payload8 = None
    payloadW = None
    if nw * 8 * WB * 4 <= RESIDENT_BUDGET:
        rows = payload[[1, 2, 3, 4, 6, 7, 8, 0]]  # occ ACGT, planes, pad
        payload8 = jnp.asarray(
            np.ascontiguousarray(
                rows.reshape(8, nw, WB).transpose(1, 0, 2)
            )
        )
        # match format: occ ACGT rows 0..3, match-mask words rows 4..7
        # (bit i of row 4+c-1 set iff bwt[blk*32+i] == c; pad symbol
        # 255 never matches, so padded tails rank as zero)
        wrows = np.empty((8, nbpad), dtype=np.int32)
        wrows[0:4] = payload[1:5]
        for c in range(1, 5):
            words = (
                (symu == c).astype(np.uint32) * weights[None, :]
            ).sum(axis=1, dtype=np.uint32)
            wrows[4 + c - 1] = words.view(np.int32)
        payloadW = jnp.asarray(
            np.ascontiguousarray(
                wrows.reshape(8, nw, WB).transpose(1, 0, 2)
            )
        )
    return StreamArrays(
        payloadT=jnp.asarray(payload),
        C=jnp.asarray(fm.C.astype(np.int32)),
        n=n,
        nblocks=nblocks,
        payload8=payload8,
        payloadW=payloadW,
    )


def _rank_kernel(wlo_ref, nw_ref, pos_ref, chars_ref, payload_ref, out_ref,
                 win, cache, sem):
    """Grid step t: rank(chars, pos) for one (QROWS, 1024) query tile.

    Correct for ANY positions (each slab loops over its min..max window
    range, masked). FAST when positions arrive sorted: slabs then span
    ~1 window and the window sequence is non-decreasing, so the cached
    window is DMA'd once per distinct window. Symbols must be ACGT
    codes 1..4.
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        cache[0] = -1

    neg1 = jnp.int32(-1)
    for s in range(SLABS):
        poss = pos_ref[0, s]                # (8, 128) int32
        cs = chars_ref[0, s]                # (8, 128) int32
        blk = poss // SBLOCK
        lane_slab = t * SLABS + s

        def slab_pass(j, _):
            w = wlo_ref[lane_slab] + j

            @pl.when(w != cache[0])
            def _():
                cp = pltpu.make_async_copy(
                    payload_ref.at[:, pl.ds(w * WB, WB)], win, sem
                )
                cp.start()
                cp.wait()
                cache[0] = w

            valid = (blk // WB) == w
            lbl = jnp.clip(blk - w * WB, 0, WB - 1)

            def gcomp(row):
                # lane gather from one payload component; source is a
                # single vreg along the gather dim (hardware limit)
                src = jnp.broadcast_to(
                    win[pl.ds(row, 1), :], (QROWS, WB)
                )
                return jnp.take_along_axis(src, lbl, axis=1)

            # occ base for the query's own symbol (rows by code 1..4)
            base = jnp.zeros((QROWS, WB), jnp.int32)
            for c4 in range(1, 5):
                base = base + jnp.where(cs == c4, gcomp(c4), 0)
            # intra-block count: one masked popcount over the matched
            # plane word; all int32 (two's-complement wraparound gives
            # the right masks; Mosaic has no unsigned reductions)
            match = jnp.full((QROWS, WB), neg1)
            for p in range(3):
                pw = gcomp(6 + p)
                bit = (cs >> p) & 1
                match &= jnp.where(bit == 1, pw, ~pw)
            maskw = (1 << (poss % SBLOCK)) - 1
            rank = base + jax.lax.population_count(match & maskw)
            out_ref[0, s] = jnp.where(valid, rank, out_ref[0, s])
            return 0

        out_ref[0, s] = jnp.zeros((QROWS, WB), jnp.int32)
        jax.lax.fori_loop(0, nw_ref[lane_slab], slab_pass, 0)


def _rank_stream_call(payloadT, wlo, nw, pos4, chars4, interpret):
    T = pos4.shape[0]
    blk = (1, SLABS, QROWS, WB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(blk, lambda t, wlo, nw: (t, 0, 0, 0)),
            pl.BlockSpec(blk, lambda t, wlo, nw: (t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(blk, lambda t, wlo, nw: (t, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((PAYLOAD_ROWS, WB), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _rank_kernel,
        out_shape=jax.ShapeDtypeStruct(pos4.shape, jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(wlo, nw, pos4, chars4, payloadT)


def _rank_stream_padded(arrays, chars, pos, interpret):
    """rank_stream core for M a multiple of QTILE: the [T, S, R, L] slab
    view is a free row-major reshape (slab (t, s) holds the contiguous
    run [t*QTILE + s*SLAB_Q, +SLAB_Q)).

    Window bounds are per-slab MIN/MAX, so results are correct for ANY
    positions; performance requires sorted positions (each slab then
    intersects ~1 window instead of many masked passes)."""
    M = pos.shape[0]
    by_slab = pos.reshape(-1, SLAB_Q) // SPAN
    firsts = jnp.min(by_slab, axis=1)
    lasts = jnp.max(by_slab, axis=1)
    wlo = firsts.astype(jnp.int32)
    nw = (lasts - firsts + 1).astype(jnp.int32)
    shape4 = (M // QTILE, SLABS, QROWS, WB)
    out4 = _rank_stream_call(
        arrays.payloadT, wlo, nw,
        pos.reshape(shape4), chars.reshape(shape4), interpret,
    )
    return out4.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rank_stream(
    arrays: StreamArrays, chars: jax.Array, pos: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Batched rank(c, i): # of symbol c in bwt[0:i], for MONOTONE pos
    and ACGT symbols (c in 1..4).

    chars, pos: int32 [M]. Returns int32 [M]. Correct for any
    positions; speed requires (approximately) sorted positions.
    """
    M = pos.shape[0]
    Mp = max(-(-M // QTILE) * QTILE, QTILE)
    posp = jnp.full(Mp, arrays.n, dtype=jnp.int32).at[:M].set(pos)
    charsp = jnp.ones(Mp, dtype=jnp.int32).at[:M].set(chars)
    return _rank_stream_padded(arrays, charsp, posp, interpret)[:M]


@functools.partial(jax.jit, static_argnames=("interpret",))
def backward_search_sorted(
    arrays: StreamArrays,
    codes: jax.Array,
    lo0: jax.Array | None = None,
    hi0: jax.Array | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """SA ranges for a batch of k-mers whose code rows are SORTED
    lexicographically (e.g. np.unique'd packed keys). Same contract as
    fm.backward_search_codes otherwise (forward char order, ACGT codes
    1..4, empty ranges lo == hi at an unspecified value).

    lo0/hi0 optionally seed the search (ftab ranges).

    NOTE: after the first step, positions are ordered by the REVERSED
    fed prefix, not by key order, so intermediate steps run the rank
    kernel on scattered positions — correct (min/max window bounds)
    but slow. Use trie_search for the fast level-extension form that
    keeps the frontier pattern-sorted by construction.
    """
    n = arrays.n
    N = codes.shape[0]
    if lo0 is None:
        lo0 = jnp.zeros(N, dtype=jnp.int32)
    if hi0 is None:
        hi0 = jnp.full(N, n, dtype=jnp.int32)
    # pad to whole tiles by REPEATING THE LAST ROW (keeps the batch
    # sorted and the positions monotone); done once, outside the scan
    Np = max(-(-N // QTILE) * QTILE, QTILE)
    if Np != N:
        pad = Np - N
        codes = jnp.concatenate(
            [codes, jnp.tile(codes[-1:], (pad, 1))], axis=0
        )
        lo0 = jnp.concatenate([lo0, jnp.tile(lo0[-1:], (pad,))])
        hi0 = jnp.concatenate([hi0, jnp.tile(hi0[-1:], (pad,))])

    def step(state, c):
        # lo and hi are each monotone; rank them as two separate
        # streaming passes (no interleave copy)
        lo, hi = state
        new_lo = arrays.C[c] + _rank_stream_padded(arrays, c, lo, interpret)
        new_hi = arrays.C[c] + _rank_stream_padded(arrays, c, hi, interpret)
        return (new_lo, new_hi), None

    (lo, hi), _ = jax.lax.scan(step, (lo0, hi0), codes.T)
    return lo[:N], hi[:N]


# --- rank4: ranks for ALL FOUR symbols per position ---------------------
#
# The trie level extension (ops/fm_trie.py) needs rank(c, pos) for every
# c in 1..4 at the same positions — same 7 payload gathers as one rank,
# plus three more popcounts. Output layout [T, SLABS, 4, QROWS, WB] so a
# consumer window over 1024 positions is one contiguous (4, 8, 128)
# block.


RING = 8  # in-flight window DMAs (hides HBM latency on sparse batches)


def _rank4_kernel(wlo_ref, nw_ref, pos_ref, payload_ref, out_ref,
                  winring, sems):
    """rank4 with a RING-deep window-prefetch pipeline: a slab spanning
    nw windows starts DMAs for up to RING windows ahead, so the per-
    window HBM latency (the dominant cost for sparse batches, where
    each slab spans many windows) overlaps compute. Every window j is
    started exactly once (prologue j < RING, or at pass j-RING) and
    waited exactly once (at pass j), so no semaphore leaks across
    slabs."""
    neg1 = jnp.int32(-1)
    for s in range(SLABS):
        poss = pos_ref[0, s]
        blk = poss // SBLOCK
        lane_slab = pl.program_id(0) * SLABS + s
        base = wlo_ref[lane_slab]
        nw = nw_ref[lane_slab]

        def start(j):
            slot = jax.lax.rem(j, RING)
            pltpu.make_async_copy(
                payload_ref.at[:, pl.ds((base + j) * WB, WB)],
                winring.at[slot],
                sems.at[slot],
            ).start()

        def prologue(j, _):
            start(j)
            return 0

        jax.lax.fori_loop(0, jnp.minimum(nw, RING), prologue, 0)

        def slab_pass(j, _):
            w = base + j
            slot = jax.lax.rem(j, RING)
            pltpu.make_async_copy(
                payload_ref.at[:, pl.ds(w * WB, WB)],
                winring.at[slot],
                sems.at[slot],
            ).wait()

            valid = (blk // WB) == w
            lbl = jnp.clip(blk - w * WB, 0, WB - 1)

            def gcomp(row):
                src = jnp.broadcast_to(
                    winring[slot, pl.ds(row, 1), :], (QROWS, WB)
                )
                return jnp.take_along_axis(src, lbl, axis=1)

            occ = [gcomp(c) for c in range(1, 5)]
            pw = [gcomp(6 + p) for p in range(3)]
            maskw = (1 << (poss % SBLOCK)) - 1
            for c in range(1, 5):
                match = jnp.full((QROWS, WB), neg1)
                for p in range(3):
                    match &= pw[p] if (c >> p) & 1 else ~pw[p]
                rank = occ[c - 1] + jax.lax.population_count(match & maskw)
                out_ref[0, s, c - 1] = jnp.where(
                    valid, rank, out_ref[0, s, c - 1]
                )

            @pl.when(j + RING < nw)
            def _():
                start(j + RING)

            return 0

        for c in range(4):
            out_ref[0, s, c] = jnp.zeros((QROWS, WB), jnp.int32)
        jax.lax.fori_loop(0, nw, slab_pass, 0)


def _rank4_kernel_flat(wlo_ref, nw_ref, pos_ref, payload_ref, out_ref,
                       winring, sems, prefix):
    """rank4 with a GLOBALLY flat window-prefetch pipeline.

    The per-slab ring (`_rank4_kernel`) drains at every slab boundary,
    exposing ~2 us of DMA latency per window visit — which IS the pass
    time for dense sorted batches (~2 windows/slab). Here window visits
    are numbered globally across ALL slabs of ALL grid steps (their
    payload addresses are fully determined by the scalar-prefetch
    wlo/nw tables), and one RING-deep pipeline spans slab and grid-step
    boundaries: visit g waits slot g%RING, computes, then starts visit
    g+RING — wherever that lands. Scratch persists across grid steps,
    so after the t==0 prologue the ring never drains.

    PSI_RANK4_CTL (trace-time env, DIAGNOSTIC ONLY — WRONG RESULTS):
    per-visit cost attribution controls for the A/B scripts.
    "nogather" replaces the 7 dynamic lane gathers with row-0
    broadcasts; "nopop" drops the plane gathers + popcounts (occ
    checkpoint only); "novisit" writes constants (loop + DMA cost
    only). Never set in production."""
    import os as _os_ctl

    ctl = _os_ctl.environ.get("PSI_RANK4_CTL", "")
    neg1 = jnp.int32(-1)
    t = pl.program_id(0)
    nslabs_total = prefix.shape[0] - 1

    def slab_of(g):
        # largest s with prefix[s] <= g (binary search over SMEM)
        def step(_, lohi):
            lo, hi = lohi
            mid = (lo + hi + 1) // 2
            go = prefix[mid] <= g
            return (jnp.where(go, mid, lo), jnp.where(go, hi, mid - 1))

        bits = max((nslabs_total).bit_length(), 1)
        lo, _ = jax.lax.fori_loop(
            0, bits, step, (jnp.int32(0), jnp.int32(nslabs_total - 1))
        )
        return lo

    def start_visit(g):
        s = slab_of(g)
        w = wlo_ref[s] + (g - prefix[s])
        slot = jax.lax.rem(g, RING)
        pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(w * WB, WB)],
            winring.at[slot],
            sems.at[slot],
        ).start()

    @pl.when(t == 0)
    def _():
        def scan_body(i, acc):
            prefix[i] = acc
            return acc + nw_ref[i]

        total0 = jax.lax.fori_loop(0, nslabs_total, scan_body, jnp.int32(0))
        prefix[nslabs_total] = total0

        def prologue(g, _):
            @pl.when(g < total0)
            def _():
                start_visit(g)

            return 0

        jax.lax.fori_loop(0, RING, prologue, 0)

    total = prefix[nslabs_total]
    for s in range(SLABS):
        poss = pos_ref[0, s]
        blk = poss // SBLOCK
        lane_slab = t * SLABS + s
        base = wlo_ref[lane_slab]
        gs = prefix[lane_slab]

        def visit(j, _):
            g = gs + j
            w = base + j
            slot = jax.lax.rem(g, RING)
            pltpu.make_async_copy(
                payload_ref.at[:, pl.ds(w * WB, WB)],
                winring.at[slot],
                sems.at[slot],
            ).wait()

            valid = (blk // WB) == w
            lbl = jnp.clip(blk - w * WB, 0, WB - 1)

            def gcomp(row):
                if ctl == "nogather":
                    return jnp.broadcast_to(
                        winring[slot, pl.ds(row, 1), :], (QROWS, WB)
                    )
                src = jnp.broadcast_to(
                    winring[slot, pl.ds(row, 1), :], (QROWS, WB)
                )
                return jnp.take_along_axis(src, lbl, axis=1)

            if ctl == "novisit":
                for c in range(4):
                    out_ref[0, s, c] = jnp.where(
                        valid, jnp.int32(0), out_ref[0, s, c]
                    )
            else:
                occ = [gcomp(c) for c in range(1, 5)]
                if ctl == "nopop":
                    for c in range(1, 5):
                        out_ref[0, s, c - 1] = jnp.where(
                            valid, occ[c - 1], out_ref[0, s, c - 1]
                        )
                else:
                    pw = [gcomp(6 + p) for p in range(3)]
                    maskw = (1 << (poss % SBLOCK)) - 1
                    for c in range(1, 5):
                        match = jnp.full((QROWS, WB), neg1)
                        for p in range(3):
                            match &= pw[p] if (c >> p) & 1 else ~pw[p]
                        rank = occ[c - 1] + jax.lax.population_count(
                            match & maskw
                        )
                        out_ref[0, s, c - 1] = jnp.where(
                            valid, rank, out_ref[0, s, c - 1]
                        )

            @pl.when(g + RING < total)
            def _():
                start_visit(g + RING)

            return 0

        for c in range(4):
            out_ref[0, s, c] = jnp.zeros((QROWS, WB), jnp.int32)
        jax.lax.fori_loop(0, nw_ref[lane_slab], visit, 0)


def _rank4_pair_kernel(wlo_ref, nw_ref, poslo_ref, poshi_ref, payload_ref,
                       outlo_ref, outhi_ref, winring, sems, prefix):
    """rank4 for TWO position tiles (a frontier's lo and hi arrays) in
    ONE kernel: per-slab window bounds span both tiles, the flat
    RING-deep prefetch pipeline runs once, and each window visit
    computes both tiles' ranks from the one DMA'd window. Halves the
    per-level kernel launches (and Mosaic program switches) and the
    window DMA traffic vs two rank4_stream calls — the trie's lo/hi
    tiles visit almost the same windows (ranges are nested-disjoint,
    so hi interleaves lo)."""
    neg1 = jnp.int32(-1)
    t = pl.program_id(0)
    nslabs_total = prefix.shape[0] - 1

    def slab_of(g):
        def step(_, lohi):
            lo, hi = lohi
            mid = (lo + hi + 1) // 2
            go = prefix[mid] <= g
            return (jnp.where(go, mid, lo), jnp.where(go, hi, mid - 1))

        bits = max((nslabs_total).bit_length(), 1)
        lo, _ = jax.lax.fori_loop(
            0, bits, step, (jnp.int32(0), jnp.int32(nslabs_total - 1))
        )
        return lo

    def start_visit(g):
        s = slab_of(g)
        w = wlo_ref[s] + (g - prefix[s])
        slot = jax.lax.rem(g, RING)
        pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(w * WB, WB)],
            winring.at[slot],
            sems.at[slot],
        ).start()

    @pl.when(t == 0)
    def _():
        def scan_body(i, a):
            prefix[i] = a
            return a + nw_ref[i]

        total0 = jax.lax.fori_loop(0, nslabs_total, scan_body, jnp.int32(0))
        prefix[nslabs_total] = total0

        def prologue(g, _):
            @pl.when(g < total0)
            def _():
                start_visit(g)

            return 0

        jax.lax.fori_loop(0, RING, prologue, 0)

    total = prefix[nslabs_total]
    for s in range(SLABS):
        poss_lo = poslo_ref[0, s]
        poss_hi = poshi_ref[0, s]
        blk_lo = poss_lo // SBLOCK
        blk_hi = poss_hi // SBLOCK
        lane_slab = t * SLABS + s
        base = wlo_ref[lane_slab]
        gs = prefix[lane_slab]

        def visit(j, _):
            g = gs + j
            w = base + j
            slot = jax.lax.rem(g, RING)
            pltpu.make_async_copy(
                payload_ref.at[:, pl.ds(w * WB, WB)],
                winring.at[slot],
                sems.at[slot],
            ).wait()

            for poss, blk, out_ref in (
                (poss_lo, blk_lo, outlo_ref),
                (poss_hi, blk_hi, outhi_ref),
            ):
                valid = (blk // WB) == w
                lbl = jnp.clip(blk - w * WB, 0, WB - 1)

                def gcomp(row):
                    src = jnp.broadcast_to(
                        winring[slot, pl.ds(row, 1), :], (QROWS, WB)
                    )
                    return jnp.take_along_axis(src, lbl, axis=1)

                occ = [gcomp(c) for c in range(1, 5)]
                pw = [gcomp(6 + p) for p in range(3)]
                maskw = (1 << (poss % SBLOCK)) - 1
                for c in range(1, 5):
                    match = jnp.full((QROWS, WB), neg1)
                    for p in range(3):
                        match &= pw[p] if (c >> p) & 1 else ~pw[p]
                    rank = occ[c - 1] + jax.lax.population_count(
                        match & maskw
                    )
                    out_ref[0, s, c - 1] = jnp.where(
                        valid, rank, out_ref[0, s, c - 1]
                    )

            @pl.when(g + RING < total)
            def _():
                start_visit(g + RING)

            return 0

        for c in range(4):
            outlo_ref[0, s, c] = jnp.zeros((QROWS, WB), jnp.int32)
            outhi_ref[0, s, c] = jnp.zeros((QROWS, WB), jnp.int32)
        jax.lax.fori_loop(0, nw_ref[lane_slab], visit, 0)


def rank4_pair_stream(
    arrays: StreamArrays, pos_lo: jax.Array, pos_hi: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """rank4 for two MONOTONE position arrays (the trie frontier's lo
    and hi) in one launch. Returns (r4lo, r4hi), each
    int32 [T, SLABS, 4, QROWS, WB]."""
    M = pos_lo.shape[0]
    T = M // QTILE
    bl = pos_lo.reshape(-1, SLAB_Q) // SPAN
    bh = pos_hi.reshape(-1, SLAB_Q) // SPAN
    wlo = jnp.minimum(
        jnp.min(bl, axis=1), jnp.min(bh, axis=1)
    ).astype(jnp.int32)
    whi = jnp.maximum(jnp.max(bl, axis=1), jnp.max(bh, axis=1))
    nw = (whi - wlo + 1).astype(jnp.int32)
    blk = (1, SLABS, QROWS, WB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(blk, lambda t, a, b: (t, 0, 0, 0)),
            pl.BlockSpec(blk, lambda t, a, b: (t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, SLABS, 4, QROWS, WB), lambda t, a, b: (t, 0, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, SLABS, 4, QROWS, WB), lambda t, a, b: (t, 0, 0, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((RING, PAYLOAD_ROWS, WB), jnp.int32),
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SMEM((T * SLABS + 1,), jnp.int32),
        ],
    )
    shp = (T, SLABS, 4, QROWS, WB)
    return pl.pallas_call(
        _rank4_pair_kernel,
        out_shape=[
            jax.ShapeDtypeStruct(shp, jnp.int32),
            jax.ShapeDtypeStruct(shp, jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(wlo, nw, pos_lo.reshape(T, SLABS, QROWS, WB),
      pos_hi.reshape(T, SLABS, QROWS, WB), arrays.payloadT)


def _rank4_kernel_mxu(wlo_ref, nw_ref, pos_ref, payload_ref, out_ref,
                      winring, sems, prefix, acc):
    """rank4 with the payload fetch on the MXU (round-4 candidate (a)
    from the r3 falsification: "a format with fewer dynamic gathers per
    rank"). Same flat window-prefetch pipeline as _rank4_kernel_flat,
    but each visit replaces the 7 single-vreg dynamic lane gathers with
    8 one-hot matmuls: per query sublane si,

        C_si[r, q] = sum_b W[r, b] * (lbl[si, q] == b)
                   = win[r, lbl[si, q]]

    i.e. W [32, 128] (the window's 7 payload components split into four
    uint8 BYTE PLANES) times a [128, 128] one-hot built by one
    broadcast compare — the whole payload context of 128 queries lands
    in one [32, 128] result. Operands are bf16: one-hot entries are
    exactly 0.0/1.0 and byte-plane values <= 255 are exact in bf16's
    8-bit mantissa, so the native-MXU bf16 matmul is EXACT at any text
    size with no precision-mode dependence (an earlier uint16-half f32
    formulation came back WRONG on v5e — Mosaic lowered the f32 matmul
    through bf16 passes that truncate 16-bit values; byte planes are
    immune by construction). The planes recombine to the original
    int32 bit pattern, including plane words with the sign bit set."""
    neg1 = jnp.int32(-1)
    t = pl.program_id(0)
    nslabs_total = prefix.shape[0] - 1

    def slab_of(g):
        def step(_, lohi):
            lo, hi = lohi
            mid = (lo + hi + 1) // 2
            go = prefix[mid] <= g
            return (jnp.where(go, mid, lo), jnp.where(go, hi, mid - 1))

        bits = max((nslabs_total).bit_length(), 1)
        lo, _ = jax.lax.fori_loop(
            0, bits, step, (jnp.int32(0), jnp.int32(nslabs_total - 1))
        )
        return lo

    def start_visit(g):
        s = slab_of(g)
        w = wlo_ref[s] + (g - prefix[s])
        slot = jax.lax.rem(g, RING)
        pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(w * WB, WB)],
            winring.at[slot],
            sems.at[slot],
        ).start()

    @pl.when(t == 0)
    def _():
        def scan_body(i, a):
            prefix[i] = a
            return a + nw_ref[i]

        total0 = jax.lax.fori_loop(0, nslabs_total, scan_body, jnp.int32(0))
        prefix[nslabs_total] = total0

        def prologue(g, _):
            @pl.when(g < total0)
            def _():
                start_visit(g)

            return 0

        jax.lax.fori_loop(0, RING, prologue, 0)

    total = prefix[nslabs_total]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (WB, WB), 0)
    for s in range(SLABS):
        poss = pos_ref[0, s]
        blk = poss // SBLOCK
        lane_slab = t * SLABS + s
        base = wlo_ref[lane_slab]
        gs = prefix[lane_slab]

        def visit(j, _):
            g = gs + j
            w = base + j
            slot = jax.lax.rem(g, RING)
            pltpu.make_async_copy(
                payload_ref.at[:, pl.ds(w * WB, WB)],
                winring.at[slot],
                sems.at[slot],
            ).wait()

            valid = (blk // WB) == w
            lbl = jnp.clip(blk - w * WB, 0, WB - 1)

            # W [32, 128]: byte plane b of payload component r at row
            # 7*b + r (components: occ A,C,G,T, plane 0..2; rows 28..31
            # pad). Byte values are exact in bf16.
            rows = winring[slot]                    # (16, 128) int32
            sel = jnp.concatenate([rows[1:5], rows[6:9]], axis=0)
            wf = jnp.concatenate(
                [
                    sel & 255,
                    (sel >> 8) & 255,
                    (sel >> 16) & 255,
                    (sel >> 24) & 255,
                    jnp.zeros((4, WB), jnp.int32),
                ],
                axis=0,
            ).astype(jnp.bfloat16)
            for si in range(QROWS):
                oh = (
                    iota_b == jnp.broadcast_to(lbl[si: si + 1, :], (WB, WB))
                ).astype(jnp.bfloat16)
                acc[si] = jnp.dot(
                    wf, oh, preferred_element_type=jnp.float32
                )

            def comp(r):
                b0 = acc[:, r, :].astype(jnp.int32)
                b1 = acc[:, 7 + r, :].astype(jnp.int32)
                b2 = acc[:, 14 + r, :].astype(jnp.int32)
                b3 = acc[:, 21 + r, :].astype(jnp.int32)
                return b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)

            occ = [comp(c) for c in range(4)]
            pw = [comp(4 + p) for p in range(3)]
            maskw = (1 << (poss % SBLOCK)) - 1
            for c in range(1, 5):
                match = jnp.full((QROWS, WB), neg1)
                for p in range(3):
                    match &= pw[p] if (c >> p) & 1 else ~pw[p]
                rank = occ[c - 1] + jax.lax.population_count(match & maskw)
                out_ref[0, s, c - 1] = jnp.where(
                    valid, rank, out_ref[0, s, c - 1]
                )

            @pl.when(g + RING < total)
            def _():
                start_visit(g + RING)

            return 0

        for c in range(4):
            out_ref[0, s, c] = jnp.zeros((QROWS, WB), jnp.int32)
        jax.lax.fori_loop(0, nw_ref[lane_slab], visit, 0)


def _rank4_kernel_res(wlo_ref, nw_ref, pos_ref, payload8_ref, out_ref,
                      pvmem, sem, loaded):
    """rank4 with the ENTIRE payload resident in VMEM: one DMA
    descriptor per kernel call (issued at grid step 0, scratch persists
    across steps), then every window access is a dynamic VMEM view —
    no per-window DMAs at all. Usable when the 8-row payload fits the
    VMEM budget (payload8 layout: occ ACGT rows 0..3, planes 4..6)."""
    neg1 = jnp.int32(-1)
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        cp = pltpu.make_async_copy(payload8_ref, pvmem, sem)
        cp.start()
        cp.wait()
        loaded[0] = 1

    for s in range(SLABS):
        poss = pos_ref[0, s]
        blk = poss // SBLOCK
        lane_slab = t * SLABS + s
        base = wlo_ref[lane_slab]

        def visit(j, _):
            w = base + j
            valid = (blk // WB) == w
            lbl = jnp.clip(blk - w * WB, 0, WB - 1)

            def gcomp(row):
                src = jnp.broadcast_to(
                    pvmem[w, pl.ds(row, 1), :], (QROWS, WB)
                )
                return jnp.take_along_axis(src, lbl, axis=1)

            occ = [gcomp(c) for c in range(4)]       # rows 0..3
            pw = [gcomp(4 + p) for p in range(3)]    # rows 4..6
            maskw = (1 << (poss % SBLOCK)) - 1
            for c in range(1, 5):
                match = jnp.full((QROWS, WB), neg1)
                for p in range(3):
                    match &= pw[p] if (c >> p) & 1 else ~pw[p]
                rank = occ[c - 1] + jax.lax.population_count(match & maskw)
                out_ref[0, s, c - 1] = jnp.where(
                    valid, rank, out_ref[0, s, c - 1]
                )

            return 0

        for c in range(4):
            out_ref[0, s, c] = jnp.zeros((QROWS, WB), jnp.int32)
        jax.lax.fori_loop(0, nw_ref[lane_slab], visit, 0)


def _rank4_resident_call(arrays, pos, interpret):
    M = pos.shape[0]
    T = M // QTILE
    by_slab = pos.reshape(-1, SLAB_Q) // SPAN
    wlo = jnp.min(by_slab, axis=1).astype(jnp.int32)
    nw = (jnp.max(by_slab, axis=1) - wlo + 1).astype(jnp.int32)
    NW = arrays.payload8.shape[0]
    blk = (1, SLABS, QROWS, WB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(blk, lambda t, a, b: (t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, SLABS, 4, QROWS, WB), lambda t, a, b: (t, 0, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((NW, 8, WB), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _rank4_kernel_res,
        out_shape=jax.ShapeDtypeStruct((T, SLABS, 4, QROWS, WB), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(wlo, nw, pos.reshape(T, SLABS, QROWS, WB), arrays.payload8)


def rank4_stream(
    arrays: StreamArrays, pos: jax.Array, interpret: bool = False,
    flat: bool | None = None,
) -> jax.Array:
    """ranks for all 4 symbols at MONOTONE positions pos [M]
    (M a multiple of QTILE). Returns int32 [T, SLABS, 4, QROWS, WB].

    Dispatch (PSI_RANK4 = mxu | flat | slab | resident, read at trace
    time): "mxu" is the one-hot-matmul payload fetch (round-4
    candidate); "flat"/"slab" are the r3 windowed-ring gather kernels;
    "resident" is the fully VMEM-resident gather kernel (measured ~1.3x
    slower than the ring on dense sorted batches; needs payload8).
    Legacy envs PSI_RESIDENT=1 / PSI_FLAT_RING=0 still map to
    resident/slab. Defaults and measured v5e numbers: docs/SCALING.md
    round-4 table."""
    import os

    variant = os.environ.get("PSI_RANK4")
    if variant is None:
        if os.environ.get("PSI_RESIDENT", "0") not in ("", "0"):
            variant = "resident"
        elif flat is False or os.environ.get(
            "PSI_FLAT_RING", "1"
        ) in ("", "0"):
            variant = "slab"
        else:
            variant = "flat"
    if variant == "resident" and arrays.payload8 is not None:
        return _rank4_resident_call(arrays, pos, interpret)
    if variant == "resident":
        variant = "flat"  # payload too large for VMEM residency
    M = pos.shape[0]
    T = M // QTILE
    by_slab = pos.reshape(-1, SLAB_Q) // SPAN
    wlo = jnp.min(by_slab, axis=1).astype(jnp.int32)
    nw = (jnp.max(by_slab, axis=1) - wlo + 1).astype(jnp.int32)
    blk = (1, SLABS, QROWS, WB)
    scratch = [
        pltpu.VMEM((RING, PAYLOAD_ROWS, WB), jnp.int32),
        pltpu.SemaphoreType.DMA((RING,)),
    ]
    if variant in ("flat", "mxu"):
        scratch.append(pltpu.SMEM((T * SLABS + 1,), jnp.int32))
    if variant == "mxu":
        scratch.append(pltpu.VMEM((QROWS, 32, WB), jnp.float32))
    kernel = {
        "mxu": _rank4_kernel_mxu,
        "flat": _rank4_kernel_flat,
        "slab": _rank4_kernel,
    }[variant]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(blk, lambda t, a, b: (t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, SLABS, 4, QROWS, WB), lambda t, a, b: (t, 0, 0, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, SLABS, 4, QROWS, WB), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(wlo, nw, pos.reshape(T, SLABS, QROWS, WB), arrays.payloadT)


# --- compact: host-planned child gather over rank4 output ----------------


def _compact_kernel(pwlo_ref, pnw_ref, slabc_ref, parent_ref, char_ref,
                    r4lo_ref, r4hi_ref, C_ref,
                    outlo_ref, outhi_ref, winlo, winhi, cache, semlo, semhi):
    """Child slab: new_lo[i] = C[c_i] + r4lo[c_i - 1, parent_i] (same
    for hi). parent_i values arrive in ascending runs (c-major child
    order), so the 1024-parent window cache advances monotonically with
    few resets. Children are c-MAJOR, so almost every slab has one
    uniform char (slabc_ref[s] = c, or 0 for the <=3 mixed boundary
    slabs per level): the uniform fast path gathers from the single
    needed component (4x fewer vreg gathers than the mixed path)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        cache[0] = -1

    for s in range(SLABS):
        pidx = parent_ref[0, s]              # (8, 128) parent slots
        cs = char_ref[0, s]
        lane_slab = t * SLABS + s
        slab_c = slabc_ref[lane_slab]

        def slab_pass(j, _):
            w = pwlo_ref[lane_slab] + j      # parent window (1024 slots)

            @pl.when(w != cache[0])
            def _():
                wt = w // SLABS
                ws = w % SLABS
                cplo = pltpu.make_async_copy(
                    r4lo_ref.at[wt, ws], winlo, semlo
                )
                cphi = pltpu.make_async_copy(
                    r4hi_ref.at[wt, ws], winhi, semhi
                )
                cplo.start()
                cphi.start()
                cplo.wait()
                cphi.wait()
                cache[0] = w

            valid = (pidx // SLAB_Q) == w
            lp = jnp.clip(pidx - w * SLAB_Q, 0, SLAB_Q - 1)
            row = lp // WB
            lane = lp % WB

            @pl.when(slab_c > 0)
            def _():
                comp = slab_c - 1
                plo = jnp.zeros((QROWS, WB), jnp.int32)
                phi = jnp.zeros((QROWS, WB), jnp.int32)
                for r in range(QROWS):
                    hit = row == r
                    glo = jnp.take_along_axis(
                        jnp.broadcast_to(
                            winlo[pl.ds(comp, 1), pl.ds(r, 1), :]
                            .reshape(1, WB),
                            (QROWS, WB),
                        ),
                        lane, axis=1,
                    )
                    ghi = jnp.take_along_axis(
                        jnp.broadcast_to(
                            winhi[pl.ds(comp, 1), pl.ds(r, 1), :]
                            .reshape(1, WB),
                            (QROWS, WB),
                        ),
                        lane, axis=1,
                    )
                    plo = jnp.where(hit, glo, plo)
                    phi = jnp.where(hit, ghi, phi)
                cadd = C_ref[slab_c]
                outlo_ref[0, s] = jnp.where(
                    valid, cadd + plo, outlo_ref[0, s]
                )
                outhi_ref[0, s] = jnp.where(
                    valid, cadd + phi, outhi_ref[0, s]
                )

            @pl.when(slab_c == 0)
            def _():
                plo = jnp.zeros((QROWS, WB), jnp.int32)
                phi = jnp.zeros((QROWS, WB), jnp.int32)
                for comp in range(4):
                    sel_c = cs == (comp + 1)
                    for r in range(QROWS):
                        hit = sel_c & (row == r)
                        glo = jnp.take_along_axis(
                            jnp.broadcast_to(
                                winlo[comp, pl.ds(r, 1), :], (QROWS, WB)
                            ),
                            lane, axis=1,
                        )
                        ghi = jnp.take_along_axis(
                            jnp.broadcast_to(
                                winhi[comp, pl.ds(r, 1), :], (QROWS, WB)
                            ),
                            lane, axis=1,
                        )
                        plo = jnp.where(hit, glo, plo)
                        phi = jnp.where(hit, ghi, phi)
                cadd = jnp.zeros((QROWS, WB), jnp.int32)
                for c in range(1, 5):
                    cadd = cadd + jnp.where(cs == c, C_ref[c], 0)
                outlo_ref[0, s] = jnp.where(
                    valid, cadd + plo, outlo_ref[0, s]
                )
                outhi_ref[0, s] = jnp.where(
                    valid, cadd + phi, outhi_ref[0, s]
                )

            return 0

        outlo_ref[0, s] = jnp.zeros((QROWS, WB), jnp.int32)
        outhi_ref[0, s] = jnp.zeros((QROWS, WB), jnp.int32)
        jax.lax.fori_loop(0, pnw_ref[lane_slab], slab_pass, 0)


def _compact_kernel_flat(pwlo_ref, pnw_ref, slabc_ref, parent_ref,
                         char_ref, r4lo_ref, r4hi_ref, C_ref,
                         outlo_ref, outhi_ref, winlo, winhi, semlo,
                         semhi, prefix):
    """_compact_kernel with a GLOBALLY flat window-prefetch pipeline
    (the same restructuring that _rank4_kernel_flat applies to the
    rank pass): parent-window visits are numbered globally across all
    slabs of all grid steps from the scalar-prefetch pwlo/pnw tables,
    and a RING-deep pipeline of (lo, hi) window copies spans slab and
    grid-step boundaries.

    MEASURED AND REFUTED on v5e (rep-scan trie A/B, 2^19 keys): 19.5
    vs 13.8 ms/batch against the window-cache kernel. The cache skips
    the copy entirely when consecutive slabs reuse a parent window —
    the common case, since children are c-major and each char segment
    sweeps the parent range slowly — while this ring pays two copies
    per visit unconditionally. Kept as the measured A/B variant
    (PSI_COMPACT=flat)."""
    t = pl.program_id(0)
    nslabs_total = prefix.shape[0] - 1

    def slab_of(g):
        def step(_, lohi):
            lo, hi = lohi
            mid = (lo + hi + 1) // 2
            go = prefix[mid] <= g
            return (jnp.where(go, mid, lo), jnp.where(go, hi, mid - 1))

        bits = max((nslabs_total).bit_length(), 1)
        lo, _ = jax.lax.fori_loop(
            0, bits, step, (jnp.int32(0), jnp.int32(nslabs_total - 1))
        )
        return lo

    def start_visit(g):
        s = slab_of(g)
        w = pwlo_ref[s] + (g - prefix[s])
        slot = jax.lax.rem(g, RING)
        wt = w // SLABS
        ws = jax.lax.rem(w, SLABS)
        pltpu.make_async_copy(
            r4lo_ref.at[wt, ws], winlo.at[slot], semlo.at[slot]
        ).start()
        pltpu.make_async_copy(
            r4hi_ref.at[wt, ws], winhi.at[slot], semhi.at[slot]
        ).start()

    @pl.when(t == 0)
    def _():
        def scan_body(i, acc):
            prefix[i] = acc
            return acc + pnw_ref[i]

        total0 = jax.lax.fori_loop(
            0, nslabs_total, scan_body, jnp.int32(0)
        )
        prefix[nslabs_total] = total0

        def prologue(g, _):
            @pl.when(g < total0)
            def _():
                start_visit(g)

            return 0

        jax.lax.fori_loop(0, RING, prologue, 0)

    total = prefix[nslabs_total]
    for s in range(SLABS):
        pidx = parent_ref[0, s]              # (8, 128) parent slots
        cs = char_ref[0, s]
        lane_slab = t * SLABS + s
        slab_c = slabc_ref[lane_slab]
        base = pwlo_ref[lane_slab]
        gs = prefix[lane_slab]

        def visit(j, _):
            g = gs + j
            w = base + j
            slot = jax.lax.rem(g, RING)
            pltpu.make_async_copy(
                r4lo_ref.at[0, 0], winlo.at[slot], semlo.at[slot]
            ).wait()
            pltpu.make_async_copy(
                r4hi_ref.at[0, 0], winhi.at[slot], semhi.at[slot]
            ).wait()

            valid = (pidx // SLAB_Q) == w
            lp = jnp.clip(pidx - w * SLAB_Q, 0, SLAB_Q - 1)
            row = lp // WB
            lane = lp % WB

            @pl.when(slab_c > 0)
            def _():
                comp = slab_c - 1
                plo = jnp.zeros((QROWS, WB), jnp.int32)
                phi = jnp.zeros((QROWS, WB), jnp.int32)
                for r in range(QROWS):
                    hit = row == r
                    glo = jnp.take_along_axis(
                        jnp.broadcast_to(
                            winlo[slot, pl.ds(comp, 1), pl.ds(r, 1), :]
                            .reshape(1, WB),
                            (QROWS, WB),
                        ),
                        lane, axis=1,
                    )
                    ghi = jnp.take_along_axis(
                        jnp.broadcast_to(
                            winhi[slot, pl.ds(comp, 1), pl.ds(r, 1), :]
                            .reshape(1, WB),
                            (QROWS, WB),
                        ),
                        lane, axis=1,
                    )
                    plo = jnp.where(hit, glo, plo)
                    phi = jnp.where(hit, ghi, phi)
                cadd = C_ref[slab_c]
                outlo_ref[0, s] = jnp.where(
                    valid, cadd + plo, outlo_ref[0, s]
                )
                outhi_ref[0, s] = jnp.where(
                    valid, cadd + phi, outhi_ref[0, s]
                )

            @pl.when(slab_c == 0)
            def _():
                plo = jnp.zeros((QROWS, WB), jnp.int32)
                phi = jnp.zeros((QROWS, WB), jnp.int32)
                for comp in range(4):
                    sel_c = cs == (comp + 1)
                    for r in range(QROWS):
                        hit = sel_c & (row == r)
                        glo = jnp.take_along_axis(
                            jnp.broadcast_to(
                                winlo[slot, comp, pl.ds(r, 1), :],
                                (QROWS, WB),
                            ),
                            lane, axis=1,
                        )
                        ghi = jnp.take_along_axis(
                            jnp.broadcast_to(
                                winhi[slot, comp, pl.ds(r, 1), :],
                                (QROWS, WB),
                            ),
                            lane, axis=1,
                        )
                        plo = jnp.where(hit, glo, plo)
                        phi = jnp.where(hit, ghi, phi)
                cadd = jnp.zeros((QROWS, WB), jnp.int32)
                for c in range(1, 5):
                    cadd = cadd + jnp.where(cs == c, C_ref[c], 0)
                outlo_ref[0, s] = jnp.where(
                    valid, cadd + plo, outlo_ref[0, s]
                )
                outhi_ref[0, s] = jnp.where(
                    valid, cadd + phi, outhi_ref[0, s]
                )

            @pl.when(g + RING < total)
            def _():
                start_visit(g + RING)

            return 0

        outlo_ref[0, s] = jnp.zeros((QROWS, WB), jnp.int32)
        outhi_ref[0, s] = jnp.zeros((QROWS, WB), jnp.int32)
        jax.lax.fori_loop(0, pnw_ref[lane_slab], visit, 0)


def compact_children(
    r4lo: jax.Array, r4hi: jax.Array,
    parent_idx: jax.Array, char: jax.Array, C: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Assemble child ranges from rank4 outputs: parent_idx/char int32
    [M] (M multiple of QTILE), r4lo/r4hi [Tp, SLABS, 4, QROWS, WB].
    Returns (lo, hi) int32 [M] in child order."""
    import os

    M = parent_idx.shape[0]
    T = M // QTILE
    by_slab = parent_idx.reshape(-1, SLAB_Q) // SLAB_Q
    pwlo = jnp.min(by_slab, axis=1).astype(jnp.int32)
    pnw = (jnp.max(by_slab, axis=1) - pwlo + 1).astype(jnp.int32)
    # per-slab uniform char (0 = mixed): children are c-major, so at
    # most 3 slabs per level take the mixed path
    c_by_slab = char.reshape(-1, SLAB_Q)
    cmin = jnp.min(c_by_slab, axis=1)
    cmax = jnp.max(c_by_slab, axis=1)
    slab_c = jnp.where(cmin == cmax, cmin, 0).astype(jnp.int32)
    # Default = the per-slab window-CACHE kernel: the flat-ring rework
    # (PSI_COMPACT=flat) was built and REFUTED on v5e — 19.5 vs
    # 13.8 ms/batch in the rep-scan trie A/B — because the cache skips
    # the copy entirely when consecutive slabs reuse a parent window
    # (common: children are c-major), while the ring re-copies every
    # visit (docs/SCALING.md round 4).
    flat = os.environ.get("PSI_COMPACT", "slab") == "flat"
    blk = (1, SLABS, QROWS, WB)
    if flat:
        scratch = [
            pltpu.VMEM((RING, 4, QROWS, WB), jnp.int32),
            pltpu.VMEM((RING, 4, QROWS, WB), jnp.int32),
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SMEM((T * SLABS + 1,), jnp.int32),
        ]
        kernel = _compact_kernel_flat
    else:
        scratch = [
            pltpu.VMEM((4, QROWS, WB), jnp.int32),
            pltpu.VMEM((4, QROWS, WB), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
        kernel = _compact_kernel
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(blk, lambda t, a, b, c: (t, 0, 0, 0)),
            pl.BlockSpec(blk, lambda t, a, b, c: (t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, lambda t, a, b, c: (t, 0, 0, 0)),
            pl.BlockSpec(blk, lambda t, a, b, c: (t, 0, 0, 0)),
        ],
        scratch_shapes=scratch,
    )
    shape4 = (T, SLABS, QROWS, WB)
    lo4, hi4 = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(shape4, jnp.int32),
            jax.ShapeDtypeStruct(shape4, jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(pwlo, pnw, slab_c, parent_idx.reshape(shape4),
      char.reshape(shape4), r4lo, r4hi, C)
    return lo4.reshape(-1), hi4.reshape(-1)
