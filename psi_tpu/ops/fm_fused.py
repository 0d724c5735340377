"""Single-launch fused trie kernel: the whole level-extension search in
ONE Pallas call with the FM payload and the frontier VMEM-resident.

The round-4 rep-scan attribution (docs/SCALING.md) put the per-batch
cost at 11.8 ms with the child-compact pass ~11 ms of it — and the
dominant terms are STRUCTURAL, not compute: 18 kernel launches per
batch (2/level), a per-grid-step fixed cost over 1152 steps, per-window
DMA descriptor issue, and a 16 MB HBM round-trip of the rank4 output
between the rank and compact kernels. This kernel removes all four at
once for shapes that fit VMEM (~16 MB/core on v5e):

  * grid = (levels, tiles): TPU grid iteration is SEQUENTIAL, so level
    j+1 can read level j's full frontier — the lax.scan over levels
    moves INSIDE one kernel launch (1 launch per batch, not 18);
  * the frontier lives in a VMEM double buffer (level j reads parity
    j%2, writes j+1%2): the parent gather needs no DMA at all;
  * the payload is DMA'd once per launch into VMEM in a match-format
    layout (occ rows 0..3, match-mask words rows 4..7): a rank for a
    KNOWN char is 2 lane gathers + 1 popcount, vs rank4's
    7 gathers + 4 popcounts for ranks nobody asked for;
  * rank happens directly at the gathered parent positions, producing
    children in place — the compact pass (and its HBM round trip)
    does not exist.

Per level each child slot i needs new_lo[i] = C[c_i] + rank(c_i,
lo[parent_i]) (and same for hi): a parent gather from the resident
frontier, then a ranked lookup in the resident payload. Children are
c-major with ascending parents per char segment (ops/fm_trie.py), so
almost every 1024-child slab has one uniform char and a narrow parent
window — but correctness never relies on it (per-visit valid masks).

Replaces the hot LF loop of the reference (ref:
include/psi/fmindex.hpp:851-869) batched over the whole frontier.
Falls back to the windowed rank4+compact route (ops/fm_stream.py) when
payload or frontier exceed the VMEM budget.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psi_tpu.ops.fm_stream import (
    QROWS, WB, SBLOCK, SLAB_Q, StreamArrays,
)

#: child slabs per grid step (tile = FSLABS * 1024 children); larger
#: tiles amortize the per-step fixed cost at the price of block VMEM
FSLABS = int(os.environ.get("PSI_FSLABS", "8"))
FTILE = FSLABS * SLAB_Q

#: VMEM budget for payload + frontier residency (bytes). v5e has
#: ~16 MB/core; leave headroom for the grid blocks and double buffers.
FUSED_BUDGET = int(os.environ.get("PSI_FUSED_BUDGET", str(13 << 20)))

#: parent-gather windows unrolled statically per slab (clamped,
#: hit-masked); the dynamic remainder loop covers wider slabs
PUNROLL = int(os.environ.get("PSI_FUSED_PUNROLL", "6"))


def fused_bytes(nw: int, npad: int) -> int:
    """VMEM bytes the resident kernel needs: windowed payload +
    double-buffered (lo, hi) frontier."""
    return nw * 8 * WB * 4 + 2 * 2 * npad * 4


def fits(arrays: StreamArrays, npad: int) -> bool:
    if arrays.payloadW is None:
        return False
    return fused_bytes(arrays.payloadW.shape[0], npad) <= FUSED_BUDGET


def _fused_kernel(pwlo_ref, pnw_ref, slabc_ref,
                  parent_ref, char_ref,
                  lo0_ref, hi0_ref, payloadW_ref, C_ref,
                  outlo_ref, outhi_ref,
                  pvmem, fbuf, sem):
    # PSI_FUSED_CTL (trace-time env, DIAGNOSTIC ONLY — WRONG RESULTS):
    # "empty" writes constants (glue + grid floor); "noparent" skips
    # the frontier gather (ranks at clipped parent slot ids);
    # "norank" passes the gathered positions through (parent gather +
    # glue only). Never set in production.
    ctl = os.environ.get("PSI_FUSED_CTL", "")
    j = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when((j == 0) & (t == 0))
    def _():
        # one-time residency: payload + initial frontier (3 descriptors
        # per LAUNCH — the windowed route pays ~1 per window VISIT)
        cp = pltpu.make_async_copy(payloadW_ref, pvmem, sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(lo0_ref, fbuf.at[0, 0], sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(hi0_ref, fbuf.at[0, 1], sem)
        cp.start()
        cp.wait()

    rb = jax.lax.rem(j, 2)          # frontier read parity
    wb = jax.lax.rem(j + 1, 2)      # frontier write parity

    for s in range(FSLABS):
        lin = (j * T + t) * FSLABS + s
        pidx = parent_ref[0, 0, s]           # (8, 128) parent slots
        cs = char_ref[0, 0, s]
        slab_c = slabc_ref[lin]
        pbase = pwlo_ref[lin]
        fs = t * FSLABS + s                  # this slab's frontier slot

        zero = jnp.zeros((QROWS, WB), jnp.int32)

        if ctl == "empty":
            keep = (pidx[0, 0] + cs[0, 0]) * 0
            outlo_ref[0, s] = zero + keep
            outhi_ref[0, s] = zero + keep
            fbuf[wb, 0, fs] = zero + keep
            fbuf[wb, 1, fs] = zero + keep
            continue

        # gather lo[parent], hi[parent] from the resident frontier.
        # The needed ROW id (gprow) and LANE (glane) are window-
        # independent — computed once per slab; each (window, row) pass
        # is then 1 compare + 2 per-sublane gathers + 2 selects.
        gprow = pidx // WB          # absolute frontier row of parent
        glane = pidx % WB

        def ppass_body(w, plo, phi):
            for r in range(QROWS):
                row_id = w * QROWS + r
                hit = gprow == row_id
                glo = jnp.take_along_axis(
                    jnp.broadcast_to(
                        fbuf[rb, 0, w, pl.ds(r, 1), :], (QROWS, WB)
                    ),
                    glane, axis=1,
                )
                ghi = jnp.take_along_axis(
                    jnp.broadcast_to(
                        fbuf[rb, 1, w, pl.ds(r, 1), :], (QROWS, WB)
                    ),
                    glane, axis=1,
                )
                plo = jnp.where(hit, glo, plo)
                phi = jnp.where(hit, ghi, phi)
            return plo, phi

        if ctl == "noparent":
            plo = pidx  # slot ids as fake positions (< Npad <= n)
            phi = pidx
        else:
            # static unroll of the common window count (span/1024 is
            # ~5 at production child densities — the dynamic fori's
            # per-iteration overhead was the single largest term in the
            # round-5 attribution). The unrolled passes run
            # unconditionally with the window CLAMPED in-bounds: an
            # out-of-range pass gathers garbage that the hit mask
            # (gprow == row_id) never selects. The rare wider slab
            # finishes in a dynamic remainder loop (usually 0 trips).
            plo, phi = zero, zero
            nw_p = pnw_ref[lin]
            nslabs_f = fbuf.shape[2]
            for jj in range(PUNROLL):
                wc = jnp.minimum(pbase + jj, nslabs_f - 1)
                plo, phi = ppass_body(wc, plo, phi)

            def ppass(jj, carry):
                return ppass_body(pbase + jj, *carry)

            plo, phi = jax.lax.fori_loop(
                PUNROLL, nw_p, ppass, (plo, phi)
            )
        if ctl == "norank":
            outlo_ref[0, s] = plo
            outhi_ref[0, s] = phi
            fbuf[wb, 0, fs] = plo
            fbuf[wb, 1, fs] = phi
            continue

        blo = plo // SBLOCK
        bhi = phi // SBLOCK
        masklo = (1 << (plo % SBLOCK)) - 1
        maskhi = (1 << (phi % SBLOCK)) - 1

        def rank_tile(w, blkv, maskv, occ_row, match_row):
            # rank for ONE char at (8, 128) positions against resident
            # payload window w: 2 lane gathers + 1 masked popcount
            valid = (blkv // WB) == w
            lbl = jnp.clip(blkv - w * WB, 0, WB - 1)
            occ = jnp.take_along_axis(
                jnp.broadcast_to(
                    pvmem[w, pl.ds(occ_row, 1), :], (QROWS, WB)
                ),
                lbl, axis=1,
            )
            mw = jnp.take_along_axis(
                jnp.broadcast_to(
                    pvmem[w, pl.ds(match_row, 1), :], (QROWS, WB)
                ),
                lbl, axis=1,
            )
            return valid, occ + jax.lax.population_count(mw & maskv)

        def finish(nlo, nhi):
            outlo_ref[0, s] = nlo
            outhi_ref[0, s] = nhi
            fbuf[wb, 0, fs] = nlo
            fbuf[wb, 1, fs] = nhi

        @pl.when(slab_c > 0)
        def _():
            # uniform-char slab (the hot case: all but the char-
            # boundary slabs of a level). The slab lies inside ONE char
            # segment, where parents are strictly increasing and the
            # parent frontier is pattern-monotone — so the gathered
            # positions are non-decreasing and the window bounds are
            # just the slab's EDGE elements (two scalar reads, not
            # vector->scalar reductions). NOT true across segments:
            # the parent sequence restarts at each boundary, so mixed
            # slabs below reduce for real.
            comp = slab_c - 1
            wmin = jnp.minimum(blo[0, 0], bhi[0, 0]) // WB
            wmax = jnp.maximum(blo[QROWS - 1, WB - 1],
                               bhi[QROWS - 1, WB - 1]) // WB

            def rpass(jj, carry):
                rlo, rhi = carry
                w = wmin + jj
                vlo, rl = rank_tile(w, blo, masklo, comp, 4 + comp)
                vhi, rh = rank_tile(w, bhi, maskhi, comp, 4 + comp)
                return (
                    jnp.where(vlo, rl, rlo),
                    jnp.where(vhi, rh, rhi),
                )

            rlo, rhi = jax.lax.fori_loop(
                0, wmax - wmin + 1, rpass, (zero, zero)
            )
            cadd = C_ref[slab_c]
            finish(cadd + rlo, cadd + rhi)

        @pl.when(slab_c == 0)
        def _():
            # mixed-char boundary slab: positions are only per-segment
            # monotone, so bound windows by FULL min/max reductions
            wmin = jnp.minimum(jnp.min(blo), jnp.min(bhi)) // WB
            wmax = jnp.maximum(jnp.max(blo), jnp.max(bhi)) // WB

            def rpass(jj, carry):
                rlo, rhi = carry
                w = wmin + jj
                for comp in range(4):
                    sel = cs == (comp + 1)
                    vlo, rl = rank_tile(w, blo, masklo, comp, 4 + comp)
                    vhi, rh = rank_tile(w, bhi, maskhi, comp, 4 + comp)
                    rlo = jnp.where(sel & vlo, rl, rlo)
                    rhi = jnp.where(sel & vhi, rh, rhi)
                return rlo, rhi

            rlo, rhi = jax.lax.fori_loop(
                0, wmax - wmin + 1, rpass, (zero, zero)
            )
            cadd = jnp.zeros((QROWS, WB), jnp.int32)
            for c in range(1, 5):
                cadd = cadd + jnp.where(cs == c, C_ref[c], 0)
            finish(cadd + rlo, cadd + rhi)


@functools.partial(jax.jit, static_argnames=("interpret",))
def trie_fused(
    arrays: StreamArrays,
    parents: jax.Array,   # int32 [levels, Npad] child-order parent slots
    chars: jax.Array,     # int32 [levels, Npad] fed chars 1..4
    lo0: jax.Array,       # int32 [Npad] seeded frontier (pattern order)
    hi0: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Whole-trie level extension in one kernel launch. Returns the
    leaf (lo, hi) in pattern order (same contract as the scan route in
    ops/fm_trie._trie_device)."""
    levels, Npad = parents.shape
    if Npad % FTILE:
        raise ValueError(f"Npad {Npad} not a multiple of {FTILE}")
    T = Npad // FTILE
    nslabs = Npad // SLAB_Q

    pv = parents.reshape(levels * T * FSLABS, SLAB_Q)
    pwin = pv // SLAB_Q
    pwlo = jnp.min(pwin, axis=1).astype(jnp.int32)
    pnw = (jnp.max(pwin, axis=1) - pwlo + 1).astype(jnp.int32)
    cv = chars.reshape(levels * T * FSLABS, SLAB_Q)
    cmin = jnp.min(cv, axis=1)
    cmax = jnp.max(cv, axis=1)
    slab_c = jnp.where(cmin == cmax, cmin, 0).astype(jnp.int32)

    NW = arrays.payloadW.shape[0]
    blk5 = (1, 1, FSLABS, QROWS, WB)
    out_blk = (1, FSLABS, QROWS, WB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(levels, T),
        in_specs=[
            pl.BlockSpec(blk5, lambda j, t, *_: (j, t, 0, 0, 0)),
            pl.BlockSpec(blk5, lambda j, t, *_: (j, t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # lo0
            pl.BlockSpec(memory_space=pl.ANY),   # hi0
            pl.BlockSpec(memory_space=pl.ANY),   # payloadW
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(out_blk, lambda j, t, *_: (t, 0, 0, 0)),
            pl.BlockSpec(out_blk, lambda j, t, *_: (t, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((NW, 8, WB), jnp.int32),
            pltpu.VMEM((2, 2, nslabs, QROWS, WB), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    shape4 = (T, FSLABS, QROWS, WB)
    lo4, hi4 = pl.pallas_call(
        _fused_kernel,
        out_shape=[
            jax.ShapeDtypeStruct(shape4, jnp.int32),
            jax.ShapeDtypeStruct(shape4, jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=15 << 20,
        ),
    )(pwlo, pnw, slab_c,
      parents.reshape((levels, T, FSLABS, QROWS, WB)),
      chars.reshape((levels, T, FSLABS, QROWS, WB)),
      lo0.reshape((nslabs, QROWS, WB)),
      hi0.reshape((nslabs, QROWS, WB)),
      arrays.payloadW, arrays.C)
    return lo4.reshape(-1), hi4.reshape(-1)
