"""Trie-batched FM backward search: level extension over the distinct-
prefix frontier, TPU-native.

The batched equivalent of the reference's dual-iterator
kmer_exact_matches (ref: include/psi/index_iter.hpp:808-852), which
enumerates k-mers lexicographically and reuses the longest common
prefix between consecutive k-mers. Here the whole frontier of distinct
fed-prefixes advances one level at a time:

  level j state: SA ranges of the distinct length-j fed-prefixes,
  ordered by PATTERN (reversed-prefix) value. Backward search PREPENDS
  the fed char, so a child's pattern value is

      r_child = r_parent + (c - 1) * 4**j

  and assembling children c-major keeps the frontier pattern-sorted BY
  CONSTRUCTION — which keeps every rank pass's positions monotone (the
  property the streaming rank kernel needs). Note this is NOT true of
  per-query scans: after one LF step a key-sorted batch is ordered by
  the reversed prefix, not the key (the bug that motivated this form).

Per level the device does:
  1. rank4: one streaming pass over the frontier's (sorted) lo array
     and one over hi, producing ranks for ALL FOUR symbols per
     position (same gathers as one rank; no per-query symbol select);
  2. compact: gather the surviving children (host-planned, strictly
     increasing parent slots within each c-block) and add C[c].

The child schedule (which (parent, c) pairs exist among the queried
k-mers) depends only on the key set, so it is precomputed on host with
vectorized NumPy and shipped as per-level index arrays; absent-in-text
children simply carry empty ranges forward.

Implemented with jnp building blocks here (correct everywhere, incl.
CPU); the rank4/compact Pallas kernels plug in via the `use_pallas`
flag once on TPU.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from psi_tpu.ops import fm_stream
from psi_tpu.ops.fm_stream import StreamArrays


class TrieSchedule(NamedTuple):
    """Host-precomputed per-level child schedules.

    Level j (1-based) has F_j distinct fed-prefixes in pattern order.
    parent[j][i] = slot of child i's parent in level j-1's frontier;
    char[j][i] = the fed char (1..4). Level 0 is the root [0, n).
    leaf_perm[i] = leaf slot of sorted-key i (key order -> pattern
    order of the full k-mers).
    """

    parents: Tuple[np.ndarray, ...]
    chars: Tuple[np.ndarray, ...]
    sizes: Tuple[int, ...]
    leaf_perm: np.ndarray
    k: int
    #: pattern-order prefix values of the frontier at `frontier_level`
    #: (ftab row indices); None when no frontier was requested
    frontier_rows: np.ndarray | None = None
    frontier_level: int = 0


def build_schedule(
    keys: np.ndarray, k: int, frontier_level: int = 0
) -> TrieSchedule:
    """keys: sorted distinct uint64 packed k-mers (c0 most significant,
    2-bit codes). Native pattern-order counting builder when available
    (sequential passes, cache-resident byte planes), else vectorized
    O(N log N)-per-level NumPy. `frontier_level` > 0 additionally
    returns that level's frontier prefix values (for ftab seeding)."""
    keys = np.asarray(keys, dtype=np.uint64)
    from psi_tpu import native

    nat = (
        native.trie_schedule(keys, k, frontier_level) if len(keys) else None
    )
    if nat is not None:
        parents, chars, leaf_perm, rows = nat
        return TrieSchedule(
            parents=parents,
            chars=chars,
            sizes=tuple(len(p) for p in parents),
            leaf_perm=leaf_perm.astype(np.int64),
            k=k,
            frontier_rows=rows,
            frontier_level=frontier_level if rows is not None else 0,
        )
    sched = _build_schedule_np(keys, k)
    if 0 < frontier_level < k:
        kpref, order = _frontier_at(keys, k, frontier_level)
        sched = sched._replace(
            frontier_rows=kpref[order].astype(np.int64),
            frontier_level=frontier_level,
        )
    return sched


def _build_schedule_np(keys: np.ndarray, k: int) -> TrieSchedule:
    """Pure-NumPy fallback (argsort per level)."""
    N = len(keys)
    parents: List[np.ndarray] = []
    chars: List[np.ndarray] = []
    sizes: List[int] = []
    # per level: distinct j-prefix values (key order) and their pattern
    # values r; frontier is ordered by r
    prev_kpref = np.zeros(1, dtype=np.uint64)   # level 0: root
    prev_order = np.zeros(1, dtype=np.int64)    # slots in r-order
    prev_r = np.zeros(1, dtype=np.uint64)
    for j in range(1, k + 1):
        kpref = keys >> np.uint64(2 * (k - j))
        # uniq of sorted values
        mask = np.empty(N, dtype=bool)
        mask[0] = True
        np.not_equal(kpref[1:], kpref[:-1], out=mask[1:])
        kpref = kpref[mask]
        F = len(kpref)
        pk = kpref >> np.uint64(2)
        c = (kpref & np.uint64(3)).astype(np.int32) + 1
        # parent slot: position of pk in prev frontier's r-order
        pos_in_keyorder = np.searchsorted(prev_kpref, pk)
        parent_slot = prev_order[pos_in_keyorder].astype(np.int64)
        r = prev_r[pos_in_keyorder] + (
            (c.astype(np.uint64) - np.uint64(1)) << np.uint64(2 * (j - 1))
        )
        order = np.argsort(r, kind="stable")
        inv = np.empty(F, dtype=np.int64)
        inv[order] = np.arange(F)
        parents.append(parent_slot[order].astype(np.int32))
        chars.append(c[order])
        sizes.append(F)
        prev_kpref = kpref
        prev_order = inv
        prev_r = r
    # leaf_perm: sorted-key i -> its slot in the last frontier
    leaf_perm = prev_order
    return TrieSchedule(
        parents=tuple(parents),
        chars=tuple(chars),
        sizes=tuple(sizes),
        leaf_perm=leaf_perm,
        k=k,
    )


def _pad_level(arr: np.ndarray, npad: int, fill) -> np.ndarray:
    out = np.full(npad, fill, dtype=arr.dtype)
    out[: len(arr)] = arr
    return out


#: fixed delta-wire exception width: one compiled shape per Npad (a
#: data-dependent width would trigger a fresh 1-10 min remote XLA
#: compile whenever a chunk's >255-gap count crossed a pow-2 boundary);
#: `prepare` falls back to the packed wire when a level exceeds it
DELTA_EXC_WIDTH = 64


def _delta_saturate(d: np.ndarray, sat: int = 255):
    """Split non-negative int64 deltas into a uint8 array plus (idx,
    val) corrections for entries > `sat` (val = true - sat). The
    non-negativity is the strictly-increasing-parents-per-segment
    invariant the whole delta wire depends on — a violation must fail
    loudly (a bare assert would vanish under python -O and turn a
    schedule-builder bug into silent wrong search results)."""
    if not (d >= 0).all():
        raise ValueError(
            "delta wire: parent deltas must be non-negative within "
            "each char segment (schedule invariant violated)"
        )
    big = np.nonzero(d > sat)[0].astype(np.int64)
    val = (d[big] - sat).astype(np.int64)
    return np.minimum(d, sat).astype(np.uint8), big, val


def _pad_exc(idx: np.ndarray, val: np.ndarray, npad: int,
             width: int = DELTA_EXC_WIDTH) -> np.ndarray:
    """Pack scatter corrections as int32 [2, E] at the FIXED width E
    (one compiled shape per Npad); padding rows use idx=npad, dropped
    by the device's mode="drop" scatter. Callers must pre-check
    len(idx) <= E (prepare falls back to the packed wire otherwise)."""
    E = width
    if len(idx) > E:
        raise ValueError(
            f"delta-wire exception count {len(idx)} exceeds fixed "
            f"width {E}"
        )
    out = np.full((2, E), npad, dtype=np.int32)
    out[0, : len(idx)] = idx
    out[1] = 0
    out[1, : len(val)] = val
    return out


def _expand_slots(csum: jax.Array, w: jax.Array, cap: int) -> jax.Array:
    """Run-expansion slot ids: out[j] = i such that j falls in slot i's
    width-w[i] run (== searchsorted(csum, arange(cap), "right") on the
    live region j < csum[-1]; values past the end may differ — callers
    mask by `live` and clip).

    Default = "scatter": scatter slot ids at run starts + one cummax —
    run starts are distinct for w>0 slots, so a max-scatter plus an
    associative max-scan replaces searchsorted's ~20 serialized gather
    passes. Measured on v5e (scripts/tpu_r4_misc.py, rep-loop in one
    jit, Npad=2^19 cap=2^20, equal outputs): scatter 50.3 ms vs search
    181.6 ms per expand — 3.6x. PSI_EXPAND=search restores the old
    path. Read at trace time (A/B via subprocess env)."""
    import os

    if os.environ.get("PSI_EXPAND", "scatter") == "search":
        occ = jnp.arange(cap, dtype=jnp.int32)
        return jnp.searchsorted(csum, occ, side="right").astype(jnp.int32)
    starts = csum - w
    slot_ids = jnp.arange(w.shape[0], dtype=jnp.int32)
    z = jnp.zeros(cap, jnp.int32).at[
        jnp.where(w > 0, starts, cap)
    ].max(slot_ids + 1, mode="drop")
    return jax.lax.associative_scan(jnp.maximum, z) - 1


@functools.partial(jax.jit, static_argnames=("k", "cap"))
def _expand_locate_device(
    sa: jax.Array,          # int32 [n] dense suffix array
    str_starts: jax.Array,  # int32 [m+1]
    lengths: jax.Array,     # int32 [m]
    seq_off: jax.Array,     # int32 [m+1]
    lo: jax.Array,          # int32 [Npad] pattern-order ranges (device-resident)
    hi: jax.Array,
    n_leaves: jax.Array,    # int32 scalar: real slots are [0, n_leaves)
    thr: jax.Array,         # int32 scalar gocc threshold
    k: int,
    cap: int,
):
    """Occurrence expansion + locate + global-position mapping, fully on
    device, chained onto the trie search's device-resident lo/hi (no
    lo/hi round-trip, no sa_idx upload — the transfer levers of the
    sustained pipeline). Emits one int32 global sequence position per
    occurrence, in (pattern slot, SA rank) order; the host joins
    occurrences back to seeds from the counts alone (the expansion
    order is deterministic), so gpos is the ONLY per-hit download
    (4 B/hit vs 2x4 B for (node, offset) columns; the node map is one
    host searchsorted)."""
    counts = hi - lo
    valid = jnp.arange(lo.shape[0], dtype=jnp.int32) < n_leaves
    w = jnp.where(valid & (counts > 0) & (counts <= thr), counts, 0)
    csum = jnp.cumsum(w)
    total = csum[-1]
    occ = jnp.arange(cap, dtype=jnp.int32)
    slot = _expand_slots(csum, w, cap)
    slot_c = jnp.clip(slot, 0, w.shape[0] - 1)
    within = occ - (csum[slot_c] - w[slot_c])
    live = occ < total
    sa_idx = jnp.clip(lo[slot_c] + within, 0, sa.shape[0] - 1)
    pos = sa[sa_idx]
    sid = jnp.searchsorted(str_starts, pos, side="right") - 1
    q = pos - str_starts[sid]
    gpos = seq_off[sid] + (lengths[sid] - q - k)
    return jnp.where(live, gpos, -1), total


@jax.jit
def _pack24(gpos: jax.Array) -> jax.Array:
    """Pack int32 global positions into three uint8 byte-planes (texts
    < 2^24 - 1 chars): the gpos download drops from 4 to 3 B/hit and
    the host slices the planes to the exact hit count."""
    return jnp.stack([
        (gpos & 255).astype(jnp.uint8),
        ((gpos >> 8) & 255).astype(jnp.uint8),
        ((gpos >> 16) & 255).astype(jnp.uint8),
    ])


def _unpack24(planes: np.ndarray) -> np.ndarray:
    b = planes.astype(np.int64)
    return b[0] | (b[1] << 8) | (b[2] << 16)


@jax.jit
def _chain_pack_small(counts, total, trav=None):
    """One-fetch head of the eager chain: counts saturated to uint16
    (two per int32 word; a saturation flag triggers the rare full
    refetch), the expansion total, and optionally the off-path
    traversal's packed result — so a chunk pays ONE fetch round trip
    for everything except the gpos stream (which the host then slices
    to the exact total)."""
    c16 = jnp.minimum(counts, 65535)
    w = c16[0::2] | (c16[1::2] << 16)
    over = (jnp.max(counts) > 65535).astype(jnp.int32)
    head = jnp.concatenate(
        [w, jnp.stack([over, total.astype(jnp.int32)])]
    )
    if trav is not None:
        head = jnp.concatenate([head, trav])
    return head


@functools.partial(jax.jit, static_argnames=("k", "cap", "use24"))
def _chain_tail(sa, str_starts, lengths, seq_off, lo, hi, counts,
                n_leaves, thr, k, cap, use24, trav=None):
    """Expansion + locate + 24-bit pack + small-head pack in ONE jit:
    the eager chain formerly dispatched these as three programs, and
    each dispatch is a ~16 ms round trip on a tunneled chip. Returns
    (packed_head, gpos_stream) — two device handles, fetched by the
    caller in its two round trips."""
    gpos, total = _expand_locate_device(
        sa, str_starts, lengths, seq_off, lo, hi, n_leaves, thr, k, cap
    )
    stream = _pack24(gpos) if use24 else gpos
    return _chain_pack_small(counts, total, trav), stream


def _decode_counts16(words: np.ndarray, npad: int) -> np.ndarray:
    w = words.view(np.uint32)
    out = np.empty(npad, dtype=np.int64)
    out[0::2] = w & 0xFFFF
    out[1::2] = w >> 16
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "use_pallas", "interpret", "packed", "with_counts", "masked",
        "delta_wire", "mask_derive", "fused", "delta_bits",
    ),
)
def _trie_device(
    arrays: StreamArrays,
    parents: jax.Array,   # int32 [levels, Npad]; packed: uint16 poff;
                          # masked: uint8 [levels, Npad//2] 4-bit masks
                          # delta_wire: uint8 [levels, Npad] gap deltas
    chars: jax.Array,     # int32 [levels, Npad]; packed: int32 charpk;
                          # masked: unused (pass parents again)
                          # delta_wire: int32 [levels, 8] dmeta
    use_pallas: bool = False,
    interpret: bool = False,
    lo0: jax.Array | None = None,   # optional ftab-seeded frontier
    hi0: jax.Array | None = None,
    pbase: jax.Array | None = None,  # packed: int32 [levels, Npad//PSLAB]
    packed: bool = False,
    with_counts: bool = False,  # also return hi - lo (counts-only fetch)
    masked: bool = False,       # mask wire format (in-device derive)
    ftab_tab: jax.Array | None = None,   # int32 [R, 2] device-resident ftab
    ftab_rows: jax.Array | None = None,  # int32 [Npad] frontier row ids
    delta_wire: bool = False,   # delta wire format (cumsum derive)
    dexc: jax.Array | None = None,       # int32 [levels, 2, E]
    row_delta: jax.Array | None = None,  # uint8 [Npad]
    row_exc: jax.Array | None = None,    # int32 [2, E2]
    mask_derive: str = "sort",  # mask wire select: "sort" | "search"
    fused: bool | None = None,  # single-launch fused route (None: env
                                # PSI_TRIE_FUSED at trace time)
    delta_bits: int = 8,        # 4 = nibble-packed delta wire
):
    n = arrays.n
    half = masked or (delta_wire and delta_bits == 4)
    Npad = parents.shape[1] * (2 if half else 1)
    if ftab_tab is not None and row_delta is not None:
        # delta wire: the ASCENDING frontier-row set is reconstructed
        # by one cumsum (row[0] arrives as the idx-0 correction), then
        # put in pattern order by sorting on the digit-reversed values
        rd = row_delta.astype(jnp.int32)
        rd = rd.at[row_exc[0]].add(row_exc[1], mode="drop")
        v = jnp.cumsum(rd)
        fp_lvl = (int(ftab_tab.shape[0]).bit_length() - 1) // 2
        r = jnp.zeros_like(v)
        x = v
        for _ in range(fp_lvl):
            r = (r << 2) | (x & 3)
            x = x >> 2
        _, rows = jax.lax.sort((r, v), num_keys=1, is_stable=True)
        lo0 = ftab_tab[rows, 0]
        hi0 = ftab_tab[rows, 1]
    elif ftab_tab is not None and ftab_rows is not None:
        # seed the frontier by an on-device ftab gather: uploads one
        # int32 row-id array instead of the two lo0/hi0 arrays
        lo0 = ftab_tab[ftab_rows, 0]
        hi0 = ftab_tab[ftab_rows, 1]
    if lo0 is None:
        lo0 = jnp.zeros(Npad, dtype=jnp.int32)
    if hi0 is None:
        hi0 = jnp.full(Npad, n, dtype=jnp.int32)

    def unpack(xs):
        if delta_wire:
            # delta wire format: parent[t] = first_parent[seg(t)] +
            # cumsum(d)[t] - cumsum(d)[seg_start(t)]; char = seg + 1.
            # No select/searchsorted — the whole derive is one cumsum,
            # one small scatter-add and three broadcast compares.
            dl, meta, ex = xs
            if delta_bits == 4:
                # two children per byte: low nibble = even slot
                d32 = dl.astype(jnp.int32)
                d = jnp.stack([d32 & 15, d32 >> 4], axis=-1).reshape(-1)
            else:
                d = dl.astype(jnp.int32)
            d = d.at[ex[0]].add(ex[1], mode="drop")
            cs = jnp.cumsum(d)
            t = jnp.arange(Npad, dtype=jnp.int32)
            seg = (
                (t >= meta[1]).astype(jnp.int32)
                + (t >= meta[2]).astype(jnp.int32)
                + (t >= meta[3]).astype(jnp.int32)
            )
            csat = cs[jnp.clip(meta[:4], 0, Npad - 1)]

            def pick(tab):
                x = jnp.where(seg == 0, tab[0], tab[1])
                x = jnp.where(seg == 2, tab[2], x)
                return jnp.where(seg == 3, tab[3], x)

            return pick(meta[4:8]) + cs - pick(csat), seg + 1
        if masked:
            # mask wire format: schedule derived in-device from 4-bit
            # parent masks (bit c-1 set = parent has a c-child). Child
            # layout is c-major over pattern-ordered parents — exactly
            # the host schedule's frontier order — and padding clamps
            # to the last real child, matching _pad_level.
            (mp,) = xs
            m32 = mp.astype(jnp.int32)
            nib = jnp.stack([m32 & 15, m32 >> 4], axis=1).reshape(-1)
            bits = (
                nib[None, :] >> jnp.arange(4, dtype=jnp.int32)[:, None]
            ) & 1
            bflat = bits.reshape(-1)
            t = jnp.arange(Npad, dtype=jnp.int32)
            if mask_derive == "sort":
                # select of set bits via ONE stable int32 sort: set-bit
                # positions keep their iota, clear bits are pushed past
                # 4*Npad, so the ascending sort's first `total` entries
                # ARE the set-bit positions in order (searchsorted's
                # ~21 serialized gather passes measured ~80 ms/level
                # on v5e; a single sort is the cheaper select)
                M4 = 4 * Npad
                key = jnp.arange(M4, dtype=jnp.int32) + (1 - bflat) * M4
                f_all = jax.lax.sort(key)[:Npad]
                total = jnp.sum(bflat)
                last = f_all[jnp.clip(total - 1, 0, Npad - 1)]
                f = jnp.where(t < total, f_all, last)
            else:
                cs = jnp.cumsum(bflat, dtype=jnp.int32)
                total = cs[-1]
                tq = jnp.minimum(t + 1, jnp.maximum(total, 1))
                f = jnp.searchsorted(cs, tq, side="left").astype(
                    jnp.int32
                )
            return f % Npad, f // Npad + 1
        if not packed:
            parent, c = xs
            return parent, c
        poff_l, pbase_l, charpk_l = xs
        parent = jnp.repeat(pbase_l, PSLAB) + poff_l.astype(jnp.int32)
        c = (
            (
                charpk_l[:, None]
                >> (2 * jnp.arange(16, dtype=jnp.int32))[None, :]
            )
            & 3
        ).reshape(-1) + 1
        return parent, c

    if delta_wire:
        xs = (parents, chars, dexc)   # (delta, dmeta, dexc)
    elif masked:
        xs = (parents,)
    elif packed:
        xs = (parents, pbase, chars)
    else:
        xs = (parents, chars)

    if use_pallas:
        # PSI_TRIE_CTL (trace-time env, DIAGNOSTIC ONLY — WRONG
        # RESULTS): "empty" skips both kernels (scan/slicing glue
        # floor), "norank" feeds compact constant rank tables (compact
        # + glue), "nocompact" drops the child gather (ranks + glue).
        # Never set in production; used by scripts/tpu_r4_kernels.py
        # to attribute the trie's non-kernel time.
        import os as _os_tctl

        tctl = _os_tctl.environ.get("PSI_TRIE_CTL", "")

        use_fused = fused
        if use_fused is None:
            use_fused = _os_tctl.environ.get(
                "PSI_TRIE_FUSED", "1"
            ) not in ("", "0")
        if not tctl and use_fused:
            # single-launch fused route: whole trie in ONE kernel with
            # payload + frontier VMEM-resident (ops/fm_fused.py); falls
            # through to the scan route when the shape doesn't fit
            from psi_tpu.ops import fm_fused

            if fm_fused.fits(arrays, Npad) and Npad % fm_fused.FTILE == 0:
                def derive(_, xs_j):
                    return None, unpack(xs_j)

                _, (par_all, ch_all) = jax.lax.scan(derive, None, xs)
                lo, hi = fm_fused.trie_fused(
                    arrays, par_all, ch_all, lo0, hi0,
                    interpret=interpret,
                )
                return (lo, hi, hi - lo) if with_counts else (lo, hi)

        def level(state, xs):
            # NOTE an interleaved single rank4 pass over
            # [lo0, hi0, lo1, hi1, ...] was tried and measured 4.5x
            # SLOWER on v5e than two separate passes (grid doubles and
            # compact windows halve in parent coverage); keep two.
            lo, hi = state
            parent, c = unpack(xs)
            if tctl == "empty":
                keep = (parent[0] + c[0]) * 0
                return (lo + keep, hi + keep), None
            if tctl == "norank":
                T = lo.shape[0] // fm_stream.QTILE
                shp = (T, fm_stream.SLABS, 4, fm_stream.QROWS,
                       fm_stream.WB)
                r4lo = jnp.zeros(shp, jnp.int32) + lo[0]
                r4hi = jnp.zeros(shp, jnp.int32) + hi[0]
            elif _os_tctl.environ.get(
                "PSI_RANK4_PAIR", "1"
            ) not in ("", "0"):
                # DEFAULT: one launch ranks BOTH frontier arrays (half
                # the kernel launches + shared window DMAs). Measured
                # on v5e rep-scan A/B: 11.8 vs 13.6 ms/batch against
                # two rank4_stream calls (43.7 M kmers/s,
                # docs/SCALING.md round 4); PSI_RANK4_PAIR=0 restores
                # the two-pass form
                r4lo, r4hi = fm_stream.rank4_pair_stream(
                    arrays, lo, hi, interpret=interpret
                )
            else:
                r4lo = fm_stream.rank4_stream(
                    arrays, lo, interpret=interpret
                )
                r4hi = fm_stream.rank4_stream(
                    arrays, hi, interpret=interpret
                )
            if tctl == "nocompact":
                new_lo = r4lo[:, :, 0].reshape(-1)
                new_hi = r4hi[:, :, 0].reshape(-1)
            else:
                new_lo, new_hi = fm_stream.compact_children(
                    r4lo, r4hi, parent, c, arrays.C, interpret=interpret
                )
            return (new_lo, new_hi), None

        if _os_tctl.environ.get("PSI_TRIE_UNROLL", "") not in ("", "0"):
            # unrolled levels (A/B vs lax.scan: no per-iteration xs
            # dynamic-slice / carry plumbing; trace-time env)
            state = (lo0, hi0)
            n_levels = jax.tree_util.tree_leaves(xs)[0].shape[0]
            for j in range(n_levels):
                xs_j = jax.tree_util.tree_map(lambda a: a[j], xs)
                state, _ = level(state, xs_j)
            lo, hi = state
        else:
            (lo, hi), _ = jax.lax.scan(level, (lo0, hi0), xs)
        return (lo, hi, hi - lo) if with_counts else (lo, hi)

    if True:
        # XLA fallback: dense gather-free form is not available here;
        # use the bit-plane payload directly (one gather per position)
        payload = arrays.payloadT

        def rank4(pos):
            blk = pos // fm_stream.SBLOCK
            cols = payload[:, blk]              # [16, Npad] gather
            base = cols[1:5]                    # occ rows 1..4
            maskw = (1 << (pos % fm_stream.SBLOCK)) - 1
            outs = []
            for c in range(1, 5):
                match = jnp.full(pos.shape, -1, dtype=jnp.int32)
                for p in range(3):
                    bit = (c >> p) & 1
                    pw = cols[6 + p]
                    match &= pw if bit else ~pw
                outs.append(
                    base[c - 1]
                    + jax.lax.population_count(match & maskw)
                )
            return jnp.stack(outs)              # [4, Npad]

    def level(state, xs):
        lo, hi = state
        parent, c = unpack(xs)
        r4lo = rank4(lo)
        r4hi = rank4(hi)
        # compact: child i <- (parent[i], c[i])
        cm1 = c - 1
        plo = jnp.take_along_axis(
            r4lo, parent[None, :], axis=1
        )  # [4, Npad] -> parent-gathered
        phi = jnp.take_along_axis(r4hi, parent[None, :], axis=1)
        new_lo = arrays.C[c] + jnp.take_along_axis(plo, cm1[None, :], axis=0)[0]
        new_hi = arrays.C[c] + jnp.take_along_axis(phi, cm1[None, :], axis=0)[0]
        return (new_lo, new_hi), None

    (lo, hi), _ = jax.lax.scan(level, (lo0, hi0), xs)
    return (lo, hi, hi - lo) if with_counts else (lo, hi)


def _frontier_at(keys: np.ndarray, k: int, p: int):
    """Level-p frontier of the key set: distinct p-prefixes and their
    pattern-order permutation (r = 2-bit digit reversal, matching
    build_schedule's r values)."""
    kpref = np.unique(keys >> np.uint64(2 * (k - p)))
    r = np.zeros(len(kpref), dtype=np.uint64)
    v = kpref.copy()
    for _ in range(p):
        r = (r << np.uint64(2)) | (v & np.uint64(3))
        v >>= np.uint64(2)
    order = np.argsort(r, kind="stable")
    return kpref, order


PSLAB = 1024  # parent-rebase slab (children per uint16-offset window)


def _mask_derive() -> str:
    """Mask-wire select strategy (static jit arg): one stable sort
    (default; measured cheaper than searchsorted's serialized gather
    passes on v5e) or the searchsorted form (PSI_MASK_DERIVE=search)."""
    import os

    return os.environ.get("PSI_MASK_DERIVE", "sort")


class PreparedTrie(NamedTuple):
    """Device-ready trie plan: padded per-level schedules (+ optional
    ftab-seeded frontier). Building this is the host-side critical-path
    cost of the on-path route, so `prepare` is designed to run on the
    producer thread, overlapped with device compute of the previous
    chunk (the dual-iterator prefix-reuse economics of the reference,
    ref: include/psi/index_iter.hpp:808-852, amortized off-path).

    Two wire formats (chosen by `prepare`; host->device upload is the
    sustained-throughput bottleneck on tunneled chips):
      * packed: chars as 2-bit codes 16/word (charpk) + parents as
        per-1024-slab rebased uint16 offsets over int32 slab bases
        (~4.4x smaller than int32 pairs); decodable with three vector
        ops on device;
      * plain: int32 parents/chars (fallback when some slab's parent
        span exceeds uint16 — only possible for extremely sparse child
        densities).

    NOTE the wire/variant env knobs (PSI_TRIE_WIRE, PSI_EXPAND,
    PSI_MASK_DERIVE, PSI_TRIE_PACK) are read at PREPARE/TRACE time:
    flipping one after the first in-process trace of a shape has no
    effect on that shape (A/B via subprocess env, as
    scripts/tpu_r3_kernels.py does)."""

    parents: jax.Array | None  # int32 [levels, Npad] (plain format)
    chars: jax.Array | None    # int32 [levels, Npad] (plain format)
    poff: jax.Array | None     # uint16 [levels, Npad] (packed format)
    pbase: jax.Array | None    # int32 [levels, Npad // PSLAB]
    charpk: jax.Array | None   # int32 [levels, Npad // 16]
    lo0: jax.Array | None      # ftab-seeded level-p frontier
    hi0: jax.Array | None
    leaf_perm: np.ndarray
    n: int
    #: mask wire format: uint8 [levels, Npad//2] 4-bit parent masks
    #: (~0.5 B/child vs 6 B packed / 8 B plain; the schedule is derived
    #: in-device — the smallest per-chunk upload for tunneled chips)
    mask: jax.Array | None = None
    #: on-device ftab seeding: int32 [Npad] frontier row ids (replaces
    #: the lo0/hi0 upload when the ftab table is device-resident)
    ftab_rows: jax.Array | None = None
    #: delta wire format: uint8 [levels, Npad] per-child parent-gap
    #: deltas. Children are c-major with STRICTLY INCREASING parents
    #: per char segment, so parent[t] = first_parent[seg] +
    #: cumsum(delta)[t] - cumsum(delta)[seg_start]; the in-device
    #: derive is ONE cumsum + three compares per level (no
    #: searchsorted/select — the cost that made the mask wire a net
    #: loss on v5e). 1 B/child vs 0.5 B mask, but derive ~2 ms/level
    #: instead of ~80 ms.
    delta: jax.Array | None = None
    #: int32 [levels, 8]: per level seg_starts[4] (child slot where
    #: char segment c begins; Npad when empty) + first_parent[4]
    dmeta: jax.Array | None = None
    #: int32 [levels, 2, E]: (idx, val) scatter-add corrections for
    #: deltas that saturated uint8 (val = true_delta - 255); idx=Npad
    #: padding is dropped by the device scatter
    dexc: jax.Array | None = None
    #: uint8 [Npad] ftab frontier-row gap deltas (rows are strictly
    #: increasing; row[0] arrives as the idx-0 exception)
    row_delta: jax.Array | None = None
    #: int32 [2, E2] row-delta corrections (incl. the absolute row[0])
    row_exc: jax.Array | None = None
    #: 4 = nibble-packed deltas (uint8 [levels, Npad//2], two children
    #: per byte, gaps saturate at 15 with dexc corrections; chosen
    #: adaptively when every level's >15-gap count fits the scaled
    #: exception width — halves the dominant schedule upload), 8 = the
    #: byte form above
    delta_bits: int = 8


def prepare(
    keys: np.ndarray,
    k: int,
    ftab: np.ndarray | None = None,
    npad: int | None = None,
    to_device: bool = True,
    pack: bool | None = None,
    wire: str | None = None,
) -> PreparedTrie:
    """Host precompute for `trie_search`: schedule build + padding +
    device transfer. Thread-safe; call from a producer thread.

    `npad` forces a minimum pad width (the sharded route needs one
    common width across shards); `to_device=False` keeps the arrays as
    NumPy for the caller to stack/place (sharded route); `pack`
    overrides the PSI_TRIE_PACK env choice; `wire` picks the wire
    format explicitly: "delta" ships uint8 parent-gap deltas (~1 B/
    child; in-device derive is ONE cumsum per level — the sustained-
    route default for tunneled chips), "mask" 4-bit parent masks
    (~0.5 B/child, but the derive needs a select — sort/searchsorted),
    "packed"/"plain" the materialized schedules."""
    import os

    if wire is None:
        wire = os.environ.get("PSI_TRIE_WIRE")
    if wire is None:
        # Default by LINK, not by device: the round-4 rep-scan A/B
        # (scripts/tpu_r4_reploop.py) measured the packed derive as
        # device-free (14.1 ms/batch vs plain 13.6 at 2^19 keys) while
        # the delta derive costs ~16 ms/batch of device time (29.8 ms)
        # — but on the TUNNELED axon platform the schedule upload is
        # the binding constraint (BENCH r4: packed wire pushed the
        # prepare leg to 1.4 s/chunk and sustained DOWN to 0.74 M
        # keys/s), so axon defaults to the 1 B/child delta wire and
        # everything else (CPU, direct-attached TPU) to packed.
        # NOTE jax.default_backend() reports the PLATFORM name, which
        # the axon PJRT plugin registers as plain "tpu" — the env var
        # is the reliable tunneled-link signal (round-5 finding: the
        # round-4 delta default never activated, and the bench paid
        # 13-46 MB/chunk of packed/plain schedule upload on a
        # ~35 MB/s link)
        tunneled = "axon" in os.environ.get("JAX_PLATFORMS", "") or (
            jax.default_backend() == "axon"
        )
        wire = "delta" if tunneled else "packed"
    p = 0
    if ftab is not None:
        p = (int(ftab.shape[0]).bit_length() - 1) // 2
        if not (0 < p < k):
            p = 0
    sched = build_schedule(keys, k, frontier_level=p)
    N = len(keys)
    # power-of-two tile-multiple padding: bounds the number of compiled
    # shapes across chunks of varying distinct-key counts
    Npad = max(fm_stream.QTILE, npad or 0)
    while Npad < N:
        Npad *= 2
    start = 0
    lo0 = hi0 = None
    put = jnp.asarray if to_device else np.asarray
    ftab_rows = None
    row_delta = row_exc = None
    if sched.frontier_level:
        start = p
        if wire == "mask":
            rows = sched.frontier_rows.astype(np.int32)
            ftab_rows = put(_pad_level(rows, Npad, int(rows[-1])))
        elif wire == "delta":
            # frontier rows arrive in PATTERN (digit-reversed) order;
            # deltas only work ascending, so ship the sorted row set
            # and recover the pattern permutation on device (digit
            # reverse + one sort). Padding = 4**p - 1: its reversed
            # digits are the maximum, so pads sort last and real rows
            # keep slots [0, n_frontier) (stable sort breaks the tie
            # with a real trailing all-T row in favor of the real one).
            rows = np.sort(sched.frontier_rows.astype(np.int64))
            rows_pad = _pad_level(rows, Npad, 4 ** p - 1)
            rd = np.zeros(Npad, dtype=np.int64)
            np.subtract(rows_pad[1:], rows_pad[:-1], out=rd[1:])
            d8, idx, val = _delta_saturate(rd)
            # absolute row[0] rides as the idx-0 exception
            idx = np.concatenate([[0], idx])
            val = np.concatenate([[int(rows_pad[0])], val])
            if len(idx) > DELTA_EXC_WIDTH:
                # too many saturated gaps for the fixed exception
                # width: the packed wire keeps one compiled shape
                return prepare(keys, k, ftab, npad=npad,
                               to_device=to_device, pack=pack,
                               wire="packed")
            row_delta = put(d8)
            row_exc = put(_pad_exc(idx, val, Npad))
        else:
            ranges = ftab[sched.frontier_rows]       # pattern order
            lo0 = put(_pad_level(
                ranges[:, 0].astype(np.int32), Npad, int(ranges[-1, 0])
            ))
            hi0 = put(_pad_level(
                ranges[:, 1].astype(np.int32), Npad, int(ranges[-1, 1])
            ))
    if wire in ("delta", "delta8"):
        levels = k - start
        dmeta = np.zeros((levels, 8), dtype=np.int32)
        dvals = []
        for jj in range(levels):
            p_arr = sched.parents[start + jj].astype(np.int64)
            c_arr = sched.chars[start + jj]
            p_pad = _pad_level(p_arr, Npad, max(int(p_arr[-1]), 0))
            c_pad = _pad_level(c_arr, Npad, int(c_arr[-1]))
            ss = np.searchsorted(c_pad, np.arange(1, 5, dtype=c_pad.dtype))
            d = np.zeros(Npad, dtype=np.int64)
            np.subtract(p_pad[1:], p_pad[:-1], out=d[1:])
            # parents increase strictly WITHIN a char segment; the
            # segment-boundary (possibly negative) deltas are zeroed
            # and the device restarts each segment at first_parent
            d[ss[ss < Npad]] = 0
            dvals.append(d)
            dmeta[jj, :4] = np.minimum(ss, Npad)
            dmeta[jj, 4:] = p_pad[np.minimum(ss, Npad - 1)]
        # 4-bit form when every level's >15-gap count fits the scaled
        # exception width (dense fills: ~1.4% of slots at the 2^19
        # sustained shape — halves the dominant per-chunk upload);
        # byte form otherwise (sparse fills where 4-bit exceptions
        # would dwarf the nibble savings). Width scales with Npad so
        # shards of one mesh plan agree by construction.
        E4 = max(DELTA_EXC_WIDTH, Npad // 64)
        bits = 4
        if wire == "delta8" or os.environ.get("PSI_DELTA_BITS") == "8":
            bits = 8
        else:
            for d in dvals:
                if int((d > 15).sum()) > E4:
                    bits = 8
                    break
        if bits == 4:
            delta = np.zeros((levels, Npad // 2), dtype=np.uint8)
            excs = []
            for jj, d in enumerate(dvals):
                d4, idx, val = _delta_saturate(d, sat=15)
                delta[jj] = d4[0::2] | (d4[1::2] << np.uint8(4))
                excs.append((idx, val))
            dexc = np.stack([_pad_exc(i, v, Npad, width=E4)
                             for i, v in excs])
        else:
            delta = np.zeros((levels, Npad), dtype=np.uint8)
            excs = []
            for jj, d in enumerate(dvals):
                d8, idx, val = _delta_saturate(d)
                delta[jj] = d8
                excs.append((idx, val))
            if max(len(i) for i, _ in excs) > DELTA_EXC_WIDTH:
                # a level's >255-gap count exceeds the fixed exception
                # width (extremely sparse child density): the packed
                # wire keeps one compiled shape instead of resizing
                return prepare(keys, k, ftab, npad=npad,
                               to_device=to_device, pack=pack,
                               wire="packed")
            dexc = np.stack([_pad_exc(i, v, Npad) for i, v in excs])
        return PreparedTrie(
            parents=None, chars=None, poff=None, pbase=None, charpk=None,
            lo0=lo0, hi0=hi0,
            leaf_perm=sched.leaf_perm, n=N,
            delta=put(delta), dmeta=put(dmeta), dexc=put(dexc),
            row_delta=row_delta, row_exc=row_exc, delta_bits=bits,
        )
    if wire == "mask":
        levels = k - start
        mask = np.zeros((levels, Npad), dtype=np.uint8)
        for jj in range(levels):
            p_arr = sched.parents[start + jj]
            c_arr = sched.chars[start + jj]
            np.bitwise_or.at(
                mask[jj], p_arr,
                (np.uint8(1) << (c_arr - 1).astype(np.uint8)),
            )
        mask_packed = mask[:, 0::2] | (mask[:, 1::2] << np.uint8(4))
        return PreparedTrie(
            parents=None, chars=None, poff=None, pbase=None, charpk=None,
            lo0=lo0, hi0=hi0,
            leaf_perm=sched.leaf_perm, n=N,
            mask=put(mask_packed), ftab_rows=ftab_rows,
        )
    parents = np.stack(
        [_pad_level(q, Npad, max(int(q[-1]), 0))
         for q in sched.parents[start:]]
    )
    chars = np.stack(
        [_pad_level(c, Npad, int(c[-1])) for c in sched.chars[start:]]
    )

    # packed wire format (4.4x less upload): per-slab parent rebase +
    # 2-bit char codes, unless some slab spans > uint16 parents
    import os

    if pack is None:
        pack = os.environ.get("PSI_TRIE_PACK", "1") not in ("", "0")
    if pack:
        levels = parents.shape[0]
        pslab = parents.reshape(levels, Npad // PSLAB, PSLAB)
        pbase = pslab.min(axis=2)
        off = pslab - pbase[:, :, None]
        if off.max(initial=0) <= np.iinfo(np.uint16).max:
            cpk = (chars - 1).reshape(levels, Npad // 16, 16)
            shifts = (2 * np.arange(16, dtype=np.int64))[None, None, :]
            charpk = (
                (cpk.astype(np.int64) << shifts).sum(axis=2).astype(np.uint32)
            ).view(np.int32)
            return PreparedTrie(
                parents=None,
                chars=None,
                poff=put(off.reshape(levels, Npad).astype(np.uint16)),
                pbase=put(pbase.astype(np.int32)),
                charpk=put(charpk),
                lo0=lo0,
                hi0=hi0,
                leaf_perm=sched.leaf_perm,
                n=N,
            )
    return PreparedTrie(
        parents=put(parents),
        chars=put(chars),
        poff=None,
        pbase=None,
        charpk=None,
        lo0=lo0,
        hi0=hi0,
        leaf_perm=sched.leaf_perm,
        n=N,
    )


def trie_search(
    arrays: StreamArrays,
    keys: np.ndarray,
    k: int,
    use_pallas: bool = False,
    interpret: bool = False,
    ftab: np.ndarray | None = None,
    prepared: PreparedTrie | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """SA ranges for sorted distinct packed keys, via frontier level
    extension. Returns (lo, hi) int32 [N] in key order (empty ranges
    have lo == hi at an unspecified value).

    With `ftab` (int32 [4**p, 2] from fm.build_ftab), the level-p
    frontier is seeded by a host table lookup and the device runs only
    levels p+1..k. Pass `prepared` (from `prepare`) to skip the host
    schedule build entirely."""
    if prepared is None:
        prepared = prepare(keys, k, ftab)
    import os

    masked = prepared.mask is not None
    delta_wire = prepared.delta is not None
    packed = prepared.poff is not None
    fused = os.environ.get("PSI_TRIE_FUSED", "1") not in ("", "0")
    ftab_tab = None
    if (masked and prepared.ftab_rows is not None) or (
        delta_wire and prepared.row_delta is not None
    ):
        ftab_tab = jnp.asarray(np.asarray(ftab, dtype=np.int32))
    sched_arr = (
        prepared.delta if delta_wire
        else prepared.mask if masked
        else prepared.poff if packed else prepared.parents
    )
    chars_arr = (
        prepared.dmeta if delta_wire
        else prepared.mask if masked
        else prepared.charpk if packed else prepared.chars
    )
    lo, hi = _trie_device(
        arrays,
        sched_arr,
        chars_arr,
        use_pallas=use_pallas,
        interpret=interpret,
        lo0=prepared.lo0,
        hi0=prepared.hi0,
        pbase=prepared.pbase,
        packed=packed,
        masked=masked,
        ftab_tab=ftab_tab,
        ftab_rows=prepared.ftab_rows,
        delta_wire=delta_wire,
        dexc=prepared.dexc,
        row_delta=prepared.row_delta,
        row_exc=prepared.row_exc,
        mask_derive=_mask_derive(),
        fused=fused,
        delta_bits=getattr(prepared, "delta_bits", 8),
    )
    lo = np.asarray(lo)[prepared.leaf_perm]
    hi = np.asarray(hi)[prepared.leaf_perm]
    return lo, hi
