"""Device-side distance-index construction: interval-semiring path
doubling over the supernode DAG (the TPU-native counterpart of
DiVerG's SpGEMM build, the reference's only accelerator-capable build
stage; ref: include/psi/seed_finder.hpp:1193-1265, backend selection
CMakeLists.txt:20-22 — SURVEY §2.2 assigned this half to JAX sparse
kernels; the query half lives in ops/dindex_probe.py).

The host builders (native/psi_dindex.cpp, dindex.py Python mirror) walk
the DAG in reverse topological order — inherently sequential in DAG
depth, which at pan-genome scale is ~#bubbles. Here the same capped
interval sets are computed with NO topological sweep:

    R_1        = direct supernode edges with gap interval [0, 0]
    R_{2k}     = merge(R_k  ∪  R_k ⊗ R_k)
    (i: s->m, [a1,b1]) ⊗ (j: m->t, [a2,b2])
               = (s->t, [a1 + len(m) + a2,  b1 + len(m) + b2])

capped at dmax-1 (values above the cap can never become feasible again
— every extension adds positive length, so clip-and-drop is exact).
Any pair with a feasible gap <= cap is connected by a path of at most
cap+1 supernode hops, so ceil(log2(cap+1)) + 1 rounds reach the
fixpoint. Each round is three vector stages, all TPU-friendly:

  1. ragged JOIN via the scatter+cummax run-expansion (ops/fm_trie's
     _expand_slots), no per-row loops;
  2. one multi-key lax.sort of the candidate entries by (src, dst, lo);
  3. segmented interval MERGE: an exclusive segmented running max of hi
     (flag-style associative scan) marks interval starts; scatter
     min/max compacts merged runs in place.

Static capacities (entry slots E, join slots P) with overflow flags;
the wrapper retries at the next power of two. Exact parity with the
native reverse-topo DP is pinned in tests/test_dindex.py.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from psi_tpu.ops.fm_trie import _expand_slots


def _seg_run_max_excl(hi: jax.Array, is_start: jax.Array) -> jax.Array:
    """Exclusive segmented running max of `hi` over runs delimited by
    `is_start` (classic flag/value associative scan)."""

    def op(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, jnp.maximum(av, bv))

    _, m = jax.lax.associative_scan(op, (is_start, hi))
    m_prev = jnp.concatenate([jnp.full((1,), -2, hi.dtype), m[:-1]])
    return jnp.where(is_start, jnp.full_like(hi, -2), m_prev)


@functools.partial(jax.jit, static_argnames=("E", "P", "rounds", "S"))
def _doubling_device(
    src0, dst0,          # int32 [E] base edges (padded with src = S)
    sup_len,             # int32 [S]
    cap,                 # int32 scalar (dmax - 1)
    S: int, E: int, P: int, rounds: int,
):
    return _doubling_core(src0, dst0, sup_len, cap, S, E, P, rounds)


@functools.partial(jax.jit, static_argnames=("E", "P", "rounds", "S"))
def _doubling_device_batched(
    src0, dst0,          # int32 [C, E] per-component base edges
    sup_len,             # int32 [C, S]
    cap,                 # int32 scalar
    S: int, E: int, P: int, rounds: int,
):
    """All components of one size bucket in ONE dispatch: vmap lifts
    the per-component while_loop to a single batched loop (lanes that
    reach their fixpoint keep their state while stragglers iterate), so
    a build pays one tunnel round trip instead of one per component."""
    return jax.vmap(
        lambda a, b, c: _doubling_core(a, b, c, cap, S, E, P, rounds)
    )(src0, dst0, sup_len)


def _doubling_core(
    src0, dst0, sup_len, cap,
    S: int, E: int, P: int, rounds: int,
):
    BIG = jnp.int32(S)

    def merge(src, dst, lo, hi):
        """Sort by (src, dst, lo) and coalesce intervals per (src, dst)
        with integer-set semantics (adjacent intervals join)."""
        n = src.shape[0]
        src_s, dst_s, lo_s, hi_s = jax.lax.sort(
            (src, dst, lo, hi), num_keys=3, is_stable=True
        )
        valid = src_s < BIG
        prev_same = jnp.concatenate([
            jnp.zeros(1, jnp.bool_),
            (src_s[1:] == src_s[:-1]) & (dst_s[1:] == dst_s[:-1]),
        ])
        is_start = ~prev_same
        m_prev = _seg_run_max_excl(hi_s, is_start)
        new_run = (is_start | (lo_s > m_prev + 1)) & valid
        mid = jnp.cumsum(new_run.astype(jnp.int32)) - 1
        nnz = mid[-1] + 1
        idx = jnp.where(valid, mid, E)
        out_src = jnp.full(E, BIG, jnp.int32).at[idx].min(
            src_s, mode="drop")
        out_dst = jnp.zeros(E, jnp.int32).at[idx].max(dst_s, mode="drop")
        out_lo = jnp.full(E, jnp.int32(2**31 - 1)).at[idx].min(
            lo_s, mode="drop")
        out_hi = jnp.zeros(E, jnp.int32).at[idx].max(hi_s, mode="drop")
        out_lo = jnp.where(out_src < BIG, out_lo, 0)
        return out_src, out_dst, out_lo, out_hi, nnz

    src, dst, lo, hi, nnz = merge(
        src0, dst0, jnp.zeros(E, jnp.int32), jnp.zeros(E, jnp.int32)
    )

    def round_body(state):
        src, dst, lo, hi, nnz, over_e0, over_p0, rnd, _ = state
        valid = src < BIG
        # per-src row table over the CURRENT sorted entries
        row_start = jnp.searchsorted(src, jnp.arange(S, dtype=jnp.int32),
                                     side="left").astype(jnp.int32)
        row_end = jnp.searchsorted(src, jnp.arange(S, dtype=jnp.int32),
                                   side="right").astype(jnp.int32)
        # join width per LEFT entry i: #entries of row dst[i]
        dclip = jnp.clip(dst, 0, S - 1)
        cnt = jnp.where(valid, row_end[dclip] - row_start[dclip], 0)
        csum = jnp.cumsum(cnt)
        total = csum[-1]
        # int32 cumsum can wrap before the P check on adversarial row
        # fan-outs; a float32 sum is exact enough for a threshold test
        over_p = (total > P) | (
            jnp.sum(cnt.astype(jnp.float32)) > jnp.float32(P)
        )
        slot = _expand_slots(csum, cnt, P)          # left entry per pair
        slot_c = jnp.clip(slot, 0, E - 1)
        within = jnp.arange(P, dtype=jnp.int32) - (
            csum[slot_c] - cnt[slot_c]
        )
        live = jnp.arange(P, dtype=jnp.int32) < total
        m = dclip[slot_c]                           # middle supernode
        j = jnp.clip(row_start[m] + within, 0, E - 1)
        shift = sup_len[m]
        # don't trust slot/within past the live region
        p_src = jnp.where(live, src[slot_c], BIG)
        p_dst = dst[j]
        p_lo = lo[slot_c] + shift + lo[j]
        p_hi = jnp.minimum(hi[slot_c] + shift + hi[j], cap)
        keep = live & (p_lo <= cap)
        p_src = jnp.where(keep, p_src, BIG)
        cand_src = jnp.concatenate([src, p_src])
        cand_dst = jnp.concatenate([dst, jnp.where(keep, p_dst, 0)])
        cand_lo = jnp.concatenate([lo, jnp.where(keep, p_lo, 0)])
        cand_hi = jnp.concatenate([hi, jnp.where(keep, p_hi, 0)])
        # merge back into E slots (overflow if more runs than E)
        src2, dst2, lo2, hi2, nnz2 = _merge_wide(
            cand_src, cand_dst, cand_lo, cand_hi
        )
        over_e = over_e0 | (nnz2 > E)
        # fixpoint detection: rows are canonical (sorted, merged), so
        # convergence == byte equality; real DAG depths converge in
        # log2(max hops in the horizon) rounds, far under the bound
        changed = (
            (nnz2 != nnz)
            | jnp.any(src2 != src) | jnp.any(dst2 != dst)
            | jnp.any(lo2 != lo) | jnp.any(hi2 != hi)
        )
        return (src2, dst2, lo2, hi2, nnz2, over_e,
                over_p0 | over_p, rnd + 1, changed)

    def _merge_wide(src_c, dst_c, lo_c, hi_c):
        src_s, dst_s, lo_s, hi_s = jax.lax.sort(
            (src_c, dst_c, lo_c, hi_c), num_keys=3, is_stable=True
        )
        valid = src_s < BIG
        prev_same = jnp.concatenate([
            jnp.zeros(1, jnp.bool_),
            (src_s[1:] == src_s[:-1]) & (dst_s[1:] == dst_s[:-1]),
        ])
        is_start = ~prev_same
        m_prev = _seg_run_max_excl(hi_s, is_start)
        new_run = (is_start | (lo_s > m_prev + 1)) & valid
        mid = jnp.cumsum(new_run.astype(jnp.int32)) - 1
        nnz = mid[-1] + 1
        idx = jnp.where(valid & (mid < E), mid, E)
        out_src = jnp.full(E, BIG, jnp.int32).at[idx].min(
            src_s, mode="drop")
        out_dst = jnp.zeros(E, jnp.int32).at[idx].max(dst_s, mode="drop")
        out_lo = jnp.full(E, jnp.int32(2**31 - 1)).at[idx].min(
            lo_s, mode="drop")
        out_hi = jnp.zeros(E, jnp.int32).at[idx].max(hi_s, mode="drop")
        out_lo = jnp.where(out_src < BIG, out_lo, 0)
        return out_src, out_dst, out_lo, out_hi, nnz

    def cond(state):
        *_, over_e, over_p, rnd, changed = state
        return (~over_e) & (~over_p) & changed & (rnd < rounds)

    src, dst, lo, hi, nnz, over_e, over_p, _, _ = jax.lax.while_loop(
        cond, round_body,
        (src, dst, lo, hi, nnz, jnp.bool_(False), jnp.bool_(False),
         jnp.int32(0), jnp.bool_(True)),
    )
    return src, dst, lo, hi, nnz, over_e, over_p


def build_super_device(
    sup_len: np.ndarray,
    s_indptr: np.ndarray,
    s_indices: np.ndarray,
    dmax: int,
    e_hint: int = 0,
    p_hint: int = 0,
):
    """Device path-doubling build over the supernode DAG. Returns
    (src_indptr, dst, iv_lo, iv_hi) int64 CSR identical to
    native.dindex_super_build, or None when inputs don't fit int32.

    The caller guarantees a DAG (cyclic graphs take the BFS fallback
    upstream); the doubling itself would also terminate on cycles (the
    cap prunes), but parity is only defined for the DAG path."""
    S = int(len(sup_len))
    nedge = int(len(s_indices))
    if S == 0 or nedge == 0:
        return (np.zeros(S + 1, dtype=np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64), np.zeros(0, np.int64))
    if S >= 2**31 - 2 or dmax >= 2**30:
        return None
    cap = dmax - 1
    src_e = np.repeat(
        np.arange(S, dtype=np.int32), np.diff(s_indptr).astype(np.int64)
    )
    dst_e = s_indices.astype(np.int32)
    # rounds is a static arg: bucket it (the while_loop exits at the
    # fixpoint anyway, so a larger bound costs nothing) so different
    # dmax values reuse one compiled program — relay compiles of this
    # program run minutes (docs/SCALING.md round 5)
    rounds = max(int(cap + 1).bit_length() + 1, 15)
    E = max(64, 1 << (max(nedge * 4 - 1, 1)).bit_length(), e_hint)
    P = max(2 * E, p_hint)
    sup32 = jnp.asarray(np.asarray(sup_len, dtype=np.int32))
    while True:
        base_src = np.full(E, S, dtype=np.int32)
        base_dst = np.zeros(E, dtype=np.int32)
        base_src[:nedge] = src_e
        base_dst[:nedge] = dst_e
        src, dst, lo, hi, nnz, over_e, over_p = _doubling_device(
            jnp.asarray(base_src), jnp.asarray(base_dst), sup32,
            jnp.int32(cap), S, E, P, rounds,
        )
        oe, op = bool(np.asarray(over_e)), bool(np.asarray(over_p))
        if oe or op:
            if E >= 1 << 30 or P >= 1 << 31:
                return None
            if oe:
                E *= 2
                P = max(P, 2 * E)
            else:
                P *= 2
            continue
        n = int(np.asarray(nnz))
        src_h = np.asarray(src[:n]).astype(np.int64)
        dst_h = np.asarray(dst[:n]).astype(np.int64)
        lo_h = np.asarray(lo[:n]).astype(np.int64)
        hi_h = np.asarray(hi[:n]).astype(np.int64)
        indptr = np.zeros(S + 1, dtype=np.int64)
        np.add.at(indptr, src_h + 1, 1)
        np.cumsum(indptr, out=indptr)
        return indptr, dst_h, lo_h, hi_h


def _components(S: int, s_indptr: np.ndarray, s_indices: np.ndarray):
    """Weakly-connected component labels [S] by iterated neighborhood
    min (pointer doubling; ~log(S) vectorized rounds)."""
    labels = np.arange(S, dtype=np.int64)
    src = np.repeat(np.arange(S, dtype=np.int64),
                    np.diff(s_indptr).astype(np.int64))
    dst = s_indices.astype(np.int64)
    while True:
        new = labels.copy()
        np.minimum.at(new, dst, labels[src])
        np.minimum.at(new, src, labels[dst])
        new = new[new]  # pointer double
        if np.array_equal(new, labels):
            return labels
        labels = new


def build_super_device_per_component(
    sup_len: np.ndarray,
    s_indptr: np.ndarray,
    s_indices: np.ndarray,
    dmax: int,
    e_hint: int = 0,
    stats_only: bool = False,
):
    """Per-component device builds (the reference's PerComponent mode,
    ref: include/psi/seed_finder.hpp:1178-1235): each weakly-connected
    component of the supernode DAG builds independently with its ids
    remapped into a power-of-two size bucket — components in the same
    (S, E, P) bucket share one compiled program — and the rows stitch
    back into the global CSR. Bounds both device memory and the
    (remote) compiler's working set by the largest component, not the
    genome."""
    S = int(len(sup_len))
    if S == 0 or len(s_indices) == 0:
        return (np.zeros(S + 1, dtype=np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64), np.zeros(0, np.int64))
    labels = _components(S, s_indptr, s_indices)
    outdeg = np.diff(s_indptr).astype(np.int64)
    src_all = np.repeat(np.arange(S, dtype=np.int64), outdeg)
    order = np.argsort(labels, kind="stable")
    bounds = np.nonzero(np.concatenate(
        [[True], labels[order][1:] != labels[order][:-1]]
    ))[0]
    groups = np.split(order, bounds[1:])
    s_floor = int(os.environ.get("PSI_DINDEX_SFLOOR", str(1 << 18)))
    buckets: dict = {}
    for g in groups:
        g = np.sort(g)
        if len(g) == 1 and outdeg[g[0]] == 0:
            continue
        gid = np.full(S, -1, dtype=np.int64)
        gid[g] = np.arange(len(g))
        # S is a static arg: pad to a floor bucket so same-order
        # components share one compiled program
        S_b = max(64, 1 << (len(g) - 1).bit_length(), s_floor)
        em = gid[src_all] >= 0
        ge_src = gid[src_all[em]]
        ge_dst = gid[s_indices[em]]
        o2 = np.argsort(ge_src, kind="stable")
        g_sup = np.ones(S_b, dtype=np.int64)
        g_sup[: len(g)] = np.asarray(sup_len)[g]
        buckets.setdefault(S_b, []).append(
            (g, ge_src[o2], ge_dst[o2], g_sup)
        )
    # one BATCHED dispatch per size bucket: all its components run in a
    # single vmapped program (one tunnel round trip, lanes exit their
    # while_loop fixpoints independently). PSI_DINDEX_CBATCH caps the
    # vmap width per dispatch — compile-helper memory scales with
    # C x E, and chr-scale buckets (16 x 2^24 lanes) have OOM-killed
    # the remote compile; smaller groups trade round trips for a
    # bounded compiler working set.
    cbatch = int(os.environ.get("PSI_DINDEX_CBATCH", "0"))
    if cbatch > 0:
        split: dict = {}
        for S_b, comps in buckets.items():
            parts = [comps[i: i + cbatch]
                     for i in range(0, len(comps), cbatch)]
            for pi, part in enumerate(parts):
                split[(S_b, pi)] = part
        buckets = split
    all_src, all_dst, all_lo, all_hi = [], [], [], []
    nnz_total = 0
    cap = dmax - 1
    rounds = max(int(cap + 1).bit_length() + 1, 15)
    for bkey, comps in buckets.items():
        S_b = bkey[0] if isinstance(bkey, tuple) else bkey
        nedge_max = max(len(c[1]) for c in comps)
        E = max(64, 1 << (max(nedge_max * 4 - 1, 1)).bit_length(), e_hint)
        P = 2 * E
        while True:
            C = len(comps)
            bs = np.full((C, E), S_b, dtype=np.int32)
            bd = np.zeros((C, E), dtype=np.int32)
            sup_b = np.ones((C, S_b), dtype=np.int32)
            for ci, (g, es, ed, gs) in enumerate(comps):
                bs[ci, : len(es)] = es
                bd[ci, : len(ed)] = ed
                sup_b[ci] = gs
            # vmapped one-dispatch form by default; PSI_DINDEX_VMAP=0
            # runs the components of the group as C sequential
            # dispatches of the unbatched program — the vmapped
            # while_loop+sort program has OOM-killed the remote
            # compile helper at chr scale where the plain program
            # compiles fine (round-5 finding), and C dispatches of a
            # once-compiled program cost only round trips
            if os.environ.get("PSI_DINDEX_VMAP", "1") in ("", "0"):
                outs = [
                    _doubling_device(
                        jnp.asarray(bs[ci]), jnp.asarray(bd[ci]),
                        jnp.asarray(sup_b[ci]), jnp.int32(cap),
                        S_b, E, P, rounds,
                    )
                    for ci in range(C)
                ]
                (src_b, dst_b, lo_b, hi_b, nnz_b, oe, op) = (
                    jnp.stack([o[i] for o in outs])
                    for i in range(7)
                )
            else:
                (src_b, dst_b, lo_b, hi_b, nnz_b, oe, op) = (
                    _doubling_device_batched(
                        jnp.asarray(bs), jnp.asarray(bd),
                        jnp.asarray(sup_b),
                        jnp.int32(cap), S_b, E, P, rounds,
                    )
                )
            oe_h = bool(np.asarray(oe).any())
            op_h = bool(np.asarray(op).any())
            if oe_h or op_h:
                if E >= 1 << 30 or P >= 1 << 31:
                    return None
                if oe_h:
                    E *= 2
                    P = max(P, 2 * E)
                else:
                    P *= 2
                continue
            nnz_h = np.asarray(nnz_b)
            if stats_only:
                # device-time measurement mode: the tiny nnz fetch
                # forces the build's execution; the (gigabytes at
                # chr scale) row fetch is skipped so device compute
                # and link time are separable on tunneled chips
                nnz_total += int(nnz_h.sum())
                break
            src_h = np.asarray(src_b)
            dst_h = np.asarray(dst_b)
            lo_h = np.asarray(lo_b)
            hi_h = np.asarray(hi_b)
            for ci, (g, *_rest) in enumerate(comps):
                n_c = int(nnz_h[ci])
                if n_c:
                    all_src.append(g[src_h[ci, :n_c]])
                    all_dst.append(g[dst_h[ci, :n_c]])
                    all_lo.append(lo_h[ci, :n_c].astype(np.int64))
                    all_hi.append(hi_h[ci, :n_c].astype(np.int64))
            break
    if stats_only:
        return nnz_total
    if not all_src:
        return (np.zeros(S + 1, dtype=np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64), np.zeros(0, np.int64))
    srcs = np.concatenate(all_src)
    dst_c = np.concatenate(all_dst)
    lo_c = np.concatenate(all_lo)
    hi_c = np.concatenate(all_hi)
    # rows are (dst, lo)-sorted per source within each component and
    # sources are disjoint across components: one stable argsort by
    # source restores the global CSR order
    o3 = np.argsort(srcs, kind="stable")
    srcs, dst_c, lo_c, hi_c = srcs[o3], dst_c[o3], lo_c[o3], hi_c[o3]
    counts = np.bincount(srcs, minlength=S)
    indptr = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, dst_c, lo_c, hi_c
