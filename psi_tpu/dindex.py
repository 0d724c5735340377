"""Distance index: base-pair-resolution reachability within [dmin, dmax].

TPU-native re-design of the DiVerG distance index (usage per ref:
include/psi/seed_finder.hpp:1193-1317; dindexctl tool semantics): the
reference materialises a boolean CSR matrix over *char-order* coordinates
(range-compressed rows) by boolean matrix powering. Equivalent compressed
form used here: for every ordered node pair (v, u) reachable within the
horizon, the set S(v, u) of feasible *node-hop distances*

    D0 = 1 + sum(len(w) for intermediate nodes w on a v->u walk)

kept as sorted disjoint intervals, capped at dmax. A locus pair then
verifies as

    exists s in S(v, u):  dmin <= (len(v) - 1 - o) + s + p <= dmax

which reproduces the reference's boolean probe
distance_mat(charorder(v)+o, charorder(u)+p) exactly, while compressing
the char-level matrix by len(v)*len(u) per pair. Queries are batched
(vectorized interval probes); per-component construction bounds peak
memory by the largest component (ref: seed_finder.hpp:1178-1235).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from psi_tpu.graph import Graph


def _merge_intervals(ivs: List[Tuple[int, int]]) -> List[Tuple[int, int]]:
    if not ivs:
        return []
    ivs = sorted(ivs)
    out = [ivs[0]]
    for a, b in ivs[1:]:
        if a <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


class DistanceIndex:
    """Interval-compressed pairwise distance sets with batched probes."""

    def __init__(self, dmin: int, dmax: int):
        self.dmin = dmin
        self.dmax = dmax
        # CSR-ish storage: for each source node v (1-based), arrays of
        # (u, lo, hi) rows; built via finalize().
        self.src_indptr: np.ndarray = np.zeros(1, dtype=np.int64)
        self.dst: np.ndarray = np.zeros(0, dtype=np.int64)
        self.iv_lo: np.ndarray = np.zeros(0, dtype=np.int64)
        self.iv_hi: np.ndarray = np.zeros(0, dtype=np.int64)
        self.n_nodes = 0

    @property
    def empty(self) -> bool:
        return self.n_nodes == 0

    # --- construction -------------------------------------------------------
    @staticmethod
    def build(
        graph: Graph, dmin: int, dmax: int, per_component: bool = True
    ) -> "DistanceIndex":
        """Bounded-horizon interval DP, per component
        (NOTE mirrors ref: graph assumed sorted with disjoint per-component
        rank ranges, one reference path per component). Uses the native
        OpenMP builder (native/psi_dindex.cpp) when available."""
        idx = DistanceIndex(dmin, dmax)
        if dmin == 0 or (dmax != 0 and dmax < dmin):
            return idx  # not constructible (ref: seed_finder.hpp:1198)
        if dmax == 0:
            dmax = dmin
        idx.dmax = dmax
        n = graph.node_count
        idx.n_nodes = n

        from psi_tpu import native

        node_len_arr = np.diff(graph.label_offsets)
        res = native.dindex_build(
            node_len_arr, graph.out_indptr, graph.out_indices, dmax
        )
        if res is not None:
            idx.src_indptr, idx.dst, idx.iv_lo, idx.iv_hi = res
            return idx
        return DistanceIndex._build_py(idx, graph, dmax, per_component)

    @staticmethod
    def _build_py(
        idx: "DistanceIndex", graph: Graph, dmax: int, per_component: bool
    ) -> "DistanceIndex":
        n = graph.node_count
        ranges = (
            graph.component_ranges() if per_component and graph.get_path_count()
            else [(1, n + 1)]
        )
        node_len = np.diff(graph.label_offsets)

        rows: Dict[int, Dict[int, List[Tuple[int, int]]]] = {}
        for lo_r, hi_r in ranges:
            for v in range(lo_r, hi_r):
                # BFS from v accumulating feasible-D0 intervals per target
                dist: Dict[int, List[Tuple[int, int]]] = {}
                # frontier: (node u, interval of D0 values reaching u's start)
                frontier: List[Tuple[int, Tuple[int, int]]] = [
                    (int(u), (1, 1)) for u in graph.out_neighbors(v)
                ]
                while frontier:
                    nxt: Dict[int, List[Tuple[int, int]]] = {}
                    for u, (a, b) in frontier:
                        if a > dmax:
                            continue
                        b = min(b, dmax)
                        cur = dist.setdefault(u, [])
                        merged = _merge_intervals(cur + [(a, b)])
                        if merged == cur:
                            continue  # no growth -> don't re-expand
                        dist[u] = merged
                        ulen = int(node_len[u - 1])
                        for w in graph.out_neighbors(u):
                            na, nb = a + ulen, b + ulen
                            if na <= dmax:
                                nxt.setdefault(int(w), []).append((na, nb))
                    frontier = [
                        (u, iv) for u, ivs in nxt.items()
                        for iv in _merge_intervals(ivs)
                    ]
                if dist:
                    rows[v] = dist

        # finalize to CSR arrays
        indptr = [0]
        dst, lo_l, hi_l = [], [], []
        for v in range(1, n + 1):
            for u in sorted(rows.get(v, {})):
                for a, b in rows[v][u]:
                    dst.append(u)
                    lo_l.append(a)
                    hi_l.append(b)
            indptr.append(len(dst))
        idx.src_indptr = np.asarray(indptr, dtype=np.int64)
        idx.dst = np.asarray(dst, dtype=np.int64)
        idx.iv_lo = np.asarray(lo_l, dtype=np.int64)
        idx.iv_hi = np.asarray(hi_l, dtype=np.int64)
        return idx

    # --- queries ------------------------------------------------------------
    def verify(self, graph: Graph, v: int, o: int, u: int, p: int) -> bool:
        """Single-pair verification (ref: seed_finder.hpp:1300-1317)."""
        if v == u:  # intra-node arithmetic
            if o > p:
                return False
            return self.dmin <= (p - o) <= self.dmax
        if self.empty:
            return False
        a = (graph.node_length(v) - 1 - o) + p
        s_lo, s_hi = self.dmin - a, self.dmax - a
        if s_hi < 1:
            return False
        r0, r1 = self.src_indptr[v - 1], self.src_indptr[v]
        for i in range(r0, r1):
            if self.dst[i] == u and self.iv_lo[i] <= s_hi and self.iv_hi[i] >= s_lo:
                return True
        return False

    def _pair_keys(self) -> np.ndarray:
        """Globally sorted (source, dst) row keys: sources are grouped
        ascending by construction and dst is sorted within each source
        segment (both builders), so v*(n+2)+dst is globally sorted —
        one searchsorted localizes any (v, u) pair's interval rows."""
        if getattr(self, "_pk", None) is None or len(self._pk) != len(self.dst):
            src = np.repeat(
                np.arange(len(self.src_indptr) - 1, dtype=np.int64) + 1,
                np.diff(self.src_indptr),
            )
            self._pk = src * np.int64(self.n_nodes + 2) + self.dst
            self._pk_maxmult = (
                int(np.bincount(
                    np.unique(self._pk, return_inverse=True)[1]
                ).max()) if len(self._pk) else 0
            )
        return self._pk

    def verify_batch(
        self, graph: Graph, v: np.ndarray, o: np.ndarray,
        u: np.ndarray, p: np.ndarray,
    ) -> np.ndarray:
        """Vectorized pair verification for large batches (alice-dstats
        style pair checking, ref: tools/src/alice.cpp:599-737): one
        searchsorted over the sorted (source, dst) keys per batch, then
        a fixed small number of masked interval probes (max interval
        multiplicity per pair), no per-row Python."""
        v = np.asarray(v, dtype=np.int64)
        o = np.asarray(o, dtype=np.int64)
        u = np.asarray(u, dtype=np.int64)
        p = np.asarray(p, dtype=np.int64)
        out = np.zeros(len(v), dtype=bool)
        same = v == u
        d = p - o
        out[same] = (o[same] <= p[same]) & (self.dmin <= d[same]) & (d[same] <= self.dmax)
        if self.empty:
            return out
        node_len = np.diff(graph.label_offsets)
        rest = np.nonzero(~same)[0]
        if len(rest) == 0:
            return out
        a = (node_len[v[rest] - 1] - 1 - o[rest]) + p[rest]
        s_lo = self.dmin - a
        s_hi = self.dmax - a
        pk = self._pair_keys()
        q = v[rest] * np.int64(self.n_nodes + 2) + u[rest]
        row0 = np.searchsorted(pk, q, side="left")
        row1 = np.searchsorted(pk, q, side="right")
        hit = np.zeros(len(rest), dtype=bool)
        ok_q = s_hi >= 1
        for t in range(self._pk_maxmult):
            r = row0 + t
            live = ok_q & (r < row1)
            rc = np.minimum(r, len(self.dst) - 1)
            hit |= live & (self.iv_lo[rc] <= s_hi) & (self.iv_hi[rc] >= s_lo)
        out[rest] = hit
        return out

    # --- serialization ------------------------------------------------------
    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            dmin=np.int64(self.dmin),
            dmax=np.int64(self.dmax),
            n_nodes=np.int64(self.n_nodes),
            src_indptr=self.src_indptr,
            dst=self.dst,
            iv_lo=self.iv_lo,
            iv_hi=self.iv_hi,
        )

    @staticmethod
    def load(path: str) -> "DistanceIndex":
        z = np.load(path)
        idx = DistanceIndex(int(z["dmin"]), int(z["dmax"]))
        idx.n_nodes = int(z["n_nodes"])
        idx.src_indptr = z["src_indptr"]
        idx.dst = z["dst"]
        idx.iv_lo = z["iv_lo"]
        idx.iv_hi = z["iv_hi"]
        return idx

    # --- stats (dindexctl parity) ------------------------------------------
    def stats(self) -> dict:
        return {
            "dmin": self.dmin,
            "dmax": self.dmax,
            "n_nodes": self.n_nodes,
            "n_rows": int(len(self.src_indptr) - 1),
            "n_intervals": int(len(self.dst)),
        }

    def merge(self, other: "DistanceIndex") -> "DistanceIndex":
        """Merge two indexes over different (dmin, dmax) ranges
        (dindexctl merge parity, ref: tools/src/dindexctl.cpp:115-216).
        Valid when the union of [dmin, dmax] ranges is contiguous."""
        lo = min(self.dmin, other.dmin)
        hi = max(self.dmax, other.dmax)
        merged = DistanceIndex(lo, hi)
        merged.n_nodes = max(self.n_nodes, other.n_nodes)
        rows: Dict[int, Dict[int, List[Tuple[int, int]]]] = {}
        for src in (self, other):
            for v in range(1, merged.n_nodes + 1):
                if v >= len(src.src_indptr):
                    continue
                r0, r1 = src.src_indptr[v - 1], src.src_indptr[v]
                for i in range(r0, r1):
                    rows.setdefault(v, {}).setdefault(
                        int(src.dst[i]), []
                    ).append((int(src.iv_lo[i]), int(src.iv_hi[i])))
        indptr = [0]
        dst, lo_l, hi_l = [], [], []
        for v in range(1, merged.n_nodes + 1):
            for u in sorted(rows.get(v, {})):
                for a, b in _merge_intervals(rows[v][u]):
                    dst.append(u)
                    lo_l.append(a)
                    hi_l.append(b)
            indptr.append(len(dst))
        merged.src_indptr = np.asarray(indptr, dtype=np.int64)
        merged.dst = np.asarray(dst, dtype=np.int64)
        merged.iv_lo = np.asarray(lo_l, dtype=np.int64)
        merged.iv_hi = np.asarray(hi_l, dtype=np.int64)
        return merged
