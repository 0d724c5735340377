"""alice — ALignment InspeCtor and analysEr over GAF alignments
(functional parity with ref: tools/src/alice.cpp: embedded GAF parser,
`dstats` pair-distance verification via the distance index, `analyse`
precision/recall vs a ground-truth GAF)."""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

@dataclass
class GAFRecord:
    """One GAF line (oriented-path parsing per ref: alice.cpp:181-444)."""

    qname: str = ""
    qlen: int = 0
    qstart: int = 0
    qend: int = 0
    strand: str = "+"
    path: List[Tuple[int, bool]] = field(default_factory=list)  # (node, rev)
    plen: int = 0
    pstart: int = 0
    pend: int = 0
    matches: int = 0
    alnlen: int = 0
    mapq: int = 0

    @property
    def identity(self) -> float:
        return self.matches / self.alnlen if self.alnlen else 0.0


def parse_gaf_path(s: str) -> List[Tuple[int, bool]]:
    out = []
    i = 0
    while i < len(s):
        orient = s[i]
        if orient not in "><":
            raise ValueError(f"bad GAF path segment: {s!r}")
        j = i + 1
        while j < len(s) and s[j] not in "><":
            j += 1
        out.append((int(s[i + 1: j]), orient == "<"))
        i = j
    return out


def parse_gaf_line(line: str) -> Optional[GAFRecord]:
    f = line.rstrip("\n").split("\t")
    if len(f) < 12:
        return None
    rec = GAFRecord(
        qname=f[0],
        qlen=int(f[1]) if f[1] != "*" else 0,
        qstart=int(f[2]) if f[2] != "*" else 0,
        qend=int(f[3]) if f[3] != "*" else 0,
        strand=f[4],
        path=parse_gaf_path(f[5]) if f[5] not in ("*", "") else [],
        plen=int(f[6]) if f[6] != "*" else 0,
        pstart=int(f[7]) if f[7] != "*" else 0,
        pend=int(f[8]) if f[8] != "*" else 0,
        matches=int(f[9]) if f[9] != "*" else 0,
        alnlen=int(f[10]) if f[10] != "*" else 0,
        mapq=int(f[11]) if f[11] != "*" else 0,
    )
    return rec


def read_gaf(path: str) -> List[GAFRecord]:
    out = []
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            rec = parse_gaf_line(line)
            if rec is not None:
                out.append(rec)
    return out


def _end_locus(graph, rec: GAFRecord) -> Optional[Tuple[int, int]]:
    """(node, offset) of the alignment's last base."""
    if not rec.path:
        return None
    pos = rec.pend - 1
    for nid, rev in rec.path:
        internal = graph.id_by_coordinate(nid)
        ln = graph.node_length(internal)
        if pos < ln:
            return internal, pos
        pos -= ln
    return None


def _start_locus(graph, rec: GAFRecord) -> Optional[Tuple[int, int]]:
    if not rec.path:
        return None
    pos = rec.pstart
    for nid, rev in rec.path:
        internal = graph.id_by_coordinate(nid)
        ln = graph.node_length(internal)
        if pos < ln:
            return internal, pos
        pos -= ln
    return None


def cmd_dstats(args) -> int:
    from psi_tpu.dindex import DistanceIndex
    from psi_tpu.io import load_graph

    graph = load_graph(args.graph)
    idx = DistanceIndex.load(args.dindex)
    recs = read_gaf(args.gaf)

    # pair up by query name (strip /1 /2 suffixes)
    by_name = {}
    for r in recs:
        base = r.qname.rstrip("12").rstrip("/")
        by_name.setdefault(base, []).append(r)

    n_pairs = accept = reject = skipped = 0
    for base, group in by_name.items():
        if len(group) < 2:
            skipped += 1
            continue
        a, b = group[0], group[1]
        ea = _end_locus(graph, a)
        sb = _start_locus(graph, b)
        if ea is None or sb is None:
            skipped += 1
            continue
        n_pairs += 1
        if idx.verify(graph, ea[0], ea[1], sb[0], sb[1]):
            accept += 1
        else:
            reject += 1
    print(f"pairs: {n_pairs}")
    print(f"accepted: {accept}")
    print(f"rejected: {reject}")
    print(f"skipped: {skipped}")
    return 0


def cmd_analyse(args) -> int:
    from psi_tpu.io import load_graph

    graph = load_graph(args.graph)
    recs = read_gaf(args.gaf)
    truth = {r.qname: r for r in read_gaf(args.truth)}

    tp = fp = 0
    seen = set()
    for r in recs:
        if r.identity < args.identity:
            continue
        t = truth.get(r.qname)
        seen.add(r.qname)
        if t is None:
            fp += 1
            continue
        sl = _start_locus(graph, r)
        tl = _start_locus(graph, t)
        if sl is None or tl is None:
            fp += 1
            continue
        if sl[0] == tl[0] and abs(sl[1] - tl[1]) <= args.tolerance:
            tp += 1
        else:
            fp += 1
    fn = len(truth) - len(seen & set(truth))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    print(f"true positives: {tp}")
    print(f"false positives: {fp}")
    print(f"false negatives: {fn}")
    print(f"precision: {precision:.4f}")
    print(f"recall: {recall:.4f}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="alice", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dstats", help="verify pair distances via the distance index")
    d.add_argument("gaf")
    d.add_argument("-g", "--graph", required=True)
    d.add_argument("-d", "--dindex", required=True)

    a = sub.add_parser("analyse", help="precision/recall vs truth GAF")
    a.add_argument("gaf")
    a.add_argument("-g", "--graph", required=True)
    a.add_argument("-T", "--truth", required=True)
    a.add_argument("-t", "--identity", type=float, default=0.0)
    a.add_argument("--tolerance", type=int, default=0)

    args = p.parse_args(argv)
    if args.cmd == "dstats":
        return cmd_dstats(args)
    if args.cmd == "analyse":
        return cmd_analyse(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
