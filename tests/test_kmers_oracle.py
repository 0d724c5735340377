"""Graph k-mer enumeration vs the reference's bundled 20-mers oracle.

test/data/small/20-mers lists every (20-mer, start node, start offset)
of the x graph; our walk enumeration must reproduce the set exactly —
an independent completeness oracle for the traversal engine's coverage.
"""

import sys

import pytest

from psi_tpu.io import load_vg


def test_twenty_mers_oracle(data_dir):
    g = load_vg(str(data_dir / "small" / "x.vg"))
    truth = set()
    for line in (data_dir / "small" / "20-mers").read_text().splitlines():
        km, nid, off = line.split()
        truth.add((km, int(nid), int(off)))

    k = 20
    sys.setrecursionlimit(10000)

    def walks(nid, off, acc):
        seq = g.node_sequence(nid)
        acc2 = acc + seq[off: off + (k - len(acc))]
        if len(acc2) == k:
            yield acc2
            return
        for nb in g.out_neighbors(nid):
            yield from walks(nb, 0, acc2)

    mine = set()
    for r in range(1, g.node_count + 1):
        nid = g.rank_to_id(r)
        for off in range(g.node_length(nid)):
            for w in set(walks(nid, off, "")):
                mine.add((w, nid, off))

    assert mine == truth
    assert len(mine) == 3757


def test_traverser_reproduces_twenty_mers_multiset(data_dir):
    """The frontier traverser, seeded with the file's distinct 20-mers
    and run from every locus, must reproduce the file as an exact
    MULTISET — including its 23 duplicate-walk lines (parallel branch
    walks spelling the same k-mer emit separately, exactly as the
    reference's enumeration machinery does)."""
    from collections import Counter

    from psi_tpu.graph import Position
    from psi_tpu.ops import traverse as trav
    from psi_tpu.records import Records, SeedsIndex, seeding

    g = load_vg(str(data_dir / "small" / "x.vg"))
    truth = Counter()
    for line in (data_dir / "small" / "20-mers").read_text().splitlines():
        km, nid, off = line.split()
        truth[(km, int(nid), int(off))] += 1

    kmer_list = sorted({km for km, _, _ in truth})
    reads = Records([f"k{i}" for i in range(len(kmer_list))], kmer_list)
    seeds = seeding(reads, 20, 20)
    index = SeedsIndex(seeds)
    loci = [
        Position(g.rank_to_id(r), off)
        for r in range(1, g.node_count + 1)
        for off in range(g.node_length(g.rank_to_id(r)))
    ]
    # host and device engines both reproduce the multiset
    raw_host = trav.traverse_host(g, index, loci, 20)
    got = Counter(
        (kmer_list[int(seeds.seedmap[h[2], 0])], h[0], h[1]) for h in raw_host
    )
    assert got == truth

    ga = trav.graph_to_device(g)
    sa = trav.seeds_to_device(index)
    raw_dev = trav.traverse(g, ga, sa, index, loci, 20)
    got_dev = Counter(
        (kmer_list[int(seeds.seedmap[h[2], 0])], h[0], h[1]) for h in raw_dev
    )
    assert got_dev == truth
