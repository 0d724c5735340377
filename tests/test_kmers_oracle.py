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
