"""GFA1 format coverage (S/L/P lines)."""

import pytest

from psi_tpu.io.gfa import load_gfa


GFA1 = """H\tVN:Z:1.0
S\t1\tCAAATAAG
S\t2\tA
S\t3\tG
S\t4\tTTGAC
L\t1\t+\t2\t+\t0M
L\t1\t+\t3\t+\t0M
L\t2\t+\t4\t+\t0M
L\t3\t+\t4\t+\t0M
P\tx\t1+,2+,4+\t*
"""


def test_gfa1_basic(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_text(GFA1)
    g = load_gfa(str(p))
    assert g.node_count == 4
    assert g.node_sequence(1) == "CAAATAAG"
    assert g.node_sequence(4) == "TTGAC"
    assert list(g.out_neighbors(1)) == [2, 3]
    assert g.get_path_count() == 1
    assert list(g.path_nodes(0)) == [1, 2, 4]


def test_gfa1_pipeline(tmp_path):
    from psi_tpu.records import Records
    from psi_tpu.seed_finder import SeedFinder

    p = tmp_path / "g.gfa"
    p.write_text(GFA1)
    g = load_gfa(str(p))
    finder = SeedFinder(g, 6)
    finder.pick_paths(2, patched=True, context=6)
    finder.index_paths()
    finder.add_uncovered_loci()
    reads = Records(["r0"], ["AAGATT"])  # spans 1->2->4
    seeds = finder.get_seeds(reads)
    index = finder.index_reads(seeds)
    hits = finder.seeds_all_arrays(seeds, index)
    assert any(
        (h["node_id"], h["node_offset"]) == (1, 5) for h in hits
    )
