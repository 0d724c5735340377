"""Bidirected-graph ingest: reverse-complement node doubling.

Truth case: a hand-built graph with an inversion. The oriented walk
1+ -> 2- -> 3+ spells seq(1) + revcomp(seq(2)) + seq(3); after
doubling, seeds for reads sampled across the inversion must be found
with correct loci on the reverse twin (ref orientation semantics:
vg/vg.proto:36-47, GFA L-line +/-).
"""

import numpy as np
import pytest

from psi_tpu.io.bidir import double_bidirected, revcomp
from psi_tpu.io.gfa import load_gfa
from psi_tpu.records import Records
from psi_tpu.seed_finder import SeedFinder


def test_revcomp():
    assert revcomp("ACGTN") == "NACGT"
    assert revcomp("CCAA") == "TTGG"


def test_double_bidirected_passthrough():
    nodes = {1: "AC", 2: "GT"}
    n, e, p, base = double_bidirected(
        nodes, [(1, "+", 2, "+")], [("ref", [(1, "+"), (2, "+")])]
    )
    assert base == 0 and n is nodes
    assert e == [(1, 2)] and p == [("ref", [1, 2])]


GFA_INV = """\
S\t1\tAAAA
S\t2\tCCAA
S\t3\tTTTT
L\t1\t+\t2\t-\t0M
L\t2\t-\t3\t+\t0M
P\tref\t1+,2-,3+\t*
"""


@pytest.fixture()
def inv_graph(tmp_path):
    f = tmp_path / "inv.gfa"
    f.write_text(GFA_INV)
    return load_gfa(str(f))


def test_inversion_loads_and_doubles(inv_graph):
    g = inv_graph
    assert g.rc_base == 10
    assert g.node_count == 6
    # the ref path routes through the reverse twin of node 2
    name, nodes = g.paths[0]
    coords = [g.coordinate_id(v) for v in nodes]
    assert coords == [1, 12, 3]
    twin = g.id_by_coordinate(12)
    assert g.node_sequence(twin) == "TTGG"
    assert g.strand_of(twin) == "-" and g.forward_coordinate(twin) == 2
    # mirror edges exist: rc(3) -> 2 -> rc(1)
    rc3, n2, rc1 = (g.id_by_coordinate(c) for c in (13, 2, 11))
    assert n2 in g.out_neighbors(rc3)
    assert rc1 in g.out_neighbors(n2)


def test_inversion_seeds_truth(inv_graph):
    """Reads spanning the inversion produce the expected seed loci on
    both the on-path (FM) and off-path (traversal) routes."""
    g = inv_graph
    walk = "AAAA" + "TTGG" + "TTTT"  # 1+ 2- 3+
    k = 8
    finder = SeedFinder(g, seed_len=k)
    finder.pick_paths(1, patched=False)
    finder.index_paths()

    read = walk[2: 2 + k]  # AATTGGTT: crosses 1+|2-|2-|3+ boundaries
    reads = Records(["r0"], [read])
    seeds = finder.get_seeds(reads)
    index = finder.index_reads(seeds)
    hits = []
    finder.seeds_on_paths(seeds, index, hits.append)
    assert len(hits) == 1
    h = hits[0]
    # the seed starts at offset 2 of node 1 (forward strand)
    assert g.coordinate_id(h.node_id) == 1
    assert h.node_offset == 2
    assert h.match_len == k

    # off-path route from all loci finds the same hit (empty path set)
    finder2 = SeedFinder(g, seed_len=k)
    finder2.add_all_loci()
    hits2 = []
    finder2.seeds_off_paths(seeds, index, hits2.append, device=False)
    assert any(
        g.coordinate_id(s.node_id) == 1 and s.node_offset == 2
        for s in hits2
    )
    # and the reverse-strand mirror of the read maps onto the twins
    rc_read = revcomp(read)
    seeds_rc = finder2.get_seeds(Records(["r1"], [rc_read]))
    index_rc = finder2.index_reads(seeds_rc)
    hits_rc = []
    finder2.seeds_off_paths(seeds_rc, index_rc, hits_rc.append, device=False)
    assert any(
        g.strand_of(s.node_id) == "-" for s in hits_rc
    )


def test_vg_inversion_roundtrip(tmp_path, inv_graph):
    """A vg file with from_start/to_end edges loads through the same
    doubling (wire format written by our own encoder)."""
    from psi_tpu.io import vgio

    # hand-encode a Graph message with an inverted edge
    out = bytearray()
    for nid, seq in ((1, "AAAA"), (2, "CCAA"), (3, "TTTT")):
        node = bytearray()
        vgio._write_field(node, 1, 2, seq.encode())
        vgio._write_field(node, 3, 0, nid)
        vgio._write_field(out, 1, 2, bytes(node))
    for f, t, fs, te in ((1, 2, 0, 1), (2, 3, 1, 0)):
        edge = bytearray()
        vgio._write_field(edge, 1, 0, f)
        vgio._write_field(edge, 2, 0, t)
        if fs:
            vgio._write_field(edge, 3, 0, 1)
        if te:
            vgio._write_field(edge, 4, 0, 1)
        vgio._write_field(out, 2, 2, bytes(edge))
    path = tmp_path / "inv.vg"
    import gzip

    with gzip.open(path, "wb") as fh:
        framed = bytearray()
        vgio._write_varint(framed, 1)
        vgio._write_varint(framed, len(out))
        framed += out
        fh.write(bytes(framed))

    g = vgio.load_vg(str(path))
    assert g.rc_base == 10
    twin = g.id_by_coordinate(12)
    assert g.node_sequence(twin) == "TTGG"
    assert g.id_by_coordinate(3) in g.out_neighbors(twin)


def test_cli_strand_aware_stream(tmp_path):
    """Truth case for strand-aware emission (vg is_reverse semantics):
    a read crossing the inversion produces a hit on node 2's reverse
    twin, emitted in the binary stream as node_id == -2 with the
    reverse-strand offset (distance from the forward node's end)."""
    from psi_tpu.cli import main

    gfa = tmp_path / "inv.gfa"
    gfa.write_text(GFA_INV)
    fq = tmp_path / "r.fastq"
    # read = path positions 2..9 of AAAA|TTGG|TTTT: crosses 1+ -> 2-
    fq.write_text("@r0\nAATTGGTT\n+\nIIIIIIII\n")
    out = tmp_path / "hits.bin"
    assert main(
        [str(gfa), "-f", str(fq), "-l", "4", "-n", "1", "-o", str(out),
         "--device", "cpu", "-q", "-Q"]
    ) == 0
    rows = {tuple(r) for r in
            np.fromfile(out, dtype=np.int64).reshape(-1, 4).tolist()}
    # seed "AATT" (read offset 0): node 1 forward, offset 2
    assert (1, 2, 0, 0) in rows
    # seed "GGTT" (read offset 4): starts on the reverse twin of node 2
    # at twin offset 2 = vg (node 2, is_reverse, offset 2)
    assert (-2, 2, 0, 4) in rows
    # nothing still carries a synthetic twin coordinate (>= rc_base)
    assert all(r[0] < 10 for r in rows)
