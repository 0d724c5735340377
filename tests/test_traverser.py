"""Traverser parity tests.

Mirrors the reference oracle (ref: test/src/test_traverser.cpp:49-146):
10 error-free reads of length 10 on small/x.vg, traversed from every
locus, must yield exactly these 10 hits in locus order:
(1,0) (1,1) (9,4) (9,17) (16,0) (17,0) (20,0) (20,31) (20,38) (20,38)
with read_id == hit index and read_offset == 0.
"""

import numpy as np
import pytest

from psi_tpu.graph import Position
from psi_tpu.io import load_vg, read_fastq
from psi_tpu.ops import traverse as trav
from psi_tpu.records import Records, SeedsIndex, seeding
from psi_tpu.ops.kmers import pack_kmers, seq_to_codes

TRUTH = [
    (1, 0), (1, 1), (9, 4), (9, 17), (16, 0),
    (17, 0), (20, 0), (20, 31), (20, 38), (20, 38),
]


@pytest.fixture(scope="module")
def setup(data_dir):
    graph = load_vg(str(data_dir / "small" / "x.vg"))
    names, seqs = read_fastq(str(data_dir / "small" / "reads_n10l10e0i0.fastq"))
    assert len(seqs) == 10
    reads = Records(names, seqs)
    # reads themselves are the "seeds" here (length == k == 10)
    seeds = seeding(reads, k=10, step=10)
    index = SeedsIndex(seeds)
    return graph, reads, seeds, index


def all_loci(graph):
    loci = []
    for rank in range(1, graph.node_count + 1):
        nid = graph.rank_to_id(rank)
        for off in range(graph.node_length(nid)):
            loci.append(Position(nid, off))
    return loci


def to_read_hits(seeds, raw_hits):
    """(node, off, seed_id, gocc, len) -> (node, off, read_id, read_off)."""
    return [
        (nid, noff, seeds.read_id(sid), seeds.read_offset(sid))
        for nid, noff, sid, gocc, L in raw_hits
    ]


def test_host_traverser_truth_table(setup):
    graph, reads, seeds, index = setup
    hits = []
    for locus in all_loci(graph):
        raw = trav.traverse_host(graph, index, [locus], 10)
        hits.extend(to_read_hits(seeds, raw))
    assert len(hits) == 10
    for i, (nid, noff, rid, roff) in enumerate(hits):
        assert (nid, noff) == TRUTH[i], i
        assert rid == i
        assert roff == 0


def test_device_traverser_matches_host(setup):
    graph, reads, seeds, index = setup
    g = trav.graph_to_device(graph)
    sa = trav.seeds_to_device(index)
    loci = all_loci(graph)
    raw_dev = trav.traverse(graph, g, sa, index, loci, 10)
    raw_host = []
    for locus in loci:
        raw_host.extend(trav.traverse_host(graph, index, [locus], 10))
    assert sorted(raw_dev) == sorted(raw_host)
    assert len(raw_dev) == 10


def test_traverser_branch_walks_emit_separately(setup):
    graph, reads, seeds, index = setup
    # reads 8 and 9 match two *different* branch walks from (20, 38)
    # (node 20 suffix GGGCTT -> T / C branches); each walk reports its own
    # hit with gocc = 1 — the duplicate-locus emission of the truth table.
    raw = trav.traverse_host(graph, index, [Position(20, 38)], 10)
    assert len(raw) == 2
    assert all(h[3] == 1 for h in raw)
    rids = sorted(seeds.read_id(h[2]) for h in raw)
    assert rids == [8, 9]


@pytest.mark.parametrize("seed", [0, 1])
def test_device_traverser_random_graphs(seed):
    """Device == host on random bubble graphs, incl. the overflow-retry
    path (tiny starting capacity forces frontier growth past cap)."""
    from psi_tpu.graphiter import HaplotyperRandomIter
    from psi_tpu.pathutil import Path as PPath, sequence
    from psi_tpu.simulate import make_pangenome_graph

    rng = np.random.RandomState(seed)
    graph = make_pangenome_graph(1500, 0.05, indel_frac=0.4, seed=seed)
    itr = HaplotyperRandomIter(graph, seed=seed + 1)
    hap = PPath(graph)
    while not itr.at_end():
        hap.push_back(itr.value)
        itr.next()
    hs = sequence(hap)
    k = int(rng.randint(6, 16))
    reads = Records(
        [f"r{i}" for i in range(20)],
        [hs[p: p + k] for p in rng.randint(0, len(hs) - k, 20)],
    )
    seeds = seeding(reads, k, k)
    index = SeedsIndex(seeds)
    loci = [
        Position(n, o)
        for n in range(1, graph.node_count + 1)
        for o in range(graph.node_length(n))
    ]
    g = trav.graph_to_device(graph)
    sa = trav.seeds_to_device(index)
    host = sorted(trav.traverse_host(graph, index, loci, k))
    dev = sorted(trav.traverse(graph, g, sa, index, loci, k, cap=1 << 13))
    assert dev == host
    dev2 = sorted(
        trav.traverse(graph, g, sa, index, loci, k, cap=len(loci) + 1)
    )
    assert dev2 == host


def test_device_occ_matches_host_consulted_rows():
    """seeds_to_device derives occ from the plane words on device; it
    must equal the host-built table on every CONSULTED row (b <= V//32
    per depth; later rows may differ by pad bits and are never read)."""
    import numpy as np

    from psi_tpu.ops import traverse as trav
    from psi_tpu.records import Records, SeedSet, seeding

    rng = np.random.RandomState(12)
    for n_reads, L in ((7, 40), (33, 61)):
        reads = Records(
            [f"r{i}" for i in range(n_reads)],
            ["".join(rng.choice(list("ACGT"), size=L))
             for _ in range(n_reads)],
        )
        seeds = seeding(reads, 12, 12)
        from psi_tpu.records import SeedsIndex

        index = SeedsIndex(seeds)
        sa = trav.seeds_to_device(index)
        dev = np.asarray(sa.occ)
        host = index.occ
        V = index.size
        b_max = V // 32
        np.testing.assert_array_equal(
            dev[:, : b_max + 1], host[:, : b_max + 1]
        )


@pytest.mark.parametrize("seed", [3, 11])
def test_walk_tree_matches_device(seed):
    """WalkTree (chunk-independent enumeration + per-chunk searchsorted,
    the bulk-route default) == the pruned device traversal: identical
    survivors (locus, lo, hi) IN ORDER and identical TraverserStats
    (godowns / ended / ended-length) on random bubble graphs."""
    import jax.numpy as jnp

    from psi_tpu.graphiter import HaplotyperRandomIter
    from psi_tpu.pathutil import Path as PPath, sequence
    from psi_tpu.simulate import make_pangenome_graph

    rng = np.random.RandomState(seed)
    graph = make_pangenome_graph(1500, 0.05, indel_frac=0.4, seed=seed)
    itr = HaplotyperRandomIter(graph, seed=seed + 1)
    hap = PPath(graph)
    while not itr.at_end():
        hap.push_back(itr.value)
        itr.next()
    hs = sequence(hap)
    k = int(rng.randint(6, 16))
    reads = Records(
        [f"r{i}" for i in range(30)],
        [hs[p: p + k] for p in rng.randint(0, len(hs) - k, 30)],
    )
    seeds = seeding(reads, k, k)
    index = SeedsIndex(seeds)
    loci = [
        Position(n, o)
        for n in range(1, graph.node_count + 1)
        for o in range(graph.node_length(n))
    ]
    sn = np.array([p.node_id() for p in loci], dtype=np.int32)
    so = np.array([p.offset() for p in loci], dtype=np.int32)

    tree = trav.enumerate_walks(graph, sn, so, k)
    assert tree is not None
    li_t, lo_t, hi_t, gd_t, ended_t, el_t = trav.walks_match(
        tree, index.sorted_keys
    )

    g = trav.graph_to_device(graph)
    sa = trav.seeds_to_device(index)
    cap = 1 << 13
    li, lo, hi, nu, ov, ts = trav.traverse_device(
        g, sa,
        jnp.asarray(np.resize(sn, cap)), jnp.asarray(np.resize(so, cap)),
        jnp.asarray(len(loci), dtype=jnp.int32), k, cap,
    )
    assert not bool(ov)
    nu = int(nu)
    np.testing.assert_array_equal(li_t, np.asarray(li)[:nu])
    np.testing.assert_array_equal(lo_t, np.asarray(lo)[:nu])
    np.testing.assert_array_equal(hi_t, np.asarray(hi)[:nu])
    gd_d, ended_d, el_d = (int(v) for v in np.asarray(ts))
    assert (gd_t, ended_t, el_t) == (gd_d, ended_d, el_d)
