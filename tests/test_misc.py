"""Edge-case coverage: Local/Random haplotypers, step sizes, guards."""

import numpy as np
import pytest

from psi_tpu.graphiter import HaplotyperLocalIter, HaplotyperRandomIter
from psi_tpu.io import load_gfa
from psi_tpu.pathset import PathSet, get_uniq_full_haplotype
from psi_tpu.pathutil import sequence
from psi_tpu.seed_finder import SeedFinder


def test_local_haplotyper_unique(data_dir):
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    pset = PathSet(g)
    hp = HaplotyperLocalIter(g, param=12, rng=np.random.RandomState(0))
    hp.reset(int(g.path_nodes(0)[0]), param=12)
    for _ in range(4):
        get_uniq_full_haplotype(pset, hp)
    seqs = [sequence(p) for p in pset]
    assert len(seqs) == 4
    assert len(set(seqs)) >= 3  # diversity-seeking: near-unique walks
    assert seqs[0] == "CAAATAAGATTTGAAAATTTTCTGGAGTTCTATAATATACCAACTCTCTG"


def test_random_haplotyper_walks(data_dir):
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    itr = HaplotyperRandomIter(g, seed=42)
    nodes = []
    while not itr.at_end():
        nodes.append(itr.value)
        itr.next()
    assert nodes[0] == 1
    assert nodes[-1] == 15
    # consecutive nodes are connected
    for a, b in zip(nodes, nodes[1:]):
        assert b in list(g.out_neighbors(a))


def test_uncovered_step_parity_native_python(data_dir):
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    for step in (1, 2, 3):
        f1 = SeedFinder(g, 12)
        f1.pick_paths(4, True, 12)
        f1.index_paths()
        f1.add_uncovered_loci(step)
        l1 = [(l.node_id(), l.offset()) for l in f1.get_starting_loci()]

        f2 = SeedFinder(g, 12)
        f2.pick_paths(4, True, 12)
        f2.index_paths()
        f2._add_uncovered_loci_py(step)
        l2 = [(l.node_id(), l.offset()) for l in f2.get_starting_loci()]
        assert l1 == l2, step


def test_context_guard(data_dir):
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    finder = SeedFinder(g, 12)
    finder.pick_paths(2, patched=True, context=8)  # context < seed_len
    finder.index_paths()
    from psi_tpu.records import Records

    reads = Records(["r"], ["ACGTACGTACGT"])
    seeds = finder.get_seeds(reads)
    index = finder.index_reads(seeds)
    with pytest.raises(RuntimeError):
        finder.seeds_on_paths(seeds, index, lambda h: None)


def test_seeding_distance_param(data_dir):
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    finder = SeedFinder(g, 5)
    from psi_tpu.records import Records

    reads = Records(["r"], ["ACGTACGTACGTACG"])  # len 15
    s_no = finder.get_seeds(reads)            # non-overlapping: 0,5,10
    assert len(s_no) == 3
    s_ov = finder.get_seeds(reads, 2)          # step 2: 0,2,4,6,8,10
    assert len(s_ov) == 6
    s_gr = finder.get_seeds(reads, 1)          # greedy: 11 windows
    assert len(s_gr) == 11


def test_empty_reads_chunk(data_dir):
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    finder = SeedFinder(g, 12)
    finder.pick_paths(2, True, 12)
    finder.index_paths()
    finder.add_uncovered_loci()
    from psi_tpu.records import Records

    seeds = finder.get_seeds(Records([], []))
    index = finder.index_reads(seeds)
    hits = finder.seeds_all_arrays(seeds, index)
    assert len(hits) == 0


def test_pathindex_context_guard_on_load(data_dir, tmp_path):
    """(ref: pathindex.hpp:109-143): a stored context smaller than the
    requested one must be rejected."""
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    f = SeedFinder(g, 12)
    f.create_path_index(4, True, 12)
    prefix = str(tmp_path / "p")
    assert f.serialize_path_index(prefix)

    f2 = SeedFinder(g, 20)
    assert not f2.load_path_index(prefix, context=20)

    f3 = SeedFinder(g, 10)
    assert f3.load_path_index(prefix, context=10)


def test_cyclic_graph_terminates():
    """Cyclic graphs are out of contract (psikt requires topological
    order) but every stage must terminate, not hang."""
    from psi_tpu.graph import Graph, Position
    from psi_tpu.dindex import DistanceIndex
    from psi_tpu.records import Records, SeedsIndex, seeding
    from psi_tpu.ops import traverse as trav

    g = Graph.from_parts(
        {1: "ACGTAC", 2: "GGA", 3: "TTC"},
        [(1, 2), (2, 3), (3, 2)],
        [("x", [1, 2, 3])],
    )
    reads = Records(["r0"], ["GGATTCGGATTC"])
    seeds = seeding(reads, 12, 12)
    idx = SeedsIndex(seeds)
    loci = [Position(n, o) for n in (1, 2, 3) for o in range(g.node_length(n))]
    hits = trav.traverse_host(g, idx, loci, 12)
    assert (2, 0, 0, 1, 12) in hits  # the cycle-crossing read is found

    di = DistanceIndex.build(g, 3, 8)
    assert di.verify(g, 2, 0, 2, 0) is False

    finder = SeedFinder(g, 6)
    finder.pick_paths(2, patched=True, context=6)
    finder.index_paths()
    finder.add_uncovered_loci()
    assert len(finder.pindex) == 2


def test_all_exact_matches_n_containing_read(data_dir):
    """N is a real Dna5 symbol on both sides (ref: index_iter.hpp:928-948
    searches Dna5 reads against a Dna5 text); an N-containing read whose
    exact sequence occurs on an indexed path must match."""
    from psi_tpu.graph import Graph
    from psi_tpu.records import Records

    g = Graph.from_parts({1: "ACGTNACGTTT"}, [], [("ref", [1])])
    f = SeedFinder(g, 4)
    f.pick_paths(1, patched=False)
    f.index_paths()
    reads = Records(["r0", "r1"], ["GTNAC", "GTAAC"])
    hits = []
    f.all_exact_matches(reads, hits.append)
    assert [(h.node_id, h.node_offset, h.read_id) for h in hits] == [(1, 2, 0)]


def test_timer_get_duration_ts():
    from psi_tpu.stats import Timer, timeit_ts

    Timer.reset_all()
    with timeit_ts("unit-ts-probe"):
        pass
    assert Timer.get_duration_ts("unit-ts-probe") > 0.0
    assert Timer.get_duration("unit-ts-probe") == 0.0  # the bug this guards
    Timer.reset_all()


def test_stats_bulk_gocc():
    from psi_tpu.stats import ThreadStats

    ts = ThreadStats()
    ts.add_seed_gocc_bulk(10, 4)
    ts.inc_gocc_skips(3)
    assert ts.avg_gocc() == 2.5
    assert ts.gocc_skips == 3


def test_all_kmers_noncontiguous_alphabet():
    """Custom (non-contiguous) alphabets must produce base-|alphabet|
    code-digit keys at every depth (advisor finding: depth-1 digits used
    c - alphabet[0])."""
    from psi_tpu.fmindex import FMIndex

    fm = FMIndex.build_from_strings(["ATTATA"])  # codes: A=1, T=4
    keys, counts, _ = fm.all_kmers(2, alphabet=(1, 4))
    got = {int(k): int(c) for k, c in zip(keys, counts)}
    # digits: A->0, T->1 (enumeration index); key = d0*2 + d1
    assert got == {0b01: 2, 0b10: 2, 0b11: 1}  # AT=01, TA=10, TT=11
