"""Path layer + haplotyper tests (mirrors reference [path]/[graph][iterator]
and the pick_paths scenario of [seedfinder])."""

import numpy as np
import pytest

from psi_tpu.graph import Graph
from psi_tpu.graphiter import (
    BacktrackerIter,
    BFSIter,
    HaplotypePath,
    HaplotyperIter,
    extend_to_k,
)
from psi_tpu.io import load_gfa
from psi_tpu.pathset import PathSet, get_uniq_haplotype
from psi_tpu.pathutil import (
    Path,
    contains,
    covered_by,
    ltrim_back_by_len,
    ltrim_front_by_len,
    position_to_id,
    position_to_offset,
    rtrim_back_by_len,
    rtrim_front_by_len,
    sequence,
    trim_back,
    trim_front,
)


@pytest.fixture
def g4():
    return Graph.from_parts(
        {1: "GCAAT", 2: "A", 3: "TTAGCC", 4: "GCA"},
        [(1, 2), (2, 3), (3, 4)],
        [("r", [1, 2, 3, 4])],
    )


def test_path_sequence_and_rank_select(g4):
    p = Path(g4, [1, 2, 3, 4])
    assert p.get_sequence_len() == 15
    assert sequence(p) == "GCAATATTAGCCGCA"
    assert sequence(p, reversed_=True) == "GCAATATTAGCCGCA"[::-1]
    # node breaks doc example (ref: path_base.hpp:642-678)
    assert p.rank(0) == 0
    assert p.rank(4) == 0
    assert p.rank(5) == 1
    assert p.rank(6) == 2
    assert p.rank(12) == 3
    assert p.select(0) == 0
    assert p.select(1) == 5
    assert p.select(2) == 6
    assert p.select(3) == 12
    assert position_to_id(p, 6) == 3
    assert position_to_offset(p, 8) == 2


def test_path_partial_offsets(g4):
    # left = included suffix of first node; right = included prefix of last
    p = Path(g4, [1, 2, 3], left=2, right=4)
    assert p.get_sequence_len() == 2 + 1 + 4
    assert sequence(p) == "AT" + "A" + "TTAG"
    assert p.get_head_offset() == 3
    assert position_to_id(p, 0) == 1
    assert position_to_offset(p, 0) == 3
    assert position_to_offset(p, 1) == 4
    assert position_to_id(p, 2) == 2
    assert position_to_offset(p, 6) == 3


def test_push_back_offset_semantics(g4):
    p = Path(g4)
    p.push_back(1, 3)  # first node: start locus 3 -> include suffix "AT"
    assert sequence(p) == "AT"
    p.push_back(2)
    p.push_back(3, 4)  # later node: include prefix of length 4
    assert sequence(p) == "ATATTAG"
    p.push_back(4)  # implicit full right reset on previous tail
    assert sequence(p) == "ATATTAGCCGCA"


def test_trims(g4):
    p = Path(g4, [1, 2, 3, 4])
    trim_back(p, 3)
    assert p.get_nodes() == [1, 2]
    trim_front(p, 1)
    assert p.get_nodes() == [2]

    p = Path(g4, [1, 2, 3, 4])
    ltrim_back_by_len(p, 7)  # keep leftmost 7-mer
    assert p.get_sequence_len() >= 7
    assert p.get_nodes() == [1, 2, 3]

    p = Path(g4, [1, 2, 3, 4])
    rtrim_front_by_len(p, 4)  # keep rightmost 4-mer
    assert p.get_nodes() == [3, 4]

    p = Path(g4, [1, 2, 3, 4])
    rtrim_front_by_len(p, 4, hard=True)
    assert p.get_sequence_len() == 4
    assert sequence(p) == "CGCA"

    p = Path(g4, [1, 2, 3, 4])
    ltrim_back_by_len(p, 7, hard=True)
    assert p.get_sequence_len() == 7
    assert sequence(p) == "GCAATAT"


def test_contains_and_covered_by(g4):
    p = Path(g4, [1, 2, 3, 4])
    assert contains(p, [2, 3])
    assert contains(p, [1, 2, 3, 4])
    assert not contains(p, [2, 4])
    assert not contains(p, [])
    assert covered_by([2, 3], [p])
    assert not covered_by([4, 1], [p])


def test_haplotype_path_window():
    hp = HaplotypePath([1, 3, 5, 6, 8])
    assert hp.contains([3, 5, 6])
    assert hp.contains([1])
    assert not hp.contains([3, 6])  # not contiguous in the haplotype
    assert not hp.contains([5, 3])
    assert not hp.contains([])


def test_bfs_visits_all(data_dir):
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    it = BFSIter(g)
    seen = []
    while not it.at_end():
        seen.append(it.value)
        it.next()
    assert sorted(seen) == list(range(1, 16))


def test_backtracker_enumerates_branches(data_dir):
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    bt = BacktrackerIter(g, 1)
    paths = []
    path = []
    while not bt.at_end():
        while not bt.at_end() and len(path) < 4:
            path.append(bt.value)
            bt.next()
        paths.append(list(path))
        bt.backtrack()
        if bt.at_end():
            break
        # rewind path to the branch point
        while path and path[-1] != bt.value:
            path.pop()
        if path:
            path.pop()
    # 1 -> {2,3} -> {4,5} -> 6: four distinct 4-node walks
    assert [1, 2, 4, 6] in paths
    assert [1, 3, 5, 6] in paths
    assert len({tuple(p) for p in paths}) == 4


def test_pick_paths_tiny_parity(data_dir):
    """Full-haplotype picking truth (ref: test_seedfinder.cpp:46-83)."""
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    pset = PathSet(g)
    hp = HaplotyperIter(g, rng=np.random.RandomState(0))
    start = int(g.path_nodes(0)[0])
    hp.reset(start)
    for _ in range(4):
        get_uniq_haplotype(pset, hp, context_len=30, patched=False)
    assert len(pset) == 4
    seqs = [sequence(p) for p in pset]
    assert seqs[0] == "CAAATAAGATTTGAAAATTTTCTGGAGTTCTATAATATACCAACTCTCTG"
    assert seqs[1] == "CAAATAAGGCTTGGAAATTTTCTGGAGTTCTATTATATTCCAACTCTCTG"
    assert len(set(seqs)) == 4


def test_micro_path_membership():
    # Path<Micro> spec: membership only (ref: path_base.hpp:834-954)
    from psi_tpu.pathutil import MicroPath

    m = MicroPath([3, 4])
    m.add_node(9)
    m.extend(MicroPath([11]))
    assert m.contains(9) and m.contains(11) and not m.contains(5)
    assert m.size() == 4 and not m.empty()
    m.clear()
    assert m.empty()
