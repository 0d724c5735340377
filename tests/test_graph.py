"""Graph substrate and loader tests (mirrors reference [graph] suite)."""

import numpy as np
import pytest

from psi_tpu.graph import Graph
from psi_tpu.io import load_gfa, load_vg


def test_from_parts_basic():
    g = Graph.from_parts(
        {1: "CAAATAAG", 2: "A", 3: "G", 4: "TTG"},
        [(1, 2), (1, 3), (2, 4), (3, 4)],
        [("x", [1, 2, 4])],
    )
    assert g.node_count == 4
    assert g.edge_count == 4
    assert g.node_sequence(1) == "CAAATAAG"
    assert g.node_length(1) == 8
    assert g.node_length(4) == 3
    assert list(g.out_neighbors(1)) == [2, 3]
    assert list(g.in_neighbors(4)) == [2, 3]
    assert g.outdegree(1) == 2
    assert g.indegree(1) == 0
    assert g.has_edges_out(1) and not g.has_edges_out(4)
    assert g.id_to_charorder(1) == 0
    assert g.id_to_charorder(2) == 8
    assert g.id_to_charorder(4) == 10
    assert g.total_nof_loci() == 13
    assert g.max_node_len() == 8
    assert g.get_path_count() == 1
    assert list(g.path_nodes(0)) == [1, 2, 4]
    assert g.components_ranks() == [1]


def test_tiny_gfa(data_dir):
    g = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    assert g.node_count == 15
    assert g.node_sequence(1) == "CAAATAAG"
    assert g.node_sequence(9) == "AAATTTTCTGGAGTTCTAT"
    assert g.node_sequence(15) == "CCAACTCTCTG"
    assert list(g.out_neighbors(1)) == [2, 3]
    assert list(g.out_neighbors(6)) == [7, 8]
    assert g.get_path_count() == 1
    assert g.path_name(0) == "x"
    assert list(g.path_nodes(0)) == [1, 3, 5, 6, 8, 9, 11, 12, 14, 15]


def test_tiny_vg_matches_gfa(data_dir):
    gg = load_gfa(str(data_dir / "tiny" / "tiny.gfa"))
    gv = load_vg(str(data_dir / "tiny" / "tiny.vg"))
    assert gv.node_count == gg.node_count
    for nid in range(1, gg.node_count + 1):
        assert gv.node_sequence(nid) == gg.node_sequence(nid)
    assert gv.edge_count == gg.edge_count
    for nid in range(1, gg.node_count + 1):
        assert sorted(gv.out_neighbors(nid)) == sorted(gg.out_neighbors(nid))
    assert gv.get_path_count() == 1
    assert list(gv.path_nodes(0)) == list(gg.path_nodes(0))


def test_small_x_vg(data_dir):
    g = load_vg(str(data_dir / "small" / "x.vg"))
    assert g.node_count == 210
    # truth anchors from the traverser truth table's nodes
    # (ref: test/src/test_traverser.cpp:81-84 expects hits on nodes 1,9,16,17,20)
    assert g.node_sequence(1) == "CAAATAAG"
    assert g.get_path_count() == 1
    assert g.path_name(0) == "x"


def test_multi_vg_components(data_dir):
    g = load_vg(str(data_dir / "multi" / "multi.vg"))
    assert g.get_path_count() > 1
    ranks = g.components_ranks()
    assert ranks == sorted(ranks)
    assert len(ranks) == g.get_path_count()
    ranges = g.component_ranges()
    assert ranges[0][0] == ranks[0]
    assert ranges[-1][1] == g.node_count + 1


def test_coordinate_maps():
    g = Graph.from_parts({10: "AC", 20: "GT"}, [(10, 20)], [])
    assert g.id_by_coordinate(10) == 1
    assert g.id_by_coordinate(20) == 2
    assert g.coordinate_id(1) == 10
    assert g.coordinate_id(2) == 20
    assert g.node_sequence(g.id_by_coordinate(20)) == "GT"
