"""Distance-index builders: supernode-DAG DP vs interval-BFS oracle.

The round-2 builder (contract unary chains, reverse-topological
interval DP over the supernode DAG; psi_tpu/dindex.py) must reproduce
the round-1 per-source interval BFS verdicts exactly — on random DAGs,
through save/load, with and without the native builder.
"""

import numpy as np
import pytest

from psi_tpu.dindex import DistanceIndex, contract_chains
from psi_tpu.graph import Graph


def _random_dag(rng, n):
    nodes = {
        i + 1: "".join(rng.choice(list("ACGT"), size=rng.randint(1, 12)))
        for i in range(n)
    }
    edges = []
    for v in range(1, n):
        for _ in range(rng.randint(1, 3)):
            edges.append((v, int(rng.randint(v + 1, n + 1))))
    return Graph.from_parts(nodes=nodes, edges=edges, paths=[("ref", [1])])


@pytest.mark.parametrize("seed", range(4))
def test_super_dp_matches_bfs_oracle(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(20, 120))
    g = _random_dag(rng, n)
    dmin, dmax = int(rng.randint(1, 20)), int(rng.randint(20, 120))

    new = DistanceIndex.build(g, dmin, dmax)
    assert new.mode == "super"
    oracle = DistanceIndex(dmin, dmax)
    oracle.n_nodes = g.node_count
    oracle.mode = "node"
    DistanceIndex._build_py(oracle, g, dmax, False)

    M = 2000
    ids = np.arange(1, n + 1)
    v = ids[rng.randint(0, n, M)]
    u = ids[rng.randint(0, n, M)]
    nl = np.diff(g.label_offsets)
    o = (rng.rand(M) * nl[v - 1]).astype(np.int64)
    p = (rng.rand(M) * nl[u - 1]).astype(np.int64)
    got = new.verify_batch(g, v, o, u, p)
    expect = oracle.verify_batch(g, v, o, u, p)
    np.testing.assert_array_equal(got, expect)
    for i in rng.choice(M, 40):
        assert new.verify(
            g, int(v[i]), int(o[i]), int(u[i]), int(p[i])
        ) == bool(got[i])


@pytest.mark.parametrize("variant", ["sort", "bisect"])
def test_device_probe_matches_host(variant):
    """Both device probe formulations (ops/dindex_probe.py) agree with
    the host searchsorted probe on random DAG pair batches, including
    same-supernode arithmetic, misses, and out-of-window queries."""
    rng = np.random.RandomState(17)
    n = 150
    g = _random_dag(rng, n)
    dmin, dmax = 5, 90
    idx = DistanceIndex.build(g, dmin, dmax)
    M = 4000
    ids = np.arange(1, n + 1)
    v = ids[rng.randint(0, n, M)]
    u = ids[rng.randint(0, n, M)]
    nl = np.diff(g.label_offsets)
    o = (rng.rand(M) * nl[v - 1]).astype(np.int64)
    p = (rng.rand(M) * nl[u - 1]).astype(np.int64)
    host = idx.verify_batch(g, v, o, u, p)
    import os

    os.environ["PSI_DINDEX_PROBE"] = variant
    try:
        dev = idx.verify_batch_device(g, v, o, u, p)
    finally:
        del os.environ["PSI_DINDEX_PROBE"]
    assert host.any()
    np.testing.assert_array_equal(host, dev)


def test_super_dp_python_mirror(monkeypatch):
    """The pure-Python DP (native disabled) matches the native rows."""
    rng = np.random.RandomState(9)
    g = _random_dag(rng, 60)
    native_idx = DistanceIndex.build(g, 5, 80)

    import psi_tpu.native as nat

    monkeypatch.setattr(nat, "dindex_super_build", lambda *a, **k: None)
    py_idx = DistanceIndex.build(g, 5, 80)
    assert py_idx.mode == native_idx.mode == "super"
    np.testing.assert_array_equal(py_idx.src_indptr, native_idx.src_indptr)
    np.testing.assert_array_equal(py_idx.dst, native_idx.dst)
    np.testing.assert_array_equal(py_idx.iv_lo, native_idx.iv_lo)
    np.testing.assert_array_equal(py_idx.iv_hi, native_idx.iv_hi)


def test_cyclic_falls_back_to_node_mode():
    nodes = {1: "ACGT", 2: "GG", 3: "TTT"}
    edges = [(1, 2), (2, 3), (3, 1)]  # cycle
    g = Graph.from_parts(nodes=nodes, edges=edges, paths=[("ref", [1])])
    di = DistanceIndex.build(g, 2, 30)
    assert di.mode == "node"
    # 1 -> 2: D0 = 1 + 0 (adjacent); distance (4-1-o) + 1 + p
    assert di.verify(g, 1, 0, 2, 0)
    # around the cycle 2 -> 1: 1 + len(3) = 4; a = (2-1-0) + 0 = 1
    assert di.verify(g, 2, 0, 1, 0)


def test_save_load_roundtrip_super(tmp_path):
    rng = np.random.RandomState(2)
    g = _random_dag(rng, 50)
    di = DistanceIndex.build(g, 3, 60)
    path = str(tmp_path / "d.npz")
    di.save(path)
    back = DistanceIndex.load(path)
    assert back.mode == "super"
    M = 500
    ids = np.arange(1, 51)
    v = ids[rng.randint(0, 50, M)]
    u = ids[rng.randint(0, 50, M)]
    o = np.zeros(M, dtype=np.int64)
    p = np.zeros(M, dtype=np.int64)
    np.testing.assert_array_equal(
        di.verify_batch(g, v, o, u, p), back.verify_batch(g, v, o, u, p)
    )


def test_contract_chains_shapes():
    # pure chain contracts to one supernode
    nodes = {1: "AA", 2: "C", 3: "GGG"}
    edges = [(1, 2), (2, 3)]
    g = Graph.from_parts(nodes=nodes, edges=edges, paths=[("ref", [1])])
    sup, head, tail, sup_len, ip, ix = contract_chains(
        np.diff(g.label_offsets), g.out_indptr, g.out_indices
    )
    assert len(sup_len) == 1 and sup_len[0] == 6
    assert list(sup[1:]) == [1, 1, 1]
    assert list(head[1:]) == [0, 2, 3]
    assert list(tail[1:]) == [4, 3, 0]
    assert len(ix) == 0


def test_save_load_big_columns(tmp_path, monkeypatch):
    """Columns above the size threshold spill to raw .npy side files
    and load back memory-mapped, probe-identical (the 3 Gbp artifact
    form: savez_compressed cannot stream multi-GB columns)."""
    g = _random_dag(np.random.RandomState(21), 80)
    idx = DistanceIndex.build(g, dmin=2, dmax=40)
    assert len(idx.dst) > 0
    monkeypatch.setattr(DistanceIndex, "BIG_COL_BYTES", 8)  # force spill
    p = str(tmp_path / "big.npz")
    idx.save(p)
    # side files exist for the interval columns
    import os as _os
    assert _os.path.exists(str(tmp_path / "big.dst.npy"))
    idx2 = DistanceIndex.load(p)
    assert isinstance(idx2.dst, np.memmap)
    np.testing.assert_array_equal(
        np.asarray(idx.src_indptr), np.asarray(idx2.src_indptr))
    np.testing.assert_array_equal(np.asarray(idx.dst), np.asarray(idx2.dst))
    np.testing.assert_array_equal(
        np.asarray(idx.iv_lo), np.asarray(idx2.iv_lo))
    np.testing.assert_array_equal(
        np.asarray(idx.iv_hi), np.asarray(idx2.iv_hi))
    # probes agree through the memmapped index
    rng = np.random.RandomState(3)
    n = g.node_count
    q_src = rng.randint(1, n + 1, size=64)
    q_dst = rng.randint(1, n + 1, size=64)
    for v, u in zip(q_src, q_dst):
        assert idx.verify(g, int(v), 0, int(u), 0) == \
            idx2.verify(g, int(v), 0, int(u), 0)


def test_device_build_matches_native_graph():
    """PSI_DINDEX_BUILD=device (interval-semiring path doubling on the
    mesh/device backend) produces byte-identical CSR to the native
    reverse-topo DP on a real bubble graph."""
    import os as _os

    g = _random_dag(np.random.RandomState(23), 120)
    a = DistanceIndex.build(g, dmin=2, dmax=60)
    _os.environ["PSI_DINDEX_BUILD"] = "device"
    try:
        b = DistanceIndex.build(g, dmin=2, dmax=60)
    finally:
        del _os.environ["PSI_DINDEX_BUILD"]
    np.testing.assert_array_equal(np.asarray(a.src_indptr),
                                  np.asarray(b.src_indptr))
    np.testing.assert_array_equal(np.asarray(a.dst), np.asarray(b.dst))
    np.testing.assert_array_equal(np.asarray(a.iv_lo), np.asarray(b.iv_lo))
    np.testing.assert_array_equal(np.asarray(a.iv_hi), np.asarray(b.iv_hi))


@pytest.mark.parametrize("r1,r2", [
    ((8, 12), (13, 20)),   # adjacent ranges
    ((8, 15), (12, 25)),   # overlapping ranges
    ((5, 30), (10, 20)),   # containment
])
def test_cross_range_merge_equals_direct_build(r1, r2):
    """Merging indices built with DIFFERENT (dmin, dmax) ranges equals
    a direct build at the union range — the semantic the reference's
    dindexctl merge guarantees (ref: tools/src/dindexctl.cpp:115-216).
    Pinned on random DAGs for adjacent, overlapping and contained
    ranges."""
    for seed in range(3):
        g = _random_dag(np.random.RandomState(100 + seed), 100)
        a = DistanceIndex.build(g, *r1)
        b = DistanceIndex.build(g, *r2)
        m = a.merge(b)
        lo, hi = min(r1[0], r2[0]), max(r1[1], r2[1])
        direct = DistanceIndex.build(g, lo, hi)
        assert (m.dmin, m.dmax) == (lo, hi)
        np.testing.assert_array_equal(
            np.asarray(m.src_indptr), np.asarray(direct.src_indptr))
        np.testing.assert_array_equal(
            np.asarray(m.dst), np.asarray(direct.dst))
        np.testing.assert_array_equal(
            np.asarray(m.iv_lo), np.asarray(direct.iv_lo))
        np.testing.assert_array_equal(
            np.asarray(m.iv_hi), np.asarray(direct.iv_hi))


def test_cross_range_merge_rejects_gap():
    """Non-contiguous range unions are refused (a gap in the covered
    distance range would silently reject valid pairs)."""
    g = _random_dag(np.random.RandomState(7), 60)
    a = DistanceIndex.build(g, 5, 8)
    b = DistanceIndex.build(g, 20, 30)
    with pytest.raises(ValueError):
        a.merge(b)
