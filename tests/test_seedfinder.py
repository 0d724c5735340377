"""SeedFinder orchestration tests (mirrors reference [seedfinder] suite)."""

import numpy as np
import pytest

from psi_tpu.graph import Position
from psi_tpu.io import load_gfa, load_vg, read_fastq
from psi_tpu.pathutil import position_to_id, position_to_offset, sequence
from psi_tpu.records import Records
from psi_tpu.seed_finder import SeedFinder


@pytest.fixture
def tiny(data_dir):
    return load_gfa(str(data_dir / "tiny" / "tiny.gfa"))


def test_uncovered_loci_truth(tiny):
    """(ref: test_seedfinder.cpp:85-128): k=12, 4 patched paths."""
    finder = SeedFinder(tiny, 12)
    finder.pick_paths(4, patched=True, context=12)
    finder.index_paths()
    finder.add_uncovered_loci()
    truth = [(1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (1, 7), (2, 0), (3, 0)]
    got = [(l.node_id(), l.offset()) for l in finder.get_starting_loci()]
    assert got == truth


def test_uncovered_loci_all_covered(tiny):
    """(ref: test_seedfinder.cpp:130-145): 8 patched paths cover all."""
    finder = SeedFinder(tiny, 12)
    finder.pick_paths(8, patched=True, context=12)
    finder.index_paths()
    finder.add_uncovered_loci()
    assert len(finder.get_starting_loci()) == 0


def test_uncovered_loci_unpatched_32(tiny):
    """(ref: test_seedfinder.cpp:147-163): 32 full paths, k=45."""
    finder = SeedFinder(tiny, 45)
    finder.pick_paths(32, patched=False)
    finder.index_paths()
    finder.add_uncovered_loci()
    assert len(finder.get_starting_loci()) == 0


def test_starts_save_load(tiny, tmp_path):
    """(ref: test_seedfinder.cpp:167-213)"""
    finder = SeedFinder(tiny, 12)
    for i in range(325, 0, -4):
        finder.add_start(i, i % 17)
    prefix = str(tmp_path / "idx")
    finder.save_starts(prefix, 12, 10)
    finder.set_starting_loci([])
    assert finder.open_starts(prefix, 12, 10)
    loci = finder.get_starting_loci()
    assert len(loci) == 82
    i = 325
    for l in loci:
        assert l.node_id() == i
        assert l.offset() == i % 17
        i -= 4


DISTANT = [
    (1, 0, 1, 0), (1, 0, 1, 1), (1, 0, 1, 3), (1, 0, 1, 6), (1, 0, 1, 7),
    (1, 0, 7, 0), (2, 0, 9, 10), (9, 1, 9, 14), (9, 5, 9, 18),
    (9, 18, 11, 0), (9, 18, 11, 3), (9, 18, 15, 0), (9, 18, 15, 6),
]
CLOSED = [
    (1, 0, 2, 0), (1, 0, 6, 0), (1, 0, 6, 2), (9, 0, 9, 8), (9, 1, 9, 13),
    (9, 10, 9, 18), (9, 6, 9, 18), (9, 18, 15, 1), (9, 18, 15, 5),
]


@pytest.mark.parametrize("dataset", ["tiny", "multi"])
def test_distance_index_truth(data_dir, tmp_path, dataset):
    """(ref: test_seedfinder.cpp:215-418): accept/reject tables at
    dmin=8, dmax=12 on tiny and multi (coordinates are per-component
    identical in multi's first component)."""
    if dataset == "tiny":
        graph = load_vg(str(data_dir / "tiny" / "tiny.vg"))
    else:
        graph = load_vg(str(data_dir / "multi" / "multi.vg"))
    finder = SeedFinder(graph, 30)
    finder.create_distance_index(8, 12, per_component=True)

    ibyc = graph.id_by_coordinate
    for v, o, u, p in DISTANT:
        assert not finder.verify_distance(ibyc(v), o, ibyc(u), p), (v, o, u, p)
    for v, o, u, p in CLOSED:
        assert finder.verify_distance(ibyc(v), o, ibyc(u), p), (v, o, u, p)

    # save/load round trip
    prefix = str(tmp_path / "d")
    assert finder.save_distance_index(prefix)
    finder2 = SeedFinder(graph, 30)
    assert finder2.open_distance_index(prefix, 8, 12)
    for v, o, u, p in DISTANT:
        assert not finder2.verify_distance(ibyc(v), o, ibyc(u), p)
    for v, o, u, p in CLOSED:
        assert finder2.verify_distance(ibyc(v), o, ibyc(u), p)


def test_distance_batch_matches_scalar(data_dir):
    graph = load_vg(str(data_dir / "tiny" / "tiny.vg"))
    finder = SeedFinder(graph, 30)
    finder.create_distance_index(8, 12)
    all_q = DISTANT + CLOSED
    v = np.array([q[0] for q in all_q])
    o = np.array([q[1] for q in all_q])
    u = np.array([q[2] for q in all_q])
    p = np.array([q[3] for q in all_q])
    got = finder.dindex.verify_batch(graph, v, o, u, p)
    expect = np.array(
        [finder.verify_distance(*q) for q in all_q]
    )
    np.testing.assert_array_equal(got, expect)


# === seeds_on_paths parity vs brute force ===================================


def brute_seeds_on_paths(finder, seeds):
    """Oracle: enumerate distinct seed k-mers, scan path sequences."""
    k = finder.seed_len
    pset = finder.pindex.get_paths_set()
    pseqs = [sequence(p) for p in pset]
    thr = finder.gocc_threshold or float("inf")
    from psi_tpu.ops.kmers import unpack_kmer

    hits = []
    seen = {}
    for sid in range(len(seeds)):
        if not seeds.valid[sid]:
            continue
        key = int(seeds.keys[sid])
        seen.setdefault(key, []).append(sid)
    for key, sid_list in seen.items():
        pat = unpack_kmer(key, k)
        occs = []
        for pidx, ps in enumerate(pseqs):
            st = 0
            while True:
                i = ps.find(pat, st)
                if i < 0:
                    break
                occs.append((pidx, i))
                st = i + 1
        if not occs or len(occs) > thr:
            continue
        for pidx, fwd in occs:
            nid = position_to_id(pset[pidx], fwd)
            noff = position_to_offset(pset[pidx], fwd)
            for sid in sid_list:
                hits.append(
                    (nid, noff, seeds.read_id(sid), seeds.read_offset(sid), k, len(occs))
                )
    return sorted(hits)


@pytest.mark.parametrize("gocc_threshold", [0, 2])
def test_seeds_on_paths_parity_small(data_dir, gocc_threshold):
    graph = load_vg(str(data_dir / "small" / "x.vg"))
    names, seqs = read_fastq(
        str(data_dir / "small" / "reads_n10000l100e0i0.fastq"), 200
    )
    finder = SeedFinder(graph, 20, gocc_threshold=gocc_threshold)
    finder.pick_paths(2, patched=False)
    finder.index_paths()
    reads = Records(names, seqs)
    seeds = finder.get_seeds(reads)
    index = finder.index_reads(seeds)
    got = []
    finder.seeds_on_paths(seeds, index, lambda h: got.append(tuple(h)))
    expect = brute_seeds_on_paths(finder, seeds)
    assert sorted(got) == expect
    assert len(expect) > 0


def test_seeds_all_covers_reads(data_dir):
    """End-to-end: path route + traversal route find every error-free read."""
    graph = load_vg(str(data_dir / "small" / "x.vg"))
    names, seqs = read_fastq(str(data_dir / "small" / "reads_n10l10e0i0.fastq"))
    finder = SeedFinder(graph, 10)
    finder.pick_paths(1, patched=False)
    finder.index_paths()
    finder.add_uncovered_loci()
    reads = Records(names, seqs)
    seeds = finder.get_seeds(reads)
    index = finder.index_reads(seeds)
    hits = []
    finder.seeds_all(seeds, index, lambda h: hits.append(h))
    covered = {h.read_id for h in hits}
    assert covered == set(range(10))


def test_device_locate_route_matches_host(data_dir, monkeypatch):
    """The device-side locate+map (ops/fm.locate_map_device) must produce
    the exact hit multiset of the host NumPy route."""
    graph = load_vg(str(data_dir / "small" / "x.vg"))
    names, seqs = read_fastq(
        str(data_dir / "small" / "reads_n10000l100e0i0.fastq"), 200
    )
    reads = Records(names, seqs)

    def run(env_val):
        monkeypatch.setenv("PSI_DEVICE_LOCATE", env_val)
        finder = SeedFinder(graph, 20)
        finder.pick_paths(2, patched=True, context=20)
        finder.index_paths()
        seeds = finder.get_seeds(reads)
        index = finder.index_reads(seeds)
        arr = finder.seeds_on_paths_arrays(seeds, index)
        return sorted(map(tuple, arr.tolist()))

    assert run("1") == run("0")


def test_native_emit_join_engaged_and_identical(monkeypatch):
    """The fused native emission (psi_emit_join) must engage on the
    chain route and produce the exact row ORDER of the NumPy join +
    cross-product (not just the multiset)."""
    import psi_tpu.native as native_mod
    from psi_tpu.graph import Graph
    from psi_tpu.records import Records
    from psi_tpu.seed_finder import SeedFinder

    if native_mod._load() is None or not hasattr(
        native_mod._load(), "psi_emit_join"
    ):
        pytest.skip("native library unavailable")
    monkeypatch.setenv("PSI_STREAM", "1")
    monkeypatch.setenv("PSI_CHAIN_EAGER", "1")
    monkeypatch.setenv("PSI_DEVICE_LOCATE", "1")

    calls = {"n": 0}
    orig = SeedFinder._emit_join_native

    def wrapped(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(SeedFinder, "_emit_join_native", wrapped)

    rng = np.random.RandomState(1)
    s = "".join(rng.choice(list("ACGT"), size=20000))
    g = Graph.from_parts(
        nodes={1: s[:10000], 2: s[10000:]}, edges=[(1, 2)],
        paths=[("ref", [1, 2])],
    )

    def run():
        f = SeedFinder(g, seed_len=13)
        f.create_path_index(n=1, patched=False)
        rng2 = np.random.RandomState(2)
        reads = [s[p: p + 50] for p in rng2.randint(0, 19000, size=300)]
        chunk = Records([f"r{i}" for i in range(len(reads))], reads)
        seeds = f.get_seeds(chunk)
        idx = f.index_reads(seeds)
        return f.seeds_on_paths_arrays(seeds, idx)

    a = run()
    n_native = calls["n"]
    assert n_native >= 1, "chain raw branch never engaged"
    monkeypatch.setenv("PSI_NO_NATIVE", "1")
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", False)
    b = run()
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", False)
    assert len(a) == len(b)
    assert (a == b).all()
