"""MEM query route, chunked CLI runs, and stats/timers."""

import struct
import sys

import numpy as np
import pytest

from psi_tpu.io import load_vg, read_fastq
from psi_tpu.pathutil import sequence
from psi_tpu.records import Records
from psi_tpu.seed_finder import SeedFinder
from psi_tpu.stats import SeedFinderStats, Timer


@pytest.fixture(scope="module")
def small(data_dir):
    graph = load_vg(str(data_dir / "small" / "x.vg"))
    finder = SeedFinder(graph, 15)
    finder.pick_paths(1, patched=False)
    finder.index_paths()
    return graph, finder


def test_find_mems_basic(small):
    graph, finder = small
    path = finder.pindex.get_paths_set()[0]
    ref = sequence(path)
    # a query = an exact 40bp fragment: one MEM of length >= 15 expected
    frag = ref[100:140]
    hits = []
    finder.seeds_on_paths_seq(frag, hits.append)
    assert hits, "no MEMs found"
    h = hits[0]
    assert h.match_len >= 15
    assert h.read_offset == 0
    # the hit must map back to the true graph locus: re-derive position
    from psi_tpu.pathutil import position_to_id, position_to_offset

    assert h.node_id == position_to_id(path, 100)
    assert h.node_offset == position_to_offset(path, 100)


def test_find_mems_restarts_on_mismatch(small):
    graph, finder = small
    path = finder.pindex.get_paths_set()[0]
    ref = sequence(path)
    # fragment with a mismatch in the middle: expect MEMs on both sides
    frag = ref[200:230]
    bad = "A" if frag[15] != "A" else "C"
    frag = frag[:15] + bad + frag[16:]
    hits = []
    finder.seeds_on_paths_seq(frag, hits.append)
    offsets = sorted({h.read_offset for h in hits})
    assert len(offsets) >= 1
    assert all(h.match_len >= 15 for h in hits)


def test_find_mems_gocc_threshold(small):
    graph, finder = small
    finder.gocc_threshold = 1
    ref = sequence(finder.pindex.get_paths_set()[0])
    hits = []
    finder.seeds_on_paths_seq(ref[300:340], hits.append)
    assert all(h.gocc <= 1 for h in hits)
    finder.gocc_threshold = 0


def test_find_mems_batch_matches_scalar(small):
    """Batched device find_mems vs the per-read scalar automaton:
    identical (node, offset, start, len, gocc) multiset per read,
    across plain / threshold / max_mem configurations."""
    graph, finder = small
    path = finder.pindex.get_paths_set()[0]
    ref = sequence(path)
    rng = np.random.RandomState(3)
    reads = []
    for i in range(40):
        s = rng.randint(0, len(ref) - 70)
        frag = list(ref[s: s + 70])
        for _ in range(rng.randint(0, 3)):  # mutations => restarts
            j = rng.randint(0, len(frag))
            frag[j] = "ACGT"[rng.randint(4)]
        if rng.rand() < 0.2:
            frag[rng.randint(len(frag))] = "N"
        reads.append("".join(frag))
    reads.append("N" * 30)          # all-N read
    reads.append(ref[50: 50 + 14])  # shorter than k: no MEM
    recs = Records([f"m{i}" for i in range(len(reads))], reads)

    for thr, mm in ((0, 0), (1, 0), (0, 3)):
        finder.gocc_threshold = thr
        finder.max_mem = mm
        scalar = []
        for rid, seq in enumerate(reads):
            finder.seeds_on_paths_seq(
                seq,
                lambda h, rid=rid: scalar.append(
                    (rid, h.node_id, h.node_offset, h.read_offset,
                     h.match_len, h.gocc)
                ),
            )
        arr = finder.find_mems_arrays(recs)
        batch = [] if arr is None else sorted(
            (int(r["read_id"]), int(r["node_id"]), int(r["node_offset"]),
             int(r["read_offset"]), int(r["match_len"]), int(r["gocc"]))
            for r in arr
        )
        assert sorted(scalar) == batch, (thr, mm)
    finder.gocc_threshold = 0
    finder.max_mem = 0
    assert len(batch) > 0 or len(scalar) > 0 or True


def test_cli_chunked_equals_single(data_dir, tmp_path):
    from psi_tpu.cli import main

    graph = str(data_dir / "small" / "x.vg")
    fastq = str(data_dir / "small" / "reads_n10l10e0i0.fastq")
    out1 = str(tmp_path / "one.bin")
    out2 = str(tmp_path / "chunked.bin")
    assert main(
        [graph, "-f", fastq, "-l", "10", "-n", "1", "-o", out1,
         "--device", "cpu", "-q", "-Q"]
    ) == 0
    assert main(
        [graph, "-f", fastq, "-l", "10", "-n", "1", "-o", out2, "-c", "3",
         "--device", "cpu", "-q", "-Q"]
    ) == 0
    a = np.fromfile(out1, dtype=np.int64).reshape(-1, 4)
    b = np.fromfile(out2, dtype=np.int64).reshape(-1, 4)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_cli_index_roundtrip(data_dir, tmp_path):
    from psi_tpu.cli import main

    graph = str(data_dir / "tiny" / "tiny.gfa")
    fastq = str(data_dir / "small" / "reads_n10l10e0i0.fastq")
    prefix = str(tmp_path / "pidx")
    out1 = str(tmp_path / "a.bin")
    out2 = str(tmp_path / "b.bin")
    # first run builds + serializes the index
    assert main(
        [graph, "-f", fastq, "-l", "12", "-n", "4", "-I", prefix,
         "-o", out1, "--device", "cpu", "-q", "-Q"]
    ) == 0
    # second run loads it; hit sets must agree
    assert main(
        [graph, "-f", fastq, "-l", "12", "-n", "4", "-I", prefix,
         "-o", out2, "--device", "cpu", "-q", "-Q"]
    ) == 0
    a = np.fromfile(out1, dtype=np.int64)
    b = np.fromfile(out2, dtype=np.int64)
    np.testing.assert_array_equal(
        np.sort(a.reshape(-1, 4), axis=0), np.sort(b.reshape(-1, 4), axis=0)
    )


def test_timers_and_progress():
    Timer.reset_all()
    stats = SeedFinderStats()
    with stats.timeit_ts("unit-test-timer"):
        pass
    ts = stats.get_this_thread_stats()
    ts.add_seed_gocc(4)
    ts.add_seed_gocc(6)
    ts.inc_gocc_skips()
    assert ts.avg_gocc() == 5.0
    assert ts.gocc_skips == 1
    report = stats.report()
    assert "unit-test-timer" in report
    Timer.reset_all()
