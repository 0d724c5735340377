"""End-to-end parity on the reference's larger bundled dataset,
middle/m.vg (ref: test/data/middle — exercised here for the first
time; tiny/small/multi are covered elsewhere): the full hybrid
pipeline (library API and psikt CLI) must reproduce the brute-force
oracle hit multiset exactly. Results recorded in docs/PARITY.md."""

import numpy as np
import pytest

from psi_tpu.io import load_vg
from psi_tpu.pathutil import Path, sequence
from psi_tpu.records import Records
from psi_tpu.seed_finder import SeedFinder

from tests.test_e2e_property import oracle_off_paths, oracle_on_paths


def _middle_graph(data_dir):
    return load_vg(str(data_dir / "middle" / "m.vg"))


def _sim_reads(graph, n_reads, read_len, seed):
    """Reads sampled from a random haplotype walk (crosses bubbles, so
    both query routes are load-bearing)."""
    from psi_tpu.graphiter import HaplotyperRandomIter

    itr = HaplotyperRandomIter(graph, seed=seed)
    hap = Path(graph)
    while not itr.at_end():
        hap.push_back(itr.value)
        itr.next()
    hs = sequence(hap)
    rng = np.random.RandomState(seed)
    starts = rng.randint(0, max(1, len(hs) - read_len), n_reads)
    return Records(
        [f"r{i}" for i in range(n_reads)],
        [hs[p: p + read_len] for p in starts],
    )


@pytest.mark.parametrize("gocc_threshold", [0, 5])
def test_middle_pipeline_matches_oracle(data_dir, gocc_threshold):
    graph = _middle_graph(data_dir)
    assert graph.get_path_count() > 0
    k = 12
    finder = SeedFinder(graph, k, gocc_threshold=gocc_threshold, rng_seed=0)
    finder.pick_paths(2, patched=True, context=k)
    finder.index_paths()
    finder.add_uncovered_loci()
    assert len(finder.get_starting_loci()) > 0

    reads = _sim_reads(graph, 40, 48, seed=5)
    seeds = finder.get_seeds(reads)
    index = finder.index_reads(seeds)
    got = finder.seeds_all_arrays(seeds, index)
    got_list = sorted(map(tuple, got.tolist()))
    expect = sorted(
        oracle_on_paths(finder, seeds) + oracle_off_paths(finder, seeds)
    )
    assert len(expect) > 0
    assert got_list == expect


def test_middle_cli_matches_oracle(data_dir, tmp_path):
    """psikt CLI on middle + simulated reads: the binary hit stream's
    (node, offset, read, read_offset) multiset equals the oracle's."""
    from psi_tpu.cli import main

    graph = _middle_graph(data_dir)
    reads = _sim_reads(graph, 30, 40, seed=11)
    fq = tmp_path / "m_reads.fastq"
    with open(fq, "w") as fh:
        for i, s in enumerate(reads.seqs):
            fh.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    out = tmp_path / "m_hits.bin"
    assert main(
        [str(data_dir / "middle" / "m.vg"), "-f", str(fq), "-l", "12",
         "-n", "2", "-e", "1", "-o", str(out), "--device", "cpu",
         "--devices", "1", "-q", "-Q"]
    ) == 0
    stream = np.fromfile(out, dtype=np.int64).reshape(-1, 4)
    assert len(stream) > 0

    # oracle with the CLI's exact configuration (patched paths, n=2,
    # context=k, step 1, same rng seed as the CLI default)
    k = 12
    finder = SeedFinder(graph, k, rng_seed=0)
    finder.pick_paths(2, patched=True, context=k)
    finder.index_paths()
    finder.add_uncovered_loci()
    seeds = finder.get_seeds(reads)
    expect = sorted(
        (int(n), int(o), int(r), int(ro))
        for n, o, r, ro, _, _ in (
            oracle_on_paths(finder, seeds) + oracle_off_paths(finder, seeds)
        )
    )
    got = sorted(map(tuple, stream.tolist()))
    assert got == expect
