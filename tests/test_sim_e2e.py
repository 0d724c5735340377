"""Simulator -> seed finder end-to-end with sequencing errors."""

import numpy as np
import pytest

from psi_tpu.io import load_vg, read_fastq
from psi_tpu.records import Records
from psi_tpu.seed_finder import SeedFinder
from psi_tpu.tools import ggsim


def test_errorful_reads_mostly_covered(data_dir, tmp_path):
    """Reads at 1% error rate: nearly all still carry an exact 20-mer
    seed and must be found by the hybrid engine."""
    graph_path = str(data_dir / "small" / "x.vg")
    reads_path = tmp_path / "reads.fastq"
    rc = ggsim.main(
        [graph_path, "-o", str(reads_path), "-l", "100", "-n", "300",
         "-e", "0.01", "-i", "0.1", "-S", "11", "-f", "-p", "2"]
    )
    assert rc == 0

    graph = load_vg(graph_path)
    finder = SeedFinder(graph, 20)
    finder.create_path_index(2, True, 20, 3)

    names, seqs = read_fastq(str(reads_path))
    assert len(seqs) >= 250
    reads = Records(names, seqs)
    seeds = finder.get_seeds(reads, 10)  # overlapping seeding, step 10
    index = finder.index_reads(seeds)
    hits = finder.seeds_all_arrays(seeds, index)
    covered = len(np.unique(hits["read_id"]))
    assert covered >= 0.95 * len(seqs), (covered, len(seqs))


def test_mismatch_tolerance_recovers_errorful_seeds(data_dir, tmp_path):
    """With m=2 tolerance the off-path engine finds seeds even where
    every window carries an error."""
    graph_path = str(data_dir / "tiny" / "tiny.gfa")
    from psi_tpu.io import load_gfa
    from psi_tpu.pathutil import sequence

    graph = load_gfa(graph_path)
    finder = SeedFinder(graph, 12, seed_mismatches=2)
    finder.pick_paths(1, patched=False)
    finder.index_paths()
    # force everything off-path: all loci as starting loci
    finder.set_starting_loci(
        [
            __import__("psi_tpu.graph", fromlist=["Position"]).Position(n, o)
            for n in range(1, graph.node_count + 1)
            for o in range(graph.node_length(n))
        ]
    )
    ref = sequence(finder.pindex.get_paths_set()[0])
    # a read with 2 errors in its single 12-mer window
    frag = list(ref[10:22])
    frag[3] = "A" if frag[3] != "A" else "C"
    frag[8] = "G" if frag[8] != "G" else "T"
    reads = Records(["r0"], ["".join(frag)])
    seeds = finder.get_seeds(reads)
    index = finder.index_reads(seeds)
    hits = []
    finder.seeds_off_paths(seeds, index, hits.append, device=False)
    assert any(h.read_id == 0 for h in hits)
