"""Full toolchain workflow: simulate -> find seeds -> analyse.

ggsim (GAM truth) -> psikt (hit stream) -> GAF projection -> alice
analyse against the truth, exercising the whole tool surface together.
"""

import json

import numpy as np
import pytest

from psi_tpu.io import load_gfa
from psi_tpu.io.vgio import read_gam
from psi_tpu.tools import alice, ggsim


def test_simulate_find_analyse(data_dir, tmp_path, capsys):
    graph_path = str(data_dir / "tiny" / "tiny.gfa")
    graph = load_gfa(graph_path)

    # 1. simulate reads with GAM truth
    gam = tmp_path / "truth.gam"
    fastq = tmp_path / "reads.fastq"
    assert ggsim.main(
        [graph_path, "-o", str(gam), "-t", "gam", "-l", "12", "-n", "12",
         "-S", "9", "-f", "-p", "2"]
    ) == 0
    truth = read_gam(str(gam))
    # write the fastq twin (same seed -> same reads)
    assert ggsim.main(
        [graph_path, "-o", str(fastq), "-t", "fastq", "-l", "12", "-n", "12",
         "-S", "9", "-f", "-p", "2"]
    ) == 0

    # 2. find seeds via the CLI
    from psi_tpu.cli import main as psikt

    hits_bin = tmp_path / "hits.bin"
    report = tmp_path / "report.json"
    assert psikt(
        [graph_path, "-f", str(fastq), "-l", "12", "-n", "4",
         "-o", str(hits_bin), "--device", "cpu", "-q", "-Q",
         "--report", str(report)]
    ) == 0
    hits = np.fromfile(hits_bin, dtype=np.int64).reshape(-1, 4)
    assert len(hits) >= len(truth)  # every error-free read found
    rep = json.loads(report.read_text())
    assert rep["coveredreads"] == len(truth)

    # 3. project hits to GAF (one line per read's first hit) and analyse
    names, _ = __import__("psi_tpu.io", fromlist=["read_fastq"]).read_fastq(
        str(fastq)
    )
    first_hit = {}
    for nid, noff, rid, roff in hits:
        if rid not in first_hit:
            first_hit[rid] = (nid, noff)
    gaf = tmp_path / "aln.gaf"
    with open(gaf, "w") as fh:
        for rid, (nid, noff) in sorted(first_hit.items()):
            cid = graph.coordinate_id(int(nid))
            fh.write(
                f"{names[rid]}\t12\t0\t12\t+\t>{cid}\t"
                f"{graph.node_length(int(nid))}\t{noff}\t"
                f"{min(noff + 12, graph.node_length(int(nid)))}\t12\t12\t60\n"
            )

    # truth GAF from the GAM records
    tgaf = tmp_path / "truth.gaf"
    with open(tgaf, "w") as fh:
        for rec in truth:
            nid, noff, _rev = rec["path"][0]
            ln = graph.node_length(graph.id_by_coordinate(nid))
            fh.write(
                f"{rec['name']}\t12\t0\t12\t+\t>{nid}\t{ln}\t{noff}\t"
                f"{min(noff + 12, ln)}\t12\t12\t60\n"
            )

    rc = alice.main(
        ["analyse", str(gaf), "-g", graph_path, "-T", str(tgaf)]
    )
    assert rc == 0
    out = capsys.readouterr().out
    # every read has a seed; the first hit matches the truth locus for
    # the majority (alternate-path hits can differ legitimately)
    fields = dict(
        line.split(": ") for line in out.strip().splitlines()
    )
    assert float(fields["recall"]) >= 0.5
    assert int(fields["true positives"]) + int(fields["false positives"]) == len(first_hit)
