"""Tools-suite tests (ggsim, pindexctl, loci_stats, sloci, dindexctl, alice)."""

import subprocess
import sys

import numpy as np
import pytest

from psi_tpu.tools import alice, dindexctl, ggsim, loci_stats, pindexctl, sloci


@pytest.fixture
def tiny_path(data_dir):
    return str(data_dir / "tiny" / "tiny.gfa")


def test_ggsim_reads(tiny_path, tmp_path):
    out = tmp_path / "reads.fastq"
    rc = ggsim.main(
        [tiny_path, "-o", str(out), "-p", "2", "-l", "12", "-n", "20",
         "-S", "7", "-f"]
    )
    assert rc == 0
    from psi_tpu.io import read_fastq

    names, seqs = read_fastq(str(out))
    assert len(seqs) == 20
    assert all(len(s) == 12 for s in seqs)
    # error-free forward reads must occur in some haplotype sequence
    from psi_tpu.io import load_gfa

    graph = load_gfa(tiny_path)
    # sanity: reads are ACGT only
    assert all(set(s) <= set("ACGT") for s in seqs)


def test_ggsim_haplotypes(tiny_path, tmp_path):
    out = tmp_path / "haps.fa"
    rc = ggsim.main([tiny_path, "-o", str(out), "-p", "3", "-t", "haplotypes"])
    assert rc == 0
    text = out.read_text()
    assert text.count(">") == 3


def test_ggsim_paired(tiny_path, tmp_path):
    out = tmp_path / "pe.fastq"
    rc = ggsim.main(
        [tiny_path, "-o", str(out), "-l", "10", "-n", "10", "-d", "30",
         "-S", "3", "-f"]
    )
    assert rc == 0
    from psi_tpu.io import read_fastq

    names, seqs = read_fastq(str(out))
    assert len(names) % 2 == 0
    assert any(n.endswith("/1") for n in names)
    assert any(n.endswith("/2") for n in names)


def test_pindexctl_inspect(tiny_path, tmp_path, capsys):
    from psi_tpu.io import load_gfa
    from psi_tpu.seed_finder import SeedFinder

    graph = load_gfa(tiny_path)
    finder = SeedFinder(graph, 12)
    finder.create_path_index(4, True, 12)
    prefix = str(tmp_path / "pidx")
    assert finder.serialize_path_index(prefix)

    rc = pindexctl.main(
        ["inspect", tiny_path, "-I", prefix, "-l", "12"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "number of paths:" in out
    assert "uncovered loci: 8" in out


def test_pindexctl_to_gam_loci_edits(tiny_path, tmp_path):
    """GAM export marks starting loci as 1-bp "S" edits inside each
    mapping (ref: pindexctl.cpp:100-131 over
    path_interface.hpp:842-942); match-run lengths reconstruct the
    label spans exactly."""
    import gzip

    from psi_tpu.io import load_gfa, vgio
    from psi_tpu.seed_finder import SeedFinder

    graph = load_gfa(tiny_path)
    finder = SeedFinder(graph, 12)
    finder.create_path_index(4, True, 12)
    prefix = str(tmp_path / "pidx")
    assert finder.serialize_path_index(prefix)
    loci = {(l.node_id(), l.offset()) for l in finder.get_starting_loci()}
    assert loci  # tiny k=12 n=4 has 8 uncovered loci

    out = str(tmp_path / "paths.gam")
    rc = pindexctl.main(
        ["to-gam", tiny_path, "-I", prefix, "-o", out, "-l", "12"]
    )
    assert rc == 0

    # decode the GAM stream and collect S-edit loci
    with gzip.open(out, "rb") as fh:
        data = memoryview(fh.read())
    pos = 0
    s_loci = set()
    count, pos = vgio._read_varint(data, pos)
    for i in range(count):
        size, pos = vgio._read_varint(data, pos)
        msg = data[pos: pos + size]
        pos += size
        if bytes(msg) == b"GAM":
            continue
        for f, _, val in vgio._iter_fields(msg):
            if f != 2:  # Alignment.path
                continue
            for f2, _, mp in vgio._iter_fields(val):
                if f2 != 2:  # Path.mapping
                    continue
                nid = off0 = 0
                cursor = None
                for f3, _, v3 in vgio._iter_fields(mp):
                    if f3 == 1:  # position
                        nid, _rev = vgio._decode_position_node(v3)
                        for f4, _, v4 in vgio._iter_fields(v3):
                            if f4 == 2:
                                off0 = v4
                        cursor = off0
                    elif f3 == 2:  # edit
                        from_len, seq = 0, b""
                        for f4, _, v4 in vgio._iter_fields(v3):
                            if f4 == 1:
                                from_len = v4
                            elif f4 == 3:
                                seq = bytes(v4)
                        if seq == b"S":
                            s_loci.add((nid, cursor))
                        cursor += from_len
    # every marked locus is a real starting locus
    internal = {
        (graph.id_by_coordinate(c), o) for c, o in s_loci
    }
    assert internal and internal <= loci

    # --no-loci: no S edits at all
    out2 = str(tmp_path / "plain.gam")
    rc = pindexctl.main(
        ["to-gam", tiny_path, "-I", prefix, "-o", out2, "-l", "12", "-L"]
    )
    assert rc == 0
    with gzip.open(out2, "rb") as fh:
        assert b"S" not in fh.read()[20:]  # no S edit payloads


def test_loci_stats_and_sloci(tiny_path, tmp_path, capsys):
    from psi_tpu.io import load_gfa
    from psi_tpu.seed_finder import SeedFinder

    graph = load_gfa(tiny_path)
    finder = SeedFinder(graph, 12)
    finder.create_path_index(4, True, 12)
    prefix = str(tmp_path / "pidx")
    finder.serialize_path_index(prefix)

    rc = loci_stats.main([prefix, "-l", "12", "-c"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "8"

    loci_file = SeedFinder.get_sloci_filepath(prefix, 12, 1) + ".npy"
    tsv = tmp_path / "loci.tsv"
    rc = sloci.main(["export", loci_file, "-o", str(tsv)])
    assert rc == 0
    assert len(tsv.read_text().splitlines()) == 8

    back = tmp_path / "back.npy"
    rc = sloci.main(["import", str(tsv), "-o", str(back)])
    assert rc == 0
    np.testing.assert_array_equal(np.load(loci_file), np.load(back))

    rc = sloci.main(["info", loci_file])
    assert rc == 0
    assert "loci: 8" in capsys.readouterr().out


def test_dindexctl_build_verify_stats_merge(tiny_path, tmp_path, capsys):
    out1 = str(tmp_path / "d1.npz")
    rc = dindexctl.main(
        ["build", tiny_path, "-m", "8", "-M", "12", "-o", out1,
         "--verify", "5"]
    )
    assert rc == 0

    out2 = str(tmp_path / "d2.npz")
    rc = dindexctl.main(["build", tiny_path, "-m", "13", "-M", "20", "-o", out2])
    assert rc == 0

    merged = str(tmp_path / "dm.npz")
    rc = dindexctl.main(["merge", out1, out2, "-o", merged])
    assert rc == 0

    from psi_tpu.dindex import DistanceIndex
    from psi_tpu.io import load_gfa

    graph = load_gfa(tiny_path)
    m = DistanceIndex.load(merged)
    assert m.dmin == 8 and m.dmax == 20
    # (1,0)->(7,0) is distance 13: rejected by [8,12], accepted by merged
    d1 = DistanceIndex.load(out1)
    assert not d1.verify(graph, 1, 0, 7, 0)
    assert m.verify(graph, 1, 0, 7, 0)

    rc = dindexctl.main(["stats", merged])
    assert rc == 0
    assert "dmin: 8" in capsys.readouterr().out


def test_alice_gaf_parse_and_analyse(tiny_path, tmp_path, capsys):
    gaf = tmp_path / "aln.gaf"
    truth = tmp_path / "truth.gaf"
    line = "read0\t10\t0\t10\t+\t>1>2\t9\t0\t9\t10\t10\t60\n"
    bad = "read1\t10\t0\t10\t+\t>3>5\t2\t0\t2\t5\t10\t60\n"
    gaf.write_text(line + bad)
    truth.write_text(line + "read1\t10\t0\t10\t+\t>1\t8\t2\t8\t10\t10\t60\n")

    recs = alice.read_gaf(str(gaf))
    assert recs[0].qname == "read0"
    assert recs[0].path == [(1, False), (2, False)]
    assert recs[0].identity == 1.0

    rc = alice.main(
        ["analyse", str(gaf), "-g", tiny_path, "-T", str(truth)]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "true positives: 1" in out
    assert "false positives: 1" in out


def test_alice_dstats(tiny_path, tmp_path, capsys):
    out1 = str(tmp_path / "d.npz")
    dindexctl.main(["build", tiny_path, "-m", "8", "-M", "12", "-o", out1])
    gaf = tmp_path / "pairs.gaf"
    # pair: end of read1 at (1,0), start of read2 at (6,0): distance 10 ok
    gaf.write_text(
        "p0/1\t1\t0\t1\t+\t>1\t8\t0\t1\t1\t1\t60\n"
        "p0/2\t5\t0\t5\t+\t>6>8\t4\t0\t4\t5\t5\t60\n"
        # pair too far: end (1,0) -> (7,0) distance 13
        "p1/1\t1\t0\t1\t+\t>1\t8\t0\t1\t1\t1\t60\n"
        "p1/2\t4\t0\t4\t+\t>7\t1\t0\t1\t4\t4\t60\n"
    )
    rc = alice.main(
        ["dstats", str(gaf), "-g", tiny_path, "-d", out1]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "pairs: 2" in out
    assert "accepted: 1" in out
    assert "rejected: 1" in out
