"""Mismatch-tolerant on-path route vs brute-force Hamming scan."""

import numpy as np
import pytest

from psi_tpu.io import load_vg, read_fastq
from psi_tpu.ops.kmers import expand_hamming, pack_kmers, seq_to_codes, unpack_kmer
from psi_tpu.pathutil import position_to_id, position_to_offset, sequence
from psi_tpu.records import Records
from psi_tpu.seed_finder import SeedFinder


def test_expand_hamming_counts():
    keys, valid = pack_kmers(np.array([[0, 1, 2, 3]]))
    vk, vo = expand_hamming(keys, 4, 1)
    assert len(vk) == 1 + 4 * 3  # identity + 3 substitutions per position
    assert (vo == 0).all()
    # distance <= 2 ball size for k=4: 1 + 12 + C(4,2)*9 = 67
    vk2, _ = expand_hamming(keys, 4, 2)
    assert len(vk2) == 67
    # all within distance 2
    base = unpack_kmer(int(keys[0]), 4)
    for v in vk2:
        s = unpack_kmer(int(v), 4)
        assert sum(a != b for a, b in zip(s, base)) <= 2


def brute_hamming_on_paths(finder, seeds, m):
    k = finder.seed_len
    pset = finder.pindex.get_paths_set()
    pseqs = [sequence(p) for p in pset]
    thr = finder.gocc_threshold or float("inf")
    hits = []
    by_key = {}
    for sid in range(len(seeds)):
        if seeds.valid[sid]:
            by_key.setdefault(int(seeds.keys[sid]), []).append(sid)
    # occurrence counts of every window string
    window_count = {}
    windows = {}
    for pidx, ps in enumerate(pseqs):
        for i in range(len(ps) - k + 1):
            w = ps[i: i + k]
            window_count[w] = window_count.get(w, 0) + 1
            windows.setdefault(w, []).append((pidx, i))
    for key, sid_list in by_key.items():
        pat = unpack_kmer(key, k)
        matched_windows = {
            w for w in windows
            if sum(a != b for a, b in zip(w, pat)) <= m
        }
        for w in matched_windows:
            if window_count[w] > thr:
                continue
            for pidx, fwd in windows[w]:
                nid = position_to_id(pset[pidx], fwd)
                noff = position_to_offset(pset[pidx], fwd)
                for sid in sid_list:
                    hits.append(
                        (nid, noff, seeds.read_id(sid),
                         seeds.read_offset(sid), k, window_count[w])
                    )
    return sorted(hits)


@pytest.mark.parametrize("m", [1, 2])
def test_onpath_approx_matches_bruteforce(data_dir, m):
    graph = load_vg(str(data_dir / "small" / "x.vg"))
    names, seqs = read_fastq(
        str(data_dir / "small" / "reads_n10000l100e0i0.fastq"), 40
    )
    finder = SeedFinder(graph, 12, seed_mismatches=m)
    finder.pick_paths(1, patched=False)
    finder.index_paths()
    reads = Records(names, seqs)
    seeds = finder.get_seeds(reads)
    index = finder.index_reads(seeds)
    got = finder.seeds_on_paths_arrays(seeds, index)
    got_list = sorted(map(tuple, got.tolist())) if got is not None else []
    expect = brute_hamming_on_paths(finder, seeds, m)
    assert got_list == expect
    assert len(expect) > 0
