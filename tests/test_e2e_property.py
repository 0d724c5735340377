"""End-to-end randomized parity: full hybrid pipeline vs brute force.

For random pan-genome graphs and reads, the multiset of hits from
seeds_all (on-path batched FM route + off-path frontier traversal) must
equal the union of two brute-force oracles:
  * on-path: scan every indexed path sequence for every distinct seed;
  * off-path: enumerate every k-walk from every starting locus.
"""

import numpy as np
import pytest

from psi_tpu.pathutil import position_to_id, position_to_offset, sequence
from psi_tpu.records import Records
from psi_tpu.seed_finder import SeedFinder
from psi_tpu.simulate import make_pangenome_graph


def oracle_on_paths(finder, seeds):
    k = finder.seed_len
    pset = finder.pindex.get_paths_set()
    pseqs = [sequence(p) for p in pset]
    thr = finder.gocc_threshold or float("inf")
    from psi_tpu.ops.kmers import unpack_kmer

    by_key = {}
    for sid in range(len(seeds)):
        if seeds.valid[sid]:
            by_key.setdefault(int(seeds.keys[sid]), []).append(sid)
    hits = []
    for key, sid_list in by_key.items():
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
                    (nid, noff, seeds.read_id(sid), seeds.read_offset(sid),
                     k, len(occs))
                )
    return hits


def oracle_off_paths(finder, seeds):
    graph = finder.graph
    k = finder.seed_len
    lookup = {}
    for sid in range(len(seeds)):
        if seeds.valid[sid]:
            lookup.setdefault(int(seeds.keys[sid]), []).append(sid)
    from psi_tpu.ops.kmers import pack_kmers, seq_to_codes

    hits = []

    def walks(nid, off, acc):
        seq = graph.node_sequence(nid)
        acc2 = acc + seq[off: off + (k - len(acc))]
        if len(acc2) == k:
            yield acc2
            return
        if len(seq) - off > k - len(acc):  # didn't reach node end
            return
        for nb in graph.out_neighbors(nid):
            yield from walks(int(nb), 0, acc2)

    for locus in finder.get_starting_loci():
        for w in walks(locus.node_id(), locus.offset(), ""):
            if "N" in w:
                continue
            mat = seq_to_codes(w).reshape(1, -1)
            key, valid = pack_kmers(mat)
            if not valid[0]:
                continue
            sids = lookup.get(int(key[0]), [])
            for sid in sids:
                hits.append(
                    (locus.node_id(), locus.offset(), seeds.read_id(sid),
                     seeds.read_offset(sid), k, len(sids))
                )
    return hits


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("gocc_threshold", [0, 3])
def test_pipeline_matches_oracle(seed, gocc_threshold):
    rng = np.random.RandomState(seed)
    graph = make_pangenome_graph(
        3000, variant_rate=0.03, indel_frac=0.3, seed=seed,
        n_components=1 + (seed % 2),
    )
    k = 12
    finder = SeedFinder(graph, k, gocc_threshold=gocc_threshold, rng_seed=seed)
    finder.pick_paths(2, patched=True, context=k)
    finder.index_paths()
    finder.add_uncovered_loci()

    # reads sampled from random graph walks (may cross bubbles)
    from psi_tpu.graphiter import HaplotyperRandomIter
    from psi_tpu.pathutil import Path

    itr = HaplotyperRandomIter(graph, seed=seed + 1)
    hap = Path(graph)
    while not itr.at_end():
        hap.push_back(itr.value)
        itr.next()
    hs = sequence(hap)
    n_reads = 30
    starts = rng.randint(0, max(1, len(hs) - 40), n_reads)
    reads = Records(
        [f"r{i}" for i in range(n_reads)],
        [hs[p: p + 36] for p in starts],
    )
    seeds = finder.get_seeds(reads)
    index = finder.index_reads(seeds)
    got = finder.seeds_all_arrays(seeds, index)
    got_list = sorted(map(tuple, got.tolist()))

    expect = sorted(oracle_on_paths(finder, seeds) + oracle_off_paths(finder, seeds))
    assert got_list == expect
    assert len(expect) > 0
