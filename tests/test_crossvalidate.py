"""Cross-validation of independent matching implementations on random
texts (mirrors the reference strategy, ref: test_indexiter.cpp:131-402:
result-set equality between implementations, not golden files)."""

import numpy as np
import pytest

from psi_tpu.fmindex import FMIndex
from psi_tpu.ops.kmers import unpack_kmer


def finder_route(fm, lengths, keys, k):
    """Per-seed backward search (the reference's Finder-form
    kmer_exact_matches, ref: index_iter.hpp:908-926): occurrences as
    (string_id, fwd_offset) per distinct k-mer."""
    out = {}
    for key in np.unique(keys):
        pat = unpack_kmer(int(key), k)
        lo, hi = fm.backward_search(pat[::-1])
        occs = []
        sid, q = fm.text_pos_to_string(fm.locate(lo, hi))
        for s, qq in zip(sid, q):
            occs.append((int(s), int(lengths[s] - qq - k)))
        out[int(key)] = sorted(occs)
    return out


def batched_route(fm, lengths, keys, k):
    """Batched device search (the engine's route)."""
    import jax.numpy as jnp

    from psi_tpu.ops import fm as fm_ops

    uniq = np.unique(keys)
    arrays = fm_ops.to_device(fm, dense_occ=True)
    lo, hi = fm_ops.backward_search_codes(
        arrays, jnp.asarray(fm_ops.keys_to_codes(uniq, k))
    )
    lo, hi = np.asarray(lo), np.asarray(hi)
    out = {}
    for i, key in enumerate(uniq):
        sid, q = fm.text_pos_to_string(fm.sa[lo[i]: hi[i]])
        out[int(key)] = sorted(
            (int(s), int(lengths[s] - qq - k)) for s, qq in zip(sid, q)
        )
    return out


def scan_route(strings, keys, k):
    """Plain text scan."""
    out = {}
    for key in np.unique(keys):
        pat = unpack_kmer(int(key), k)
        occs = []
        for sid, s in enumerate(strings):
            st = 0
            while True:
                i = s.find(pat, st)
                if i < 0:
                    break
                occs.append((sid, i))
                st = i + 1
        out[int(key)] = sorted(occs)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_three_routes_agree(seed):
    rng = np.random.RandomState(seed)
    k = int(rng.randint(4, 14))
    strings = [
        "".join(rng.choice(list("ACGT"), size=rng.randint(k, 200)))
        for _ in range(rng.randint(2, 6))
    ]
    fm = FMIndex.build_from_strings([s[::-1] for s in strings])
    lengths = np.array([len(s) for s in strings])

    from psi_tpu.ops.kmers import pack_kmers, seq_to_codes

    kmers = []
    for _ in range(30):
        s = strings[rng.randint(len(strings))]
        if len(s) >= k:
            st = rng.randint(0, len(s) - k + 1)
            kmers.append(s[st: st + k])
    for _ in range(10):
        kmers.append("".join(rng.choice(list("ACGT"), size=k)))
    keys, valid = pack_kmers(np.stack([seq_to_codes(km) for km in kmers]))
    keys = keys[valid]

    a = finder_route(fm, lengths, keys, k)
    b = batched_route(fm, lengths, keys, k)
    c = scan_route(strings, keys, k)
    assert a == b == c
