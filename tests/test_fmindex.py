"""FM-index tests (mirrors reference [fmindex]/[index][iterator] suites):
suffix array vs brute force, count/locate vs Python scan, device batched
backward search vs host reference."""

import numpy as np
import pytest

from psi_tpu.fmindex import FMIndex, encode, suffix_array
from psi_tpu.ops import fm as fm_ops
from psi_tpu.ops.kmers import extract_kmers, pack_kmers, seq_to_codes, unpack_kmer


def brute_suffix_array(codes):
    n = len(codes)
    sufs = [tuple(codes[i:]) for i in range(n)]
    return np.array(sorted(range(n), key=lambda i: sufs[i]), dtype=np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [1, 2, 13, 100, 257])
def test_suffix_array_matches_bruteforce(seed, n):
    rng = np.random.RandomState(seed)
    codes = rng.randint(0, 6, size=n).astype(np.uint8)
    np.testing.assert_array_equal(suffix_array(codes), brute_suffix_array(codes))


def brute_occurrences(strings, pattern):
    out = []
    for sid, s in enumerate(strings):
        start = 0
        while True:
            i = s.find(pattern, start)
            if i < 0:
                break
            out.append((sid, i))
            start = i + 1
    return sorted(out)


def test_count_locate_stringset():
    strings = ["ACGTACGTAC", "TTACGA", "GGGG", "ACACAC"]
    fm = FMIndex.build_from_strings(strings)
    for pat in ["AC", "ACGT", "G", "GGGG", "TTT", "CA", "A", "ACGTACGTAC"]:
        expect = brute_occurrences(strings, pat)
        assert fm.count(pat) == len(expect), pat
        assert fm.occurrences(pat) == expect, pat


def test_count_random_texts():
    rng = np.random.RandomState(7)
    strings = [
        "".join(rng.choice(list("ACGT"), size=rng.randint(20, 80)))
        for _ in range(6)
    ]
    fm = FMIndex.build_from_strings(strings)
    for _ in range(50):
        plen = rng.randint(1, 12)
        src = rng.randint(0, len(strings))
        s = strings[src]
        if len(s) >= plen:
            start = rng.randint(0, len(s) - plen + 1)
            pat = s[start: start + plen]
        else:
            continue
        expect = brute_occurrences(strings, pat)
        assert fm.count(pat) == len(expect)
        assert fm.occurrences(pat) == expect


def test_sample_long_sequence(data_dir):
    text = (data_dir / "text" / "sample_long_sequence.txt").read_text().strip()
    fm = FMIndex.build_from_strings([text])
    rng = np.random.RandomState(3)
    for _ in range(20):
        plen = rng.randint(2, 30)
        start = rng.randint(0, len(text) - plen)
        pat = text[start: start + plen]
        expect = brute_occurrences([text], pat)
        assert fm.count(pat) == len(expect)
        assert fm.occurrences(pat) == expect


def test_save_load_roundtrip(tmp_path):
    strings = ["ACGTACGT", "TGCA"]
    fm = FMIndex.build_from_strings(strings)
    fm.save(str(tmp_path / "idx"))
    fm2 = FMIndex.load(str(tmp_path / "idx"))
    assert fm2.count("ACGT") == fm.count("ACGT")
    assert fm2.occurrences("GC") == fm.occurrences("GC")


# --- packed k-mers ----------------------------------------------------------


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    k = 11
    mat = rng.randint(0, 4, size=(20, k))
    keys, valid = pack_kmers(mat)
    assert valid.all()
    for row, key in zip(mat, keys):
        s = "".join("ACGT"[c] for c in row)
        assert unpack_kmer(int(key), k) == s


def test_pack_invalid_n():
    mat = np.array([[0, 1, 2], [0, -1, 3]])
    keys, valid = pack_kmers(mat)
    assert valid.tolist() == [True, False]


def test_extract_kmers_seeding():
    # non-overlapping seeding semantics: starts at 0, k, 2k ... while fit
    seqs = ["ACGTACGTAC", "AANGT"]
    keys, valid, seedmap = extract_kmers(seqs, k=4, step=4)
    # seq0: starts 0,4 ; seq1 (len 5): start 0 only
    assert seedmap.tolist() == [[0, 0], [0, 4], [1, 0]]
    assert valid.tolist() == [True, True, False]
    assert unpack_kmer(int(keys[0]), 4) == "ACGT"
    assert unpack_kmer(int(keys[1]), 4) == "ACGT"


# --- device batched search --------------------------------------------------


def test_device_backward_search_matches_host():
    rng = np.random.RandomState(11)
    strings = [
        "".join(rng.choice(list("ACGT"), size=rng.randint(30, 120)))
        for _ in range(5)
    ]
    # index over REVERSED strings, query with forward-order char feed
    fm = FMIndex.build_from_strings([s[::-1] for s in strings])
    arrays = fm_ops.to_device(fm)

    k = 8
    # batch: half substrings (present), half random (mostly absent)
    kmers = []
    for _ in range(64):
        s = strings[rng.randint(len(strings))]
        start = rng.randint(0, len(s) - k + 1)
        kmers.append(s[start: start + k])
    for _ in range(64):
        kmers.append("".join(rng.choice(list("ACGT"), size=k)))

    mat = np.stack([seq_to_codes(s) for s in kmers])
    keys, valid = pack_kmers(mat)
    assert valid.all()

    import jax.numpy as jnp

    lo, hi = fm_ops.backward_search_codes(
        arrays, jnp.asarray(fm_ops.keys_to_codes(keys, k))
    )
    lo, hi = np.asarray(lo), np.asarray(hi)

    for i, km in enumerate(kmers):
        # forward-order feed over reversed text == occurrences of reversed kmer
        hlo, hhi = fm.backward_search(km[::-1])
        assert hi[i] - lo[i] == hhi - hlo, km
        if hhi > hlo:  # empty-range values are route-specific
            assert (lo[i], hi[i]) == (hlo, hhi), km

    # locate parity on non-empty ranges
    widths = hi - lo
    maxw = int(widths.max())
    pos, mask = fm_ops.locate_ranges(arrays, jnp.asarray(lo), jnp.asarray(hi), maxw)
    pos, mask = np.asarray(pos), np.asarray(mask)
    for i in range(len(kmers)):
        got = sorted(pos[i][mask[i]].tolist())
        expect = sorted(fm.locate(lo[i], hi[i]).tolist())
        assert got == expect


def test_bitplane_rank_matches_checkpointed():
    rng = np.random.RandomState(21)
    strings = [
        "".join(rng.choice(list("ACGT"), size=rng.randint(50, 400)))
        for _ in range(5)
    ]
    fm = FMIndex.build_from_strings([s[::-1] for s in strings])
    import jax.numpy as jnp

    a_ck = fm_ops.to_device(fm)
    a_bp = fm_ops.to_device(fm, bitplanes=True)
    codes = rng.randint(1, 5, (256, 13)).astype(np.int32)
    l1, h1 = fm_ops.backward_search_codes(a_ck, jnp.asarray(codes))
    l2, h2 = fm_ops.backward_search_codes(a_bp, jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_ftab_matches_plain_search():
    # texts incl. N's (ftab covers ACGT prefixes; N-rows -> empty)
    rng = np.random.RandomState(31)
    strings = [
        "".join(rng.choice(list("ACGTACGTN"), size=rng.randint(60, 300)))
        for _ in range(4)
    ]
    fm = FMIndex.build_from_strings([s[::-1] for s in strings])
    import jax.numpy as jnp

    k = 12
    codes = rng.randint(1, 5, (300, k)).astype(np.int32)
    # make some rows true substrings so non-empty ranges are exercised
    lut = {c: i + 1 for i, c in enumerate("ACGT")}
    row = 0
    for s in strings:
        for start in range(0, len(s) - k, 17):
            frag = s[start: start + k]
            if "N" in frag or row >= 100:
                continue
            codes[row] = [lut[c] for c in frag]
            row += 1

    plain = fm_ops.to_device(fm)
    for p in (1, 5, k):
        with_ftab = fm_ops.to_device(fm, ftab_bits=p)
        assert with_ftab.ftab.shape == (4 ** p, 2)
        l1, h1 = fm_ops.backward_search_codes(plain, jnp.asarray(codes))
        l2, h2 = fm_ops.backward_search_codes(with_ftab, jnp.asarray(codes))
        l1, h1 = np.asarray(l1), np.asarray(h1)
        l2, h2 = np.asarray(l2), np.asarray(h2)
        # widths always agree; (lo, hi) agree on non-empty ranges (the
        # collapsed value of an empty range is route-specific)
        np.testing.assert_array_equal(h1 - l1, h2 - l2)
        nz = h1 > l1
        assert nz.any()
        np.testing.assert_array_equal(l1[nz], l2[nz])


def test_ftab_non_acgt_prefix_is_empty():
    rng = np.random.RandomState(32)
    s = "".join(rng.choice(list("ACGTN"), size=500))
    fm = FMIndex.build_from_strings([s[::-1]])
    import jax.numpy as jnp

    arrays = fm_ops.to_device(fm, ftab_bits=4)
    codes = np.full((3, 8), 2, dtype=np.int32)
    codes[0, 1] = 5  # N inside the ftab prefix
    codes[1, 2] = 0  # sentinel inside the ftab prefix
    lo, hi = fm_ops.backward_search_codes(arrays, jnp.asarray(codes))
    lo, hi = np.asarray(lo), np.asarray(hi)
    assert lo[0] == hi[0] and lo[1] == hi[1]
    # row 2 (pure ACGT) still matches the host search
    hlo, hhi = fm.backward_search("CCCCCCCC"[::-1])
    assert (lo[2], hi[2]) == (hlo, hhi)


def test_all_kmers_enumeration_matches_bruteforce():
    # next_kmer-equivalent (ref: index_iter.hpp:630-652): every distinct
    # k-mer of the text, lexicographic, with counts
    rng = np.random.RandomState(41)
    strings = [
        "".join(rng.choice(list("ACGTN"), size=rng.randint(40, 200)))
        for _ in range(4)
    ]
    fm = FMIndex.build_from_strings(strings)
    k = 5
    keys, counts, lo = fm.all_kmers(k)

    from collections import Counter

    brute = Counter()
    for s in strings:
        for i in range(len(s) - k + 1):
            frag = s[i: i + k]
            if "N" not in frag:
                brute[frag] += 1
    lut = "ACGT"
    got = {}
    for key, cnt in zip(keys, counts):
        sym = "".join(
            lut[int(key) >> (2 * (k - 1 - d)) & 3] for d in range(k)
        )
        got[sym] = int(cnt)
    assert got == dict(brute)
    assert list(keys) == sorted(keys)


def test_topdown_iter_traversal():
    """Iter<TopDown> surface (ref: fmindex.hpp:543-917 scenarios in
    test_fmindex.cpp): descent counts, representative, and full DFS
    enumeration via go_down/go_right/go_up."""
    from collections import Counter

    from psi_tpu.fmindex import TopDownIter

    rng = np.random.RandomState(51)
    strings = [
        "".join(rng.choice(list("ACGT"), size=rng.randint(30, 90)))
        for _ in range(3)
    ]
    fm = FMIndex.build_from_strings(strings)

    it = TopDownIter(fm)
    assert it.is_root() and it.count() == fm.size
    assert it.go_down("A")
    assert it.count() == fm.count("A")
    assert it.go_down("C")  # pattern extends at the front: "CA"
    assert it.representative() == "CA"
    assert it.count() == fm.count("CA")
    occ = sorted(map(int, it.occurrences()))
    assert occ == sorted(map(int, fm.locate(*fm.backward_search("CA"))))
    assert it.go_up() and it.representative() == "A"

    k = 3
    seen = {}

    def dfs(t):
        if t.depth() == k:
            seen[t.representative()] = t.count()
            return
        if t.go_down():
            while True:
                dfs(t)
                if not t.go_right():
                    break
            t.go_up()

    dfs(TopDownIter(fm))
    brute = Counter()
    for s in strings:
        for i in range(len(s) - k + 1):
            brute[s[i: i + k]] += 1
    # DFS also reaches patterns ending at string starts via sentinels;
    # restrict to pure ACGT patterns
    got = {p: c for p, c in seen.items() if set(p) <= set("ACGT")}
    assert got == dict(brute)
