"""Streaming-rank kernel (fm_stream): interpret-mode parity tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from psi_tpu.fmindex import FMIndex
from psi_tpu.ops import fm as fm_ops
from psi_tpu.ops import fm_stream


def _random_fm(rng, n_strings=4, lo=200, hi=2000, alphabet="ACGT"):
    strings = [
        "".join(rng.choice(list(alphabet), size=rng.randint(lo, hi)))
        for _ in range(n_strings)
    ]
    return FMIndex.build_from_strings([s[::-1] for s in strings]), strings


def test_rank_stream_matches_host():
    rng = np.random.RandomState(7)
    fm, _ = _random_fm(rng, alphabet="ACGTN")
    arrays = fm_stream.build_stream_arrays(fm)
    M = 3000
    pos = np.sort(rng.randint(0, fm.size + 1, size=M)).astype(np.int32)
    chars = rng.randint(1, 5, size=M).astype(np.int32)
    got = np.asarray(
        fm_stream.rank_stream(
            arrays, jnp.asarray(chars), jnp.asarray(pos), interpret=True
        )
    )
    # host truth: occ checkpoint + block count
    bwt = fm.bwt
    for i in rng.choice(M, 300, replace=False):
        expect = int(np.count_nonzero(bwt[: pos[i]] == chars[i]))
        assert got[i] == expect, (i, pos[i], chars[i])


def test_backward_search_sorted_matches_generic():
    rng = np.random.RandomState(8)
    fm, strings = _random_fm(rng)
    arrays = fm_stream.build_stream_arrays(fm)
    plain = fm_ops.to_device(fm)

    k = 14
    lut = {c: i + 1 for i, c in enumerate("ACGT")}
    rows = [rng.randint(1, 5, size=k).astype(np.int32) for _ in range(500)]
    for s in strings[:2]:
        for start in range(0, len(s) - k, 31):
            frag = s[start: start + k]
            rows.append(np.array([lut[c] for c in frag], dtype=np.int32))
    codes = np.stack(rows)
    # sorted-rows invariant (what np.unique over packed keys gives)
    keys = codes.astype(np.int64) @ (4 ** np.arange(k - 1, -1, -1, dtype=np.int64))
    codes = codes[np.argsort(keys, kind="stable")]

    l1, h1 = fm_ops.backward_search_codes(plain, jnp.asarray(codes))
    l2, h2 = fm_stream.backward_search_sorted(
        arrays, jnp.asarray(codes), interpret=True
    )
    l1, h1 = np.asarray(l1), np.asarray(h1)
    l2, h2 = np.asarray(l2), np.asarray(h2)
    np.testing.assert_array_equal(h1 - l1, h2 - l2)
    nz = h1 > l1
    assert nz.any()
    np.testing.assert_array_equal(l1[nz], l2[nz])


def test_backward_search_sorted_with_ftab_seed():
    rng = np.random.RandomState(9)
    fm, _ = _random_fm(rng, n_strings=3)
    arrays = fm_stream.build_stream_arrays(fm)
    p = 4
    k = 10
    ftab = fm_ops.build_ftab(fm, p)
    codes = np.sort(
        rng.randint(1, 5, size=(256, k)).astype(np.int32), axis=0
    )  # per-column sort is NOT lexicographic; build properly:
    keys = rng.randint(0, 4 ** k, size=256)
    keys.sort()
    codes = fm_ops.keys_to_codes(keys.astype(np.uint64), k)

    weights = 4 ** np.arange(p - 1, -1, -1, dtype=np.int64)
    pk = (codes[:, :p].astype(np.int64) - 1) @ weights
    start = ftab[pk]
    l2, h2 = fm_stream.backward_search_sorted(
        arrays,
        jnp.asarray(codes[:, p:]),
        lo0=jnp.asarray(start[:, 0]),
        hi0=jnp.asarray(start[:, 1]),
        interpret=True,
    )
    plain = fm_ops.to_device(fm)
    l1, h1 = fm_ops.backward_search_codes(plain, jnp.asarray(codes))
    l1, h1 = np.asarray(l1), np.asarray(h1)
    l2, h2 = np.asarray(l2), np.asarray(h2)
    np.testing.assert_array_equal(h1 - l1, np.asarray(h2) - np.asarray(l2))
    nz = h1 > l1
    if nz.any():
        np.testing.assert_array_equal(l1[nz], l2[nz])
