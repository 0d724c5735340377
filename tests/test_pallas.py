"""Pallas FM kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psi_tpu.fmindex import FMIndex
from psi_tpu.ops import fm as fm_ops
from psi_tpu.ops import fm_pallas


@pytest.fixture(scope="module")
def fm():
    rng = np.random.RandomState(5)
    strings = ["".join(rng.choice(list("ACGT"), size=400)) for _ in range(4)]
    return FMIndex.build_from_strings([s[::-1] for s in strings])


def test_gather_occ_rows(fm):
    occ8 = fm_pallas.occ_dense_padded(fm)
    rng = np.random.RandomState(1)
    pos = rng.randint(0, fm.size + 1, size=64).astype(np.int32)
    rows = fm_pallas.gather_occ_rows(
        jnp.asarray(occ8), jnp.asarray(pos), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(rows), occ8[pos])


def test_backward_search_pallas_matches_xla(fm):
    rng = np.random.RandomState(2)
    codes = rng.randint(1, 5, (48, 11)).astype(np.int32)
    occ8 = fm_pallas.occ_dense_padded(fm)
    lo_p, hi_p = fm_pallas.backward_search_pallas(
        jnp.asarray(occ8),
        jnp.asarray(fm.C.astype(np.int32)),
        jnp.asarray(fm.size, jnp.int32),
        jnp.asarray(codes),
        interpret=True,
    )
    arrays = fm_ops.to_device(fm)
    lo_x, hi_x = fm_ops.backward_search_codes(arrays, jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(lo_p), np.asarray(lo_x))
    np.testing.assert_array_equal(np.asarray(hi_p), np.asarray(hi_x))


def test_blocked_gather_matches_direct(fm):
    from psi_tpu.ops.fm_pallas import gather_occ_rows_blocked, occ_dense_padded

    occ8 = occ_dense_padded(fm)
    rng = np.random.RandomState(7)
    for M in (1, 64, 700, 2500):
        pos = rng.randint(0, fm.size + 1, size=M).astype(np.int32)
        rows = gather_occ_rows_blocked(occ8, pos, interpret=True)
        np.testing.assert_array_equal(rows, occ8[pos])
