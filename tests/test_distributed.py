"""Component-sharded index tests on the virtual 8-device mesh."""

import numpy as np
import pytest

from psi_tpu.fmindex import FMIndex
from psi_tpu.io import load_vg
from psi_tpu.ops.fm import keys_to_codes
from psi_tpu.parallel.distributed import (
    build_sharded_index,
    partition_paths_by_component,
    sharded_count,
    sharded_locate,
)
from psi_tpu.parallel.mesh import device_mesh
from psi_tpu.pathutil import sequence
from psi_tpu.seed_finder import SeedFinder


@pytest.fixture(scope="module")
def mesh():
    return device_mesh(4, axes=("shard",))


def test_sharded_count_matches_global(mesh):
    rng = np.random.RandomState(0)
    # 4 shards, each with its own strings (disjoint "components")
    shard_strings = [
        ["".join(rng.choice(list("ACGT"), size=300)) for _ in range(2)]
        for _ in range(4)
    ]
    fms = [
        FMIndex.build_from_strings([s[::-1] for s in group])
        for group in shard_strings
    ]
    arrays = build_sharded_index(fms, mesh)

    # global reference: one FM over everything
    all_strings = [s for g in shard_strings for s in g]
    fm_all = FMIndex.build_from_strings([s[::-1] for s in all_strings])

    k = 10
    kmers = []
    for _ in range(40):
        s = all_strings[rng.randint(len(all_strings))]
        st = rng.randint(0, len(s) - k + 1)
        kmers.append(s[st: st + k])
    for _ in range(10):
        kmers.append("".join(rng.choice(list("ACGT"), size=k)))
    from psi_tpu.ops.kmers import pack_kmers, seq_to_codes

    mat = np.stack([seq_to_codes(s) for s in kmers])
    keys, _ = pack_kmers(mat)
    codes = keys_to_codes(keys, k)

    total, lo, hi = sharded_count(mesh, arrays, codes)
    expect = np.array([fm_all.count(km[::-1]) for km in kmers])
    np.testing.assert_array_equal(total, expect)

    # locate merge: union of per-shard occurrences == global occurrences
    shard_idx, query_idx, pos = sharded_locate(arrays, lo, hi, int(total.max()))
    for qi, km in enumerate(kmers):
        mine = []
        for s_i, q_i, p in zip(shard_idx, query_idx, pos):
            if q_i != qi:
                continue
            sid, off = fms[s_i].text_pos_to_string([p])
            mine.append((2 * s_i + int(sid[0]), int(off[0])))
        expect_occ = fm_all.occurrences(km[::-1])
        assert sorted(mine) == expect_occ, km


def test_partition_paths_by_component(data_dir):
    graph = load_vg(str(data_dir / "multi" / "multi.vg"))
    finder = SeedFinder(graph, 12)
    finder.pick_paths(2, patched=False)
    finder.index_paths()
    per_shard, comp = partition_paths_by_component(graph, finder.pindex, 3)
    pset = finder.pindex.get_paths_set()
    assert sum(len(s) for s in per_shard) == len(pset)
    # all paths of one component land on one shard
    comp_to_shards = {}
    for s, idxs in enumerate(per_shard):
        for i in idxs:
            comp_to_shards.setdefault(comp[i], set()).add(s)
    assert all(len(v) == 1 for v in comp_to_shards.values())


def test_2d_mesh_data_x_shard():
    """Composed 2-D parallelism: queries over 'data', index over
    'shard', one device per tile; psum over shard only."""
    import jax
    from jax.sharding import Mesh

    from psi_tpu.ops.fm import keys_to_codes
    from psi_tpu.ops.kmers import pack_kmers, seq_to_codes
    from psi_tpu.parallel.distributed import sharded_count_2d

    rng = np.random.RandomState(0)
    shard_strings = [
        ["".join(rng.choice(list("ACGT"), size=300)) for _ in range(2)]
        for _ in range(4)
    ]
    fms = [
        FMIndex.build_from_strings([s[::-1] for s in g])
        for g in shard_strings
    ]
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("data", "shard"))
    arrays = build_sharded_index(fms, mesh2, axis="shard")
    all_strings = [s for g in shard_strings for s in g]
    fm_all = FMIndex.build_from_strings([s[::-1] for s in all_strings])
    k = 10
    kmers = []
    for _ in range(37):
        s = all_strings[rng.randint(len(all_strings))]
        st = rng.randint(0, len(s) - k + 1)
        kmers.append(s[st: st + k])
    keys, _ = pack_kmers(np.stack([seq_to_codes(x) for x in kmers]))
    codes = keys_to_codes(keys, k)
    total = sharded_count_2d(mesh2, arrays, codes)
    expect = np.array([fm_all.count(km[::-1]) for km in kmers])
    np.testing.assert_array_equal(total, expect)
