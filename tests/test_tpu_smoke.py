"""Real-TPU Pallas smoke test (tunnel-gated).

CI normally verifies the Pallas kernels in interpret mode only; Mosaic
regressions (vreg/gather limits, DMA semantics) surface only on real
hardware. This test runs the trie route's kernels on the actual chip
when the axon tunnel is reachable, and SKIPS (never fails) when it is
down or wedged — one flaky tunnel must not break CI.
"""

import os
import subprocess
import sys

import pytest

_SMOKE = r"""
import os, sys
import numpy as np
import jax
from psi_tpu.cache import compile_cache_dir
jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() not in ("cpu",), jax.default_backend()

from psi_tpu.fmindex import FMIndex
from psi_tpu.ops import fm as fm_ops
from psi_tpu.ops import fm_stream, fm_trie

rng = np.random.RandomState(0)
s = "".join(rng.choice(list("ACGT"), size=200_000))
fm = FMIndex.build_from_strings([s[::-1]])
arr = fm_stream.build_stream_arrays(fm)
dense = fm_ops.to_device(fm, dense_occ=True)
k = 13
lut = {c: i for i, c in enumerate("ACGT")}
pres = []
for start in range(0, len(s) - k, 37):
    v = 0
    for ch in s[start: start + k]:
        v = v * 4 + lut[ch]
    pres.append(v)
keys = np.unique(np.concatenate([
    rng.randint(0, 4 ** k, size=3000).astype(np.uint64),
    np.asarray(pres, dtype=np.uint64),
]))
codes = fm_ops.keys_to_codes(keys, k)
l1, h1 = fm_ops.backward_search_codes(dense, codes)
w1 = np.asarray(h1) - np.asarray(l1)
ftab = fm_ops.build_ftab(fm, 5)
for ft in (None, ftab):
    lo2, hi2 = fm_trie.trie_search(arr, keys, k, use_pallas=True, ftab=ft)
    np.testing.assert_array_equal(w1, hi2 - lo2)
    nz = w1 > 0
    assert nz.any()
    np.testing.assert_array_equal(np.asarray(l1)[nz], lo2[nz])
print("TPU_SMOKE_OK")
"""


def test_pallas_kernels_on_real_tpu():
    ambient = os.environ.get(
        "PSI_AMBIENT_JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", "")
    )
    if ambient != "axon":
        pytest.skip("no TPU platform configured in the ambient env")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ambient
    env.pop("PSI_STREAM", None)
    # quick reachability probe, then the smoke itself; the remote
    # compile relay can take minutes on a cold cache — skip, not fail,
    # on timeouts (the tunnel flaps, and a WEDGED tunnel raises
    # TimeoutExpired from the probe itself: that must skip too, and
    # cheaply — CI must not pay minutes for a dead link)
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp, numpy as np;"
             "x = jnp.ones((8, 8)); print(float(np.asarray(x @ x)[0, 0]))"],
            capture_output=True, timeout=90, env=env,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU tunnel wedged (probe timed out)")
    if probe.returncode != 0 or b"8.0" not in probe.stdout:
        pytest.skip("TPU tunnel unreachable")
    try:
        res = subprocess.run(
            [sys.executable, "-c", _SMOKE],
            capture_output=True, timeout=1200, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU smoke timed out (cold compile relay or tunnel)")
    assert res.returncode == 0, res.stderr.decode()[-3000:]
    assert b"TPU_SMOKE_OK" in res.stdout