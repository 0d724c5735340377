"""Hardware Pallas/XLA kernel parity suite — run on the REAL TPU when
the tunnel is healthy, and record a dated pass/fail artifact under
docs/ (VERDICT r4 weak item 5: interpret-mode CI plus unpinned
hardware runs left hardware parity as folklore).

Each check runs in its own subprocess (kernel-variant envs are read at
trace time, and one wedged dispatch must not sink the suite). Writes
``docs/TPU_PARITY_<tag>.json``:

    {"date": ..., "platform": ..., "checks": {name: {"ok": bool, ...}}}

Checks:
  * trie_scan_pair   — scan route, pair rank4 kernel + compact (prod
                       scan default) vs XLA dense backward search
  * trie_scan_flat   — scan route, two-pass flat rank4
  * trie_fused       — single-launch fused kernel (ops/fm_fused.py)
  * trie_fused_delta — fused route fed by the delta wire (the axon
                       sustained-path default)
  * expand_locate    — _expand_locate_device (scatter+cummax expansion,
                       locate, gpos mapping) vs a NumPy mirror
  * dindex_probe     — probe_sort + probe_bisect vs host searchsorted
  * rank_stream      — streaming rank kernel vs host occ counts

Usage: JAX_PLATFORMS=axon python scripts/tpu_parity_suite.py [tag]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREAMBLE = r"""
import os, sys, json
sys.path.insert(0, %r)
import numpy as np
import jax, jax.numpy as jnp
from psi_tpu.cache import compile_cache_dir
jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() not in ("cpu",), jax.default_backend()

def emit(ok, **kw):
    print("PARITY " + json.dumps({"ok": bool(ok), **kw}))
""" % REPO

TRIE = PREAMBLE + r"""
from psi_tpu.fmindex import FMIndex
from psi_tpu.ops import fm as fm_ops, fm_stream, fm_trie

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
l1, h1 = np.asarray(l1), np.asarray(h1)
w1 = h1 - l1
ftab = fm_ops.build_ftab(fm, 5)
wire = os.environ.get("PSI_TRIE_WIRE", "plain")
prep = fm_trie.prepare(keys, k, ftab, wire=wire,
                       pack=wire == "packed" or None)
lo2, hi2 = fm_trie.trie_search(arr, keys, k, use_pallas=True,
                               ftab=ftab, prepared=prep)
nz = w1 > 0
ok = bool((w1 == hi2 - lo2).all() and nz.any() and (l1[nz] == lo2[nz]).all())
emit(ok, keys=len(keys), nonempty=int(nz.sum()), wire=wire)
"""

EXPAND = PREAMBLE + r"""
from psi_tpu.ops import fm_trie

rng = np.random.RandomState(3)
n = 100_000
m = 7
k = 13
lens = rng.randint(2000, 30000, size=m)
lens = (lens * (n - m) // lens.sum()).astype(np.int64)
n = int(lens.sum())
sa = rng.permutation(n).astype(np.int32)
str_starts = np.zeros(m + 1, dtype=np.int32)
np.cumsum(lens, out=str_starts[1:])
seq_off = np.zeros(m + 1, dtype=np.int32)
np.cumsum(lens + 1, out=seq_off[1:])
Npad = 1 << 13
lo = np.sort(rng.randint(0, n, size=Npad)).astype(np.int32)
width = rng.randint(0, 6, size=Npad).astype(np.int32)
hi = np.minimum(lo + width, n).astype(np.int32)
n_leaves = Npad - 17
thr = 4
cap = 1 << 15
gpos_d, total_d = fm_trie._expand_locate_device(
    jnp.asarray(sa), jnp.asarray(str_starts), jnp.asarray(lens.astype(np.int32)),
    jnp.asarray(seq_off), jnp.asarray(lo), jnp.asarray(hi),
    jnp.int32(n_leaves), jnp.int32(thr), k, cap)
total = int(np.asarray(total_d))
got = np.asarray(gpos_d)[:total]
# NumPy mirror
exp = []
for i in range(n_leaves):
    c = hi[i] - lo[i]
    if 0 < c <= thr:
        for j in range(lo[i], hi[i]):
            pos = sa[j]
            sid = np.searchsorted(str_starts, pos, side="right") - 1
            q = pos - str_starts[sid]
            exp.append(seq_off[sid] + (lens[sid] - q - k))
exp = np.asarray(exp, dtype=np.int64)
ok = bool(len(exp) == total and (got.astype(np.int64) == exp).all())
emit(ok, total=total)
"""

DINDEX = PREAMBLE + r"""
from psi_tpu.ops import dindex_probe

rng = np.random.RandomState(5)
n_rows = 200_000
B = 1 << 16
keys = np.sort(rng.randint(0, 1 << 50, size=n_rows).astype(np.int64))
src = rng.randint(0, 1000, size=n_rows).astype(np.int32)
dst = rng.randint(0, 1000, size=n_rows).astype(np.int32)
iv_lo = rng.randint(0, 5000, size=n_rows).astype(np.int32)
iv_hi = iv_lo + rng.randint(0, 500, size=n_rows).astype(np.int32)
sel = rng.randint(0, n_rows, size=B // 2)
qk = np.concatenate([
    keys[sel],
    rng.randint(0, 1 << 50, size=B - B // 2).astype(np.int64),
])
q_src = rng.randint(0, 1000, size=B).astype(np.int32)
q_dst = rng.randint(0, 1000, size=B).astype(np.int32)
s_lo = rng.randint(0, 5200, size=B).astype(np.int32)
s_hi = s_lo + rng.randint(0, 400, size=B).astype(np.int32)
# make a quarter of the sampled queries REAL hits (matching pair +
# overlapping interval) so the true-path is exercised, not just misses
hit_rows = sel[: B // 4]
q_src[: B // 4] = src[hit_rows]
q_dst[: B // 4] = dst[hit_rows]
s_lo[: B // 4] = np.maximum(iv_lo[hit_rows] - 10, 0)
s_hi[: B // 4] = iv_hi[hit_rows] + 10
r = np.searchsorted(keys, qk, side="right")
rc = np.clip(r - 1, 0, n_rows - 1)
expect = ((r >= 1) & (src[rc] == q_src) & (dst[rc] == q_dst)
          & (iv_hi[rc] >= s_lo) & (iv_lo[rc] <= s_hi))
split = lambda a: ((a >> 31).astype(np.int32), (a & 0x7fffffff).astype(np.int32))
pk_hi, pk_lo = split(keys)
q_hi, q_lo = split(qk)
args = [jnp.asarray(x) for x in
        (pk_hi, pk_lo, src, dst, iv_lo, iv_hi,
         q_hi, q_lo, q_src, q_dst, s_lo, s_hi)]
got_s = np.asarray(dindex_probe.probe_sort(*args))
got_b = np.asarray(dindex_probe.probe_bisect(*args))
ok = bool((got_s == expect).all() and (got_b == expect).all())
emit(ok, queries=B, hits=int(expect.sum()))
"""

RANK = PREAMBLE + r"""
from psi_tpu.fmindex import FMIndex
from psi_tpu.ops import fm_stream

rng = np.random.RandomState(9)
s = "".join(rng.choice(list("ACGT"), size=150_000))
fm = FMIndex.build_from_strings([s[::-1]])
arr = fm_stream.build_stream_arrays(fm)
n = fm.size
M = 1 << 14
pos = np.sort(rng.randint(0, n + 1, size=M)).astype(np.int32)
chars = rng.randint(1, 5, size=M).astype(np.int32)
got = np.asarray(fm_stream.rank_stream(arr, jnp.asarray(chars),
                                       jnp.asarray(pos)))
onehot = np.zeros((5, n + 1), dtype=np.int64)
for c in range(1, 5):
    onehot[c, 1:] = np.cumsum(fm.bwt == c)
exp = onehot[chars, pos]
ok = bool((got == exp).all())
emit(ok, M=M)
"""

CHECKS = [
    ("trie_scan_pair", TRIE,
     {"PSI_TRIE_FUSED": "0", "PSI_RANK4_PAIR": "1",
      "PSI_TRIE_WIRE": "plain", "PSI_TRIE_PACK": "0"}),
    ("trie_scan_flat", TRIE,
     {"PSI_TRIE_FUSED": "0", "PSI_RANK4_PAIR": "0",
      "PSI_TRIE_WIRE": "plain", "PSI_TRIE_PACK": "0"}),
    ("trie_fused", TRIE,
     {"PSI_TRIE_FUSED": "1", "PSI_TRIE_WIRE": "plain",
      "PSI_TRIE_PACK": "0"}),
    ("trie_fused_delta", TRIE,
     {"PSI_TRIE_FUSED": "1", "PSI_TRIE_WIRE": "delta"}),
    ("expand_locate", EXPAND, {}),
    ("dindex_probe", DINDEX, {}),
    ("rank_stream", RANK, {}),
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r05"
    out_path = os.path.join(REPO, "docs", f"TPU_PARITY_{tag}.json")
    results = {}
    if os.path.exists(out_path) and os.environ.get("PSI_PARITY_RESUME"):
        with open(out_path) as fh:
            results = json.load(fh).get("checks", {})
    for name, code, envd in CHECKS:
        if results.get(name, {}).get("ok"):
            continue
        print(f"[{time.strftime('%H:%M:%S')}] {name} ...", flush=True)
        env = dict(os.environ)
        env.update(envd)
        t0 = time.time()
        try:
            run = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                timeout=int(os.environ.get("PSI_PARITY_TIMEOUT", "1800")),
                env=env,
            )
        except subprocess.TimeoutExpired:
            results[name] = {"ok": False, "error": "timeout"}
            print("  timeout", flush=True)
            continue
        rec = {"ok": False, "error": "no PARITY line"}
        for line in run.stdout.decode().splitlines():
            if line.startswith("PARITY "):
                rec = json.loads(line[7:])
                break
        else:
            rec["stderr"] = run.stderr.decode()[-800:]
        rec["secs"] = round(time.time() - t0, 1)
        results[name] = rec
        print(f"  {'PASS' if rec['ok'] else 'FAIL'} ({rec['secs']}s)",
              flush=True)
        with open(out_path, "w") as fh:
            json.dump({
                "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "platform": os.environ.get("JAX_PLATFORMS", ""),
                "checks": results,
            }, fh, indent=1)
    n_ok = sum(1 for r in results.values() if r.get("ok"))
    print(f"{n_ok}/{len(CHECKS)} checks pass -> {out_path}", flush=True)
    return 0 if n_ok == len(CHECKS) else 1


if __name__ == "__main__":
    sys.exit(main())
