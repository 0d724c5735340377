"""Round-3 kernel A/B on the real TPU: per-slab ring vs flat ring vs
VMEM-resident rank4, on the VERDICT workload (2^19 distinct k=20 keys,
4 Mbp index), with exact parity vs the XLA route.

Each variant runs in its own subprocess (the kernel choice is baked in
at trace time via env vars). Writes /tmp/tpu_r3_kernels.json.
"""

import json
import os
import subprocess
import sys
import time

MEASURE = r"""
import json, os, time, numpy as np, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from psi_tpu.cache import compile_cache_dir
jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from psi_tpu.fmindex import FMIndex
from psi_tpu.ops import fm as fm_ops, fm_stream, fm_trie

variant = os.environ["PSI_VARIANT"]
rng = np.random.RandomState(42)
n_paths = 4
path_len = 1_000_000
strings = ["".join(rng.choice(list("ACGT"), size=path_len))
           for _ in range(n_paths)]
fm = FMIndex.build_from_strings([s[::-1] for s in strings])
k = 20
n_queries = 1 << 19
kmers = np.empty((n_queries, k), dtype=np.int32)
half = n_queries // 2
src = rng.randint(0, n_paths, size=half)
starts = rng.randint(0, path_len - k, size=half)
lut = np.full(256, 0, dtype=np.int32)
for i, ch in enumerate("ACGT"):
    lut[ord(ch)] = i
for row in range(half):
    s = strings[src[row]]
    frag = s[starts[row]: starts[row] + k]
    kmers[row] = lut[np.frombuffer(frag.encode(), dtype=np.uint8)]
kmers[half:] = rng.randint(0, 4, size=(n_queries - half, k))
weights = (1 << (2 * np.arange(k - 1, -1, -1, dtype=np.int64)))
keys_u = np.unique((kmers.astype(np.int64) @ weights).astype(np.uint64))

arrays = fm_stream.build_stream_arrays(fm)
ftab_bits = 11
ftab = fm_ops.build_ftab(fm, ftab_bits)
t0 = time.time()
prep = fm_trie.prepare(keys_u, k, ftab)
prep_s = time.time() - t0

def force(x):
    return int(np.asarray(jnp.sum(x)))

masked = prep.mask is not None
delta_wire = prep.delta is not None
packed = prep.poff is not None
sched = (prep.delta if delta_wire
         else prep.mask if masked
         else (prep.poff if packed else prep.parents))
chars = (prep.dmeta if delta_wire
         else sched if masked
         else (prep.charpk if packed else prep.chars))
ftab_tab = (
    jnp.asarray(ftab.astype(np.int32))
    if (masked and prep.ftab_rows is not None)
    or (delta_wire and prep.row_delta is not None) else None
)
def run():
    return fm_trie._trie_device(
        arrays, sched, chars,
        use_pallas=True, lo0=prep.lo0, hi0=prep.hi0,
        pbase=prep.pbase, packed=packed, masked=masked,
        ftab_tab=ftab_tab, ftab_rows=prep.ftab_rows,
        delta_wire=delta_wire, dexc=prep.dexc,
        row_delta=prep.row_delta, row_exc=prep.row_exc,
        mask_derive=fm_trie._mask_derive(),
    )

t0 = time.time()
lo, hi = run(); force(hi)
compile_s = time.time() - t0
# dispatch+fetch baseline: a tiny add with an 8-byte fetch measures the
# tunnel round-trip paid by every timing iteration (CLAUDE.md method)
tiny = jnp.ones(8, dtype=jnp.int32)
_ = int(np.asarray(jnp.sum(tiny + 1)))
t0 = time.time()
for _ in range(10):
    _ = int(np.asarray(jnp.sum(tiny + 1)))
base_ms = (time.time() - t0) / 10 * 1e3
iters = 10
t0 = time.time()
for _ in range(iters):
    lo, hi = run(); force(hi - lo)
dt = (time.time() - t0) / iters
rate = len(keys_u) / dt
dev_ms = max(dt * 1e3 - base_ms, 0.0)

# parity vs XLA dense route (on a verified subsample to bound fetch time)
lo = np.asarray(lo)[prep.leaf_perm]
hi = np.asarray(hi)[prep.leaf_perm]
dense = fm_ops.to_device(fm, dense_occ=True)
sel = np.sort(np.random.RandomState(1).choice(len(keys_u), 4096, False))
codes = fm_ops.keys_to_codes(keys_u[sel], k)
l1, h1 = fm_ops.backward_search_codes(dense, jnp.asarray(codes))
l1, h1 = np.asarray(l1), np.asarray(h1)
ok = bool((h1 - l1 == hi[sel] - lo[sel]).all()
          and (l1[h1 > l1] == lo[sel][h1 > l1]).all())
out = {"variant": variant, "keys": len(keys_u), "prep_s": round(prep_s, 2),
       "compile_s": round(compile_s, 1), "ms_per_batch": round(dt * 1e3, 1),
       "dispatch_baseline_ms": round(base_ms, 1),
       "device_ms": round(dev_ms, 1),
       "device_kmers_per_s": round(len(keys_u) / max(dev_ms / 1e3, 1e-9), 1),
       "kmers_per_s": round(rate, 1), "parity": ok,
       "slabs": fm_stream.SLABS, "ring": fm_stream.RING}
print("RESULT " + json.dumps(out))
"""

VARIANTS = [
    ("resident", {"PSI_RESIDENT": "1"}),
    ("flat_ring", {"PSI_RESIDENT": "0", "PSI_FLAT_RING": "1"}),
    ("slab_ring", {"PSI_RESIDENT": "0", "PSI_FLAT_RING": "0"}),
    # plain wire isolates the KERNELS (the packed/mask schedule decode
    # adds ~80 ms/batch of XLA unpack work that masks kernel deltas)
    ("resident_plain", {"PSI_RESIDENT": "1", "PSI_TRIE_PACK": "0"}),
    ("flat_plain", {"PSI_RESIDENT": "0", "PSI_FLAT_RING": "1",
                    "PSI_TRIE_PACK": "0"}),
    ("slab_plain", {"PSI_RESIDENT": "0", "PSI_FLAT_RING": "0",
                    "PSI_TRIE_PACK": "0"}),
    ("mask_wire", {"PSI_RESIDENT": "0", "PSI_FLAT_RING": "1",
                   "PSI_TRIE_WIRE": "mask", "PSI_MASK_DERIVE": "search"}),
    # round-3b: cheaper in-device derives for the small wire formats
    ("mask_sort", {"PSI_RESIDENT": "0", "PSI_FLAT_RING": "1",
                   "PSI_TRIE_WIRE": "mask", "PSI_MASK_DERIVE": "sort"}),
    ("delta_wire", {"PSI_RESIDENT": "0", "PSI_FLAT_RING": "1",
                    "PSI_TRIE_WIRE": "delta"}),
    # grid-step size sweep (per-step Mosaic overhead vs VMEM)
    ("slab16", {"PSI_RESIDENT": "0", "PSI_FLAT_RING": "1",
                "PSI_SLABS": "16"}),
    ("slab32", {"PSI_RESIDENT": "0", "PSI_FLAT_RING": "1",
                "PSI_SLABS": "32"}),
]

# PSI_AB_ONLY=name1,name2 filters the sweep (reruns are per-variant)
_only = os.environ.get("PSI_AB_ONLY")
if _only:
    keep = set(_only.split(","))
    VARIANTS = [v for v in VARIANTS if v[0] in keep]


def probe() -> bool:
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp, numpy as np;"
             "print(float(np.asarray(jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))"],
            capture_output=True, timeout=90,
        )
        return p.returncode == 0 and b"8.0" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    deadline = time.time() + float(os.environ.get("TPU_WAIT_S", "7200"))
    results = {}
    pending = dict(VARIANTS)
    attempt = 0
    while pending and time.time() < deadline:
        attempt += 1
        if not probe():
            print(f"[{time.strftime('%H:%M:%S')}] tunnel down; waiting",
                  flush=True)
            time.sleep(45)
            continue
        name, envd = next(iter(pending.items()))
        print(f"[{time.strftime('%H:%M:%S')}] measuring {name}", flush=True)
        env = dict(os.environ)
        env.update(envd)
        env["PSI_VARIANT"] = name
        try:
            run = subprocess.run([sys.executable, "-c", MEASURE],
                                 capture_output=True, timeout=1800, env=env)
            txt = run.stdout.decode()
            for line in txt.splitlines():
                if line.startswith("RESULT "):
                    results[name] = json.loads(line[len("RESULT "):])
                    print(json.dumps(results[name]), flush=True)
                    pending.pop(name)
                    break
            else:
                print("no RESULT; stderr:", run.stderr.decode()[-1500:],
                      flush=True)
                time.sleep(30)
        except subprocess.TimeoutExpired:
            print("variant timed out; retrying", flush=True)
        with open("/tmp/tpu_r3_kernels.json", "w") as fh:
            json.dump(results, fh, indent=1)
    print("done:", json.dumps(results), flush=True)
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
