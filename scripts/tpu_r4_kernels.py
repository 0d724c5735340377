"""Round-4 kernel A/B on the real TPU: MXU one-hot payload fetch vs
the r3 flat-ring gather kernel, plus per-visit cost-attribution
controls (nogather / nopop / novisit), on the VERDICT workload
(2^19 distinct k=20 keys, 4 Mbp index). Exact parity vs the XLA route
for the real variants; the ctl_* variants produce WRONG results by
design (timing only).

Each variant runs in its own subprocess (kernel choice is baked in at
trace time via env). Writes /tmp/tpu_r4_kernels.json.
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
check_parity = os.environ.get("PSI_CHECK_PARITY", "1") == "1"
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

# rank4-only timing: 20 passes over 2^19 sorted positions inside ONE
# jit (a single ~3 ms pass is unresolvable under the ~27 ms tunnel
# dispatch baseline). Separates the rank kernel's share from compact +
# wire derive in the trie total.
M = 1 << 19
pos_sorted = jnp.asarray(
    np.sort(rng.randint(0, fm.size + 1, size=M)).astype(np.int32)
)
R4_REPS = 20

@jax.jit
def r4_many(p):
    def body(i, acc):
        # data-dependence on acc stops XLA hoisting the loop-invariant
        # pass out of the loop (acc is never negative at runtime)
        p2 = jnp.where(acc < 0, p + 1, p)
        r = fm_stream.rank4_stream(arrays, p2)
        return acc + r[0, 0, 0, 0, 0]

    return jax.lax.fori_loop(0, R4_REPS, body, jnp.int32(0))

force(r4_many(pos_sorted))
t0 = time.time()
for _ in range(5):
    force(r4_many(pos_sorted))
r4_ms = max((time.time() - t0) / 5 * 1e3 - base_ms, 0.0) / R4_REPS

# compact-only timing (the child-gather kernel): same method, on a
# c-major child schedule with ascending parents per segment
par = np.concatenate([
    np.sort(rng.randint(0, M, size=M // 4)) for _ in range(4)
]).astype(np.int32)
ch = np.repeat(np.arange(1, 5, dtype=np.int32), M // 4)
r4_sample = fm_stream.rank4_stream(arrays, pos_sorted)

@jax.jit
def compact_many(r4s, parq, chq):
    def body(i, acc):
        p2 = jnp.where(acc < 0, parq + 1, parq)
        lo2, hi2 = fm_stream.compact_children(
            r4s, r4s, p2, chq, arrays.C
        )
        return acc + lo2[0]

    return jax.lax.fori_loop(0, R4_REPS, body, jnp.int32(0))

parj, chj = jnp.asarray(par), jnp.asarray(ch)
_ = force(compact_many(r4_sample, parj, chj))
t0 = time.time()
for _ in range(5):
    _ = force(compact_many(r4_sample, parj, chj))
comp_ms = max((time.time() - t0) / 5 * 1e3 - base_ms, 0.0) / R4_REPS

ok = None
if check_parity:
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
       "rank4_pass_ms": round(r4_ms, 2),
       "compact_pass_ms": round(comp_ms, 2),
       "kmers_per_s": round(rate, 1), "parity": ok,
       "slabs": fm_stream.SLABS, "ring": fm_stream.RING}
print("RESULT " + json.dumps(out))
"""

# plain wire isolates the KERNELS (wire decode adds XLA work that
# masks kernel deltas); *_delta are the production configuration
VARIANTS = [
    ("flat_plain", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                    "PSI_TRIE_PACK": "0"}),
    ("mxu_plain", {"PSI_RANK4": "mxu", "PSI_TRIE_WIRE": "plain",
                   "PSI_TRIE_PACK": "0"}),
    ("ctl_nogather", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                      "PSI_TRIE_PACK": "0", "PSI_RANK4_CTL": "nogather",
                      "PSI_CHECK_PARITY": "0"}),
    ("ctl_nopop", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                   "PSI_TRIE_PACK": "0", "PSI_RANK4_CTL": "nopop",
                   "PSI_CHECK_PARITY": "0"}),
    ("ctl_novisit", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                     "PSI_TRIE_PACK": "0", "PSI_RANK4_CTL": "novisit",
                     "PSI_CHECK_PARITY": "0"}),
    ("flat_delta", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "delta"}),
    ("mxu_delta", {"PSI_RANK4": "mxu", "PSI_TRIE_WIRE": "delta"}),
    # trie-glue attribution (kernels measured fast standalone vs the
    # trie total): scan/slicing floor, compact+glue, ranks+glue
    ("trie_empty", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                    "PSI_TRIE_PACK": "0", "PSI_TRIE_CTL": "empty",
                    "PSI_CHECK_PARITY": "0"}),
    ("trie_norank", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                     "PSI_TRIE_PACK": "0", "PSI_TRIE_CTL": "norank",
                     "PSI_CHECK_PARITY": "0"}),
    ("trie_nocompact", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                        "PSI_TRIE_PACK": "0",
                        "PSI_TRIE_CTL": "nocompact",
                        "PSI_CHECK_PARITY": "0"}),
    ("flat_unroll", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                     "PSI_TRIE_PACK": "0", "PSI_TRIE_UNROLL": "1"}),
    ("pair_plain", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                    "PSI_TRIE_PACK": "0", "PSI_RANK4_PAIR": "1"}),
]

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
    out_path = os.environ.get("PSI_AB_OUT", "/tmp/tpu_r4_kernels.json")
    results = {}
    if os.path.exists(out_path) and os.environ.get("PSI_AB_RESUME"):
        with open(out_path) as fh:
            results = json.load(fh)
    pending = {n: e for n, e in VARIANTS if n not in results}
    while pending and time.time() < deadline:
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
                                 capture_output=True, timeout=2400, env=env)
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
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    print("done:", json.dumps(results), flush=True)
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
