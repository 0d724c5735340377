"""Round-4 definitive trie kernel timing: R full-trie repetitions
inside ONE jit (fori_loop with a data dependence), so the per-execution
tunnel overhead — measured 25-60 ms and VARIABLE between processes,
which confounded every earlier per-call "device_ms" number — is
amortized to nothing. Device time per batch = (t(R2) - t(R1)) /
(R2 - R1), immune to dispatch, fetch, and relay state.

Variants: rank kernel {flat, mxu} x wire {plain, delta, packed} x key
mix {random, real} (real = half the k-mers are true index substrings,
so frontiers survive all levels — the production-like load).
Writes /tmp/tpu_r4_reploop.json.
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
keymix = os.environ.get("PSI_KEYMIX", "real")
rng = np.random.RandomState(42)
n_paths, path_len = 4, 1_000_000
strings = ["".join(rng.choice(list("ACGT"), size=path_len))
           for _ in range(n_paths)]
fm = FMIndex.build_from_strings([s[::-1] for s in strings])
k, n_queries = 20, 1 << 19
kmers = np.empty((n_queries, k), dtype=np.int32)
if keymix == "real":
    half = n_queries // 2
    src = rng.randint(0, n_paths, size=half)
    starts = rng.randint(0, path_len - k, size=half)
    lut = np.zeros(256, dtype=np.int32)
    for i, ch in enumerate("ACGT"):
        lut[ord(ch)] = i
    for row in range(half):
        s = strings[src[row]]
        kmers[row] = lut[np.frombuffer(
            s[starts[row]: starts[row] + k].encode(), dtype=np.uint8)]
    kmers[half:] = rng.randint(0, 4, size=(n_queries - half, k))
else:
    kmers[:] = rng.randint(0, 4, size=(n_queries, k))
weights = (1 << (2 * np.arange(k - 1, -1, -1, dtype=np.int64)))
keys_u = np.unique((kmers.astype(np.int64) @ weights).astype(np.uint64))

arrays = fm_stream.build_stream_arrays(fm)
ftab = fm_ops.build_ftab(fm, 11)
prep = fm_trie.prepare(keys_u, k, ftab)
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
dev = {"sched": jax.device_put(sched), "chars": jax.device_put(chars)}
for name in ("lo0", "hi0", "pbase", "dexc", "row_delta", "row_exc",
             "ftab_rows"):
    v = getattr(prep, name)
    dev[name] = jax.device_put(v) if v is not None else None
jax.block_until_ready([v for v in dev.values() if v is not None])

def trie_once(sched_a, chars_a):
    return fm_trie._trie_device(
        arrays, sched_a, chars_a, use_pallas=True,
        lo0=dev["lo0"], hi0=dev["hi0"], pbase=dev["pbase"],
        packed=packed, masked=masked, ftab_tab=ftab_tab,
        ftab_rows=dev["ftab_rows"], delta_wire=delta_wire,
        dexc=dev["dexc"], row_delta=dev["row_delta"],
        row_exc=dev["row_exc"], mask_derive=fm_trie._mask_derive(),
    )

# R reps inside one jit: scan over R stacked copies of the schedule,
# carry accumulates a real function of each rep's output — each rep
# reads a different xs slice and feeds the carry, so XLA can neither
# hoist, CSE, nor dead-code the trie (a `* 0` dependence was tried
# first and XLA folded the whole loop away; see git history)
@jax.jit
def trie_reps(sched_R, chars_R):
    def body(acc, xs):
        s2, c2 = xs
        lo, hi = trie_once(s2, c2)
        return acc + hi[0] - lo[0], None
    acc, _ = jax.lax.scan(body, jnp.int32(0), (sched_R, chars_R))
    return acc

def stack(a, reps):
    return jax.device_put(
        jnp.broadcast_to(a[None], (reps,) + a.shape).copy())

def timed(reps, iters=5):
    sR, cR = stack(dev["sched"], reps), stack(dev["chars"], reps)
    jax.block_until_ready([sR, cR])
    _ = int(np.asarray(trie_reps(sR, cR)))
    t0 = time.time()
    for _ in range(iters):
        _ = int(np.asarray(trie_reps(sR, cR)))
    return (time.time() - t0) / iters * 1e3

R1, R2 = 2, 10
t1 = timed(R1)
t2 = timed(R2)
per_batch_ms = (t2 - t1) / (R2 - R1)
# parity of the plain per-call route (sanity, not timing)
lo, hi = trie_once(dev["sched"], dev["chars"])
lo = np.asarray(lo)[prep.leaf_perm]
hi = np.asarray(hi)[prep.leaf_perm]
dense = fm_ops.to_device(fm, dense_occ=True)
sel = np.sort(np.random.RandomState(1).choice(len(keys_u), 4096, False))
codes = fm_ops.keys_to_codes(keys_u[sel], k)
l1, h1 = fm_ops.backward_search_codes(dense, jnp.asarray(codes))
l1, h1 = np.asarray(l1), np.asarray(h1)
ok = bool((h1 - l1 == hi[sel] - lo[sel]).all()
          and (l1[h1 > l1] == lo[sel][h1 > l1]).all())
out = {"variant": variant, "keymix": keymix, "keys": len(keys_u),
       "levels": int(sched.shape[0]),
       "t_R2_ms": round(t1, 1), "t_R10_ms": round(t2, 1),
       "device_ms_per_batch": round(per_batch_ms, 2),
       "device_kmers_per_s": round(
           len(keys_u) / max(per_batch_ms / 1e3, 1e-9), 0),
       "parity": ok}
print("RESULT " + json.dumps(out))
"""

VARIANTS = [
    # scan-route variants (PSI_TRIE_FUSED=0: the r4 rank4+compact form)
    ("flat_plain_real", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                         "PSI_TRIE_PACK": "0", "PSI_KEYMIX": "real",
                         "PSI_TRIE_FUSED": "0"}),
    ("flat_plain_rand", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                         "PSI_TRIE_PACK": "0", "PSI_KEYMIX": "rand",
                         "PSI_TRIE_FUSED": "0"}),
    ("flat_delta_real", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "delta",
                         "PSI_KEYMIX": "real", "PSI_TRIE_FUSED": "0"}),
    ("flat_packed_real", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "packed",
                          "PSI_KEYMIX": "real", "PSI_TRIE_FUSED": "0"}),
    ("flat_compactflat", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                          "PSI_TRIE_PACK": "0", "PSI_COMPACT": "flat",
                          "PSI_KEYMIX": "real", "PSI_TRIE_FUSED": "0"}),
    ("flat_compactslab", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                          "PSI_TRIE_PACK": "0", "PSI_COMPACT": "slab",
                          "PSI_KEYMIX": "real", "PSI_TRIE_FUSED": "0"}),
    ("mxu_plain_real", {"PSI_RANK4": "mxu", "PSI_TRIE_WIRE": "plain",
                        "PSI_TRIE_PACK": "0", "PSI_KEYMIX": "real",
                        "PSI_TRIE_FUSED": "0"}),
    ("pair_plain_real", {"PSI_RANK4": "flat", "PSI_TRIE_WIRE": "plain",
                         "PSI_TRIE_PACK": "0", "PSI_RANK4_PAIR": "1",
                         "PSI_KEYMIX": "real", "PSI_TRIE_FUSED": "0"}),
    # round-5 fused single-launch kernel (ops/fm_fused.py)
    ("fused_plain_real", {"PSI_TRIE_FUSED": "1", "PSI_TRIE_WIRE": "plain",
                          "PSI_TRIE_PACK": "0", "PSI_KEYMIX": "real"}),
    ("fused_plain_rand", {"PSI_TRIE_FUSED": "1", "PSI_TRIE_WIRE": "plain",
                          "PSI_TRIE_PACK": "0", "PSI_KEYMIX": "rand"}),
    ("fused_delta_real", {"PSI_TRIE_FUSED": "1", "PSI_TRIE_WIRE": "delta",
                          "PSI_KEYMIX": "real"}),
    ("fused_plain_s16", {"PSI_TRIE_FUSED": "1", "PSI_TRIE_WIRE": "plain",
                         "PSI_TRIE_PACK": "0", "PSI_KEYMIX": "real",
                         "PSI_FSLABS": "16"}),
    ("fused_plain_s32", {"PSI_TRIE_FUSED": "1", "PSI_TRIE_WIRE": "plain",
                         "PSI_TRIE_PACK": "0", "PSI_KEYMIX": "real",
                         "PSI_FSLABS": "32"}),
    # fused-kernel cost attribution (DIAGNOSTIC: parity=False expected)
    ("fused_ctl_empty", {"PSI_TRIE_FUSED": "1", "PSI_TRIE_WIRE": "plain",
                         "PSI_TRIE_PACK": "0", "PSI_KEYMIX": "real",
                         "PSI_FUSED_CTL": "empty"}),
    ("fused_ctl_noparent", {"PSI_TRIE_FUSED": "1",
                            "PSI_TRIE_WIRE": "plain",
                            "PSI_TRIE_PACK": "0", "PSI_KEYMIX": "real",
                            "PSI_FUSED_CTL": "noparent"}),
    ("fused_ctl_norank", {"PSI_TRIE_FUSED": "1", "PSI_TRIE_WIRE": "plain",
                          "PSI_TRIE_PACK": "0", "PSI_KEYMIX": "real",
                          "PSI_FUSED_CTL": "norank"}),
]

_only = os.environ.get("PSI_AB_ONLY")
if _only:
    keep = set(_only.split(","))
    VARIANTS = [v for v in VARIANTS if v[0] in keep]


def main():
    out_path = os.environ.get("PSI_AB_OUT", "/tmp/tpu_r4_reploop.json")
    results = {}
    if os.path.exists(out_path) and os.environ.get("PSI_AB_RESUME"):
        with open(out_path) as fh:
            results = json.load(fh)
    for name, envd in VARIANTS:
        if name in results:
            continue
        print(f"[{time.strftime('%H:%M:%S')}] measuring {name}",
              flush=True)
        env = dict(os.environ)
        env.update(envd)
        env["PSI_VARIANT"] = name
        try:
            run = subprocess.run([sys.executable, "-c", MEASURE],
                                 capture_output=True, timeout=2400,
                                 env=env)
        except subprocess.TimeoutExpired:
            print("timed out", flush=True)
            continue
        for line in run.stdout.decode().splitlines():
            if line.startswith("RESULT "):
                results[name] = json.loads(line[7:])
                print(json.dumps(results[name]), flush=True)
                break
        else:
            print("no RESULT; stderr:", run.stderr.decode()[-1200:],
                  flush=True)
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    print("done", flush=True)
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
