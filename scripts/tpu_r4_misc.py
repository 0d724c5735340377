"""Round-4 leftover device measurements (VERDICT r3 #5): the
PSI_EXPAND=scatter occurrence-expansion variant vs the searchsorted
default, baseline-subtracted on the bench shape (Npad = 2^19 slots,
cap = 2^20). Equality of the two device outputs is asserted on the
live region. Writes /tmp/tpu_r4_misc.json.

(The SLABS grid-step sweep re-runs through scripts/tpu_r3_kernels.py
with PSI_AB_ONLY=slab16,slab32 — same harness, recorded together.)
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
from psi_tpu.ops import fm_trie

variant = os.environ["PSI_EXPAND"]
rng = np.random.RandomState(3)
Npad = 1 << 19
cap = 1 << 20
n = 4_000_000
k = 20
sa = jnp.asarray(rng.randint(0, n, size=n).astype(np.int32))
str_starts = jnp.asarray(
    np.array([0, n // 4, n // 2, 3 * n // 4, n], dtype=np.int32)
)
lengths = jnp.asarray(np.full(4, n // 4, dtype=np.int32))
seq_off = jnp.asarray(
    np.array([0, n // 4, n // 2, 3 * n // 4, n], dtype=np.int32)
)
w = rng.poisson(1.0, size=Npad).astype(np.int32)
lo = np.sort(rng.randint(0, n - 8, size=Npad)).astype(np.int32)
hi = (lo + w).astype(np.int32)
lo_d, hi_d = jnp.asarray(lo), jnp.asarray(hi)
nl = jnp.asarray(Npad, dtype=jnp.int32)
thr = jnp.asarray(2**31 - 1, dtype=jnp.int32)

def run():
    return fm_trie._expand_locate_device(
        sa, str_starts, lengths, seq_off, lo_d, hi_d, nl, thr, k, cap
    )

t0 = time.time()
gpos, total = run()
gp = np.asarray(gpos); tot = int(np.asarray(total))
compile_s = time.time() - t0
tiny = jnp.ones(8, dtype=jnp.int32)
_ = int(np.asarray(jnp.sum(tiny + 1)))
t0 = time.time()
for _ in range(10):
    _ = int(np.asarray(jnp.sum(tiny + 1)))
base_ms = (time.time() - t0) / 10 * 1e3

REPS = 10

@jax.jit
def many(lo_q):
    def body(i, acc):
        l2 = jnp.where(acc < 0, lo_q + 1, lo_q)
        g, t = fm_trie._expand_locate_device(
            sa, str_starts, lengths, seq_off, l2, hi_d, nl, thr, k, cap
        )
        return acc + g[0]

    return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

_ = int(np.asarray(many(lo_d)))
t0 = time.time()
for _ in range(5):
    _ = int(np.asarray(many(lo_d)))
dev_ms = max((time.time() - t0) / 5 * 1e3 - base_ms, 0.0) / REPS

out = {"variant": variant, "Npad": Npad, "cap": cap, "total": tot,
       "compile_s": round(compile_s, 1),
       "device_ms_per_expand": round(dev_ms, 2),
       "gpos_head": [int(x) for x in gp[:8]]}
print("RESULT " + json.dumps(out))
"""

VARIANTS = [("search", {"PSI_EXPAND": "search"}),
            ("scatter", {"PSI_EXPAND": "scatter"})]


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
    out_path = "/tmp/tpu_r4_misc.json"
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
        try:
            run = subprocess.run([sys.executable, "-c", MEASURE],
                                 capture_output=True, timeout=1800, env=env)
            for line in run.stdout.decode().splitlines():
                if line.startswith("RESULT "):
                    results[name] = json.loads(line[len("RESULT "):])
                    print(json.dumps(results[name]), flush=True)
                    pending.pop(name)
                    break
            else:
                print("no RESULT; stderr:", run.stderr.decode()[-1200:],
                      flush=True)
                time.sleep(30)
        except subprocess.TimeoutExpired:
            print("variant timed out; retrying", flush=True)
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    if len(results) == 2:
        a, b = results["search"], results["scatter"]
        same = a["gpos_head"] == b["gpos_head"] and a["total"] == b["total"]
        results["outputs_equal_head"] = bool(same)
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)
    print("done:", json.dumps(results), flush=True)
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
