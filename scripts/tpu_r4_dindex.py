"""Round-4 device distance-index probe A/B on the real TPU: sort-merge
vs bisection probes (ops/dindex_probe.py) on a synthetic chr-scale
index (2^20 supernode rows, ~8 intervals each -> 2^23 interval rows),
with exact parity vs the host searchsorted probe.

Reports both the DEVICE rate (inputs resident, K probes in one jit —
the production PCIe-host number) and the tunnel end-to-end rate.
Writes /tmp/tpu_r4_dindex.json.
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
from psi_tpu.dindex import DistanceIndex
from psi_tpu.ops import dindex_probe

variant = os.environ["PSI_VARIANT"]
B = int(os.environ.get("PSI_B", str(1 << 20)))
rng = np.random.RandomState(7)

# synthetic chr-scale index: S supernodes, ~8 interval rows each with
# ascending dst + disjoint intervals per (src, dst)
S = 1 << 20
dmin, dmax = 100, 10_000
per = rng.poisson(8, size=S).astype(np.int64)
nrows = int(per.sum())
idx = DistanceIndex(dmin, dmax)
idx.n_nodes = S
idx.src_indptr = np.concatenate([[0], np.cumsum(per)])
dst_l, lo_l, hi_l = [], [], []
for s in range(0, S, 1 << 16):
    e = min(s + (1 << 16), S)
    cnt = per[s:e]
    tot = int(cnt.sum())
    d = rng.randint(1, S, size=tot)
    a = rng.randint(0, dmax - 1, size=tot)
    b = np.minimum(a + rng.randint(0, 50, size=tot), dmax - 1)
    # sort (dst, lo) within each row segment
    row = np.repeat(np.arange(e - s), cnt)
    order = np.lexsort((a, d, row))
    dst_l.append(d[order]); lo_l.append(a[order]); hi_l.append(b[order])
idx.dst = np.concatenate(dst_l)
idx.iv_lo = np.concatenate(lo_l)
idx.iv_hi = np.concatenate(hi_l)
# dedupe (src, dst, lo) collisions is unnecessary for timing; host and
# device probes see the identical rows, so parity still holds exactly
idx.sup = np.arange(S + 1, dtype=np.int64)   # node i -> supernode i
idx.head = np.zeros(S + 1, dtype=np.int64)
idx.tail = np.zeros(S + 1, dtype=np.int64)

q_src = rng.randint(0, S, size=B).astype(np.int64)
q_dst = rng.randint(1, S, size=B).astype(np.int64)
# half the queries probe EXISTING pairs so hits occur
sel = rng.randint(0, len(idx.dst), size=B // 2)
rowid = np.searchsorted(idx.src_indptr, sel, side="right") - 1
q_src[: B // 2] = rowid
q_dst[: B // 2] = idx.dst[sel]
s_lo = rng.randint(0, dmax, size=B).astype(np.int64)
s_hi = s_lo + rng.randint(0, 200, size=B)
ok_q = np.ones(B, dtype=bool)

t0 = time.time()
host = idx._probe_pairs(q_src, q_dst, s_lo, s_hi, ok_q)
host_s = time.time() - t0

os.environ["PSI_DINDEX_PROBE"] = variant
t0 = time.time()
dev = idx._probe_pairs_device(q_src, q_dst, s_lo, s_hi, ok_q)
compile_s = time.time() - t0
parity = bool((host == dev).all())

# end-to-end (tunnel) rate
iters = 3
t0 = time.time()
for _ in range(iters):
    dev = idx._probe_pairs_device(q_src, q_dst, s_lo, s_hi, ok_q)
e2e_s = (time.time() - t0) / iters

# device rate: inputs resident, K probes inside one jit (acc-dependent
# so XLA cannot hoist), 8-byte fetch
tabs = idx._device_tables()
nrows_i = len(idx.src_indptr) - 1
s_hi_c = np.minimum(s_hi, np.int64(idx._pk_ivbase - 1))
qkey = ((q_src * np.int64(nrows_i + 2) + q_dst) * idx._pk_ivbase
        + np.maximum(s_hi_c, 0))
args = [tabs["pk_hi"], tabs["pk_lo"], tabs["src"], tabs["dst"],
        tabs["iv_lo"], tabs["iv_hi"],
        jnp.asarray((qkey >> 31).astype(np.int32)),
        jnp.asarray((qkey & np.int64(0x7FFFFFFF)).astype(np.int32)),
        jnp.asarray(q_src.astype(np.int32)),
        jnp.asarray(q_dst.astype(np.int32)),
        jnp.asarray(np.clip(s_lo, -2**31, 2**31 - 1).astype(np.int32)),
        jnp.asarray(np.clip(s_hi, -2**31, 2**31 - 1).astype(np.int32))]
fn = (dindex_probe.probe_sort if variant == "sort"
      else dindex_probe.probe_bisect)
REPS = 10

@jax.jit
def many(qh, ql, rest):
    def body(i, acc):
        qh2 = jnp.where(acc < 0, qh + 1, qh)
        r = fn(rest[0], rest[1], rest[2], rest[3], rest[4], rest[5],
               qh2, ql, rest[6], rest[7], rest[8], rest[9])
        return acc + r[0].astype(jnp.int32)

    return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

rest = [args[0], args[1], args[2], args[3], args[4], args[5],
        args[8], args[9], args[10], args[11]]
_ = int(np.asarray(many(args[6], args[7], rest)))
tiny = jnp.ones(8, dtype=jnp.int32)
_ = int(np.asarray(jnp.sum(tiny + 1)))
t0 = time.time()
for _ in range(5):
    _ = int(np.asarray(jnp.sum(tiny + 1)))
base_ms = (time.time() - t0) / 5 * 1e3
t0 = time.time()
for _ in range(3):
    _ = int(np.asarray(many(args[6], args[7], rest)))
dev_ms = max((time.time() - t0) / 3 * 1e3 - base_ms, 0.0) / REPS

out = {"variant": variant, "B": B, "interval_rows": len(idx.dst),
       "parity": parity, "compile_s": round(compile_s, 1),
       "host_pairs_per_s": round(B / host_s, 0),
       "e2e_pairs_per_s": round(B / e2e_s, 0),
       "device_ms_per_probe": round(dev_ms, 1),
       "device_pairs_per_s": round(B / (dev_ms / 1e3), 0)}
print("RESULT " + json.dumps(out))
"""

VARIANTS = [
    ("sort", {}),
    ("bisect", {}),
    ("sort_4m", {"PSI_B": str(1 << 22)}),
    ("bisect_4m", {"PSI_B": str(1 << 22)}),
]


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
    out_path = "/tmp/tpu_r4_dindex.json"
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
        env["PSI_VARIANT"] = name.split("_")[0]
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
