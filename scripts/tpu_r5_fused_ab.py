"""Overhead-cancelled rep-scan A/B for the fused trie kernel's
parent-gather unroll width (PSI_FUSED_PUNROLL) at the bench shape.

Runs each setting in a SUBPROCESS (the constant is read at module
import) and prints ms/batch via the (t(R2)-t(R1))/(R2-R1) method of
docs/SCALING.md "Run-to-run variance".

Usage: JAX_PLATFORMS=axon python scripts/tpu_r5_fused_ab.py [punrolls...]
"""

import os
import subprocess
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import jax, jax.numpy as jnp
from psi_tpu.cache import enable_compile_cache
enable_compile_cache(jax)
from psi_tpu.fmindex import FMIndex
from psi_tpu.ops import fm as fm_ops, fm_stream, fm_trie

rng = np.random.RandomState(42)
n_paths, size_mb, k = 4, 4.0, 20
path_len = int(size_mb * 1e6 / n_paths)
strings = ["".join(rng.choice(list("ACGT"), size=path_len))
           for _ in range(n_paths)]
fm = FMIndex.build_from_strings([s[::-1] for s in strings])
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

ftab_bits = 11
sarr = fm_stream.build_stream_arrays(fm)
sched = fm_trie.build_schedule(keys_u, k)
Npad = fm_stream.QTILE
while Npad < len(keys_u):
    Npad *= 2
ftab_np = fm_ops.build_ftab(fm, ftab_bits)
kpref, order = fm_trie._frontier_at(keys_u, k, ftab_bits)
ranges = ftab_np[kpref][order]
lo0 = jnp.asarray(fm_trie._pad_level(
    ranges[:, 0].astype(np.int32), Npad, int(ranges[-1, 0])))
hi0 = jnp.asarray(fm_trie._pad_level(
    ranges[:, 1].astype(np.int32), Npad, int(ranges[-1, 1])))
parents = jnp.asarray(np.stack([
    fm_trie._pad_level(p, Npad, max(int(p[-1]), 0))
    for p in sched.parents[ftab_bits:]
]))
chars_t = jnp.asarray(np.stack([
    fm_trie._pad_level(c, Npad, int(c[-1]))
    for c in sched.chars[ftab_bits:]
]))

def stack(a, reps):
    return jnp.broadcast_to(a[None], (reps,) + a.shape) + jnp.zeros(
        (1,), a.dtype)

@jax.jit
def reps_run(par_R, ch_R):
    def body(acc, xs):
        p1, c1 = xs
        l1, h1 = fm_trie._trie_device(
            sarr, p1, c1, use_pallas=True, lo0=lo0, hi0=hi0,
        )
        return acc + h1[0] - l1[0], None
    acc, _ = jax.lax.scan(body, jnp.int32(0), (par_R, ch_R))
    return acc

times = {}
for R in (1, 5):
    pR, cR = stack(parents, R), stack(chars_t, R)
    _ = int(np.asarray(reps_run(pR, cR)))
    t0 = time.monotonic()
    for _ in range(3):
        _ = int(np.asarray(reps_run(pR, cR)))
    times[R] = (time.monotonic() - t0) / 3
per = (times[5] - times[1]) / 4
print(f"RESULT {per*1e3:.2f} ms/batch {len(keys_u)/per/1e6:.1f} Mkeys/s")
"""


def main():
    vals = sys.argv[1:] or ["4", "5", "6", "8"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for v in vals:
        env = dict(os.environ)
        env["PSI_FUSED_PUNROLL"] = v
        env.setdefault("PSI_TRIE_FUSED", "1")
        r = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": repo}],
            capture_output=True, timeout=1800, env=env, text=True,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        print(f"PUNROLL={v}: {line[0] if line else 'FAILED'}", flush=True)
        if not line:
            print(r.stderr[-2000:], flush=True)


if __name__ == "__main__":
    main()
