"""Wait for a healthy TPU window, then A/B the Pallas kernels vs XLA.

Measures: XLA dense gather, Pallas double-buffered row gather, Pallas
blocked gather (sorted pointers), on identical position batches.
Writes /tmp/tpu_pallas_ab.json on success.
"""

import json
import os
import subprocess
import sys
import time

MEASURE = r"""
import time, numpy as np
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from psi_tpu.cache import compile_cache_dir
jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from psi_tpu.fmindex import FMIndex
from psi_tpu.ops import fm_pallas as fp

rng = np.random.RandomState(0)
s = "".join(rng.choice(list("ACGT"), size=4_000_000))
fm = FMIndex.build_from_strings([s[::-1]])
occ8_np = fp.occ_dense_padded(fm)
pad = (-occ8_np.shape[0]) % fp.H_ROWS
occ8_pad = np.concatenate([occ8_np, np.zeros((pad, 8), np.int32)])
occ8 = jnp.asarray(occ8_pad)
M = 1 << 20
pos_np = rng.randint(0, fm.size + 1, size=M).astype(np.int32)
pos = jnp.asarray(pos_np)
out = {}

# XLA gather
xg = jax.jit(lambda o, p: o[p, :])
t = time.time(); r = np.asarray(xg(occ8, pos)); out["xla_compile_s"] = round(time.time()-t, 1)
t = time.time()
for _ in range(5): r = np.asarray(xg(occ8, pos))
out["xla_rows_per_s"] = round(M / ((time.time()-t)/5), 1)
expect = occ8_pad[pos_np]
assert (r == expect).all()

# Pallas per-row double-buffered gather (small M only; per-row DMA)
try:
    Msmall = 1 << 14
    t = time.time()
    r2 = np.asarray(fp.gather_occ_rows(occ8, pos[:Msmall]))
    out["pallas_rowdma_compile_s"] = round(time.time()-t, 1)
    t = time.time()
    for _ in range(3): r2 = np.asarray(fp.gather_occ_rows(occ8, pos[:Msmall]))
    out["pallas_rowdma_rows_per_s"] = round(Msmall / ((time.time()-t)/3), 1)
    assert (r2 == expect[:Msmall]).all()
except Exception as e:
    out["pallas_rowdma_error"] = repr(e)[:200]

# Pallas blocked gather
try:
    t = time.time()
    r3 = fp.gather_occ_rows_blocked(occ8_pad, pos_np)
    out["pallas_blocked_first_s"] = round(time.time()-t, 1)
    t = time.time()
    for _ in range(3): r3 = fp.gather_occ_rows_blocked(occ8_pad, pos_np)
    out["pallas_blocked_rows_per_s"] = round(M / ((time.time()-t)/3), 1)
    assert (r3 == expect).all()
except Exception as e:
    out["pallas_blocked_error"] = repr(e)[:200]

# full backward-search throughput per rank layout
from psi_tpu.ops import fm as fm_ops
codes = jnp.asarray(np.random.RandomState(1).randint(1, 5, (1 << 19, 20)).astype(np.int32))
for name, arr in (
    ("checkpointed", fm_ops.to_device(fm)),
    ("bitplane", fm_ops.to_device(fm, bitplanes=True)),
    ("dense", fm_ops.to_device(fm, dense_occ=True)),
):
    t = time.time()
    lo, hi = fm_ops.backward_search_codes(arr, codes); np.asarray(lo)
    out[f"bs_{name}_compile_s"] = round(time.time() - t, 1)
    t = time.time()
    for _ in range(3):
        lo, hi = fm_ops.backward_search_codes(arr, codes); np.asarray(lo)
    out[f"bs_{name}_kmers_per_s"] = round(codes.shape[0] / ((time.time()-t)/3), 1)

import json
print("RESULT " + json.dumps(out))
"""


def main():
    deadline = time.time() + float(os.environ.get("TPU_WAIT_S", "14400"))
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp, numpy as np;"
                 "print(float(np.asarray(jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))"],
                capture_output=True, timeout=60,
            )
            healthy = probe.returncode == 0 and b"8.0" in probe.stdout
        except subprocess.TimeoutExpired:
            healthy = False
        print(f"[{time.strftime('%H:%M:%S')}] attempt {attempt}: "
              f"{'healthy' if healthy else 'down'}", flush=True)
        if healthy:
            try:
                run = subprocess.run(
                    [sys.executable, "-c", MEASURE],
                    capture_output=True, timeout=1200,
                )
                txt = run.stdout.decode()
                print(txt[-2000:], flush=True)
                err = run.stderr.decode()
                if err.strip():
                    print("STDERR:", err[-1200:], flush=True)
                for line in txt.splitlines():
                    if line.startswith("RESULT "):
                        with open("/tmp/tpu_pallas_ab.json", "w") as fh:
                            fh.write(line[len("RESULT "):])
                        print("saved; done", flush=True)
                        return 0
            except subprocess.TimeoutExpired:
                print("measurement timed out; retrying", flush=True)
        time.sleep(45)
    return 1


if __name__ == "__main__":
    sys.exit(main())
