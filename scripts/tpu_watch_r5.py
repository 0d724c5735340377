"""Round-5 tunnel watcher: wait for a healthy TPU window, then run (in
order, each resumable):

  1. the hardware kernel parity suite -> docs/TPU_PARITY_r05.json
  2. the fused-kernel rep-loop A/B     -> /tmp/tpu_r5_reploop.json
  3. bench.py (sustained)              -> /tmp/bench_r5_tpu.json + stderr log

State in /tmp/tpu_watch_r5.state (one line per completed stage) so a
restarted watcher skips what's done. Probes every PROBE_INTERVAL until
WATCH_DEADLINE_S elapses.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = "/tmp/tpu_watch_r5.state"
PROBE_INTERVAL = int(os.environ.get("PSI_WATCH_INTERVAL", "120"))
DEADLINE = time.time() + int(os.environ.get("PSI_WATCH_DEADLINE", "21600"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def done_stages():
    try:
        with open(STATE) as fh:
            return set(fh.read().split())
    except OSError:
        return set()


def mark(stage):
    with open(STATE, "a") as fh:
        fh.write(stage + "\n")


def probe():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = jnp.ones((8, 8)); print(float(np.asarray(x @ x)[0, 0]))"
    )
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, timeout=120, env=env)
        return out.returncode == 0 and b"8.0" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def run_stage(name, cmd, timeout, extra_env=None):
    log(f"stage {name}: {' '.join(cmd)}")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env["PSI_AB_RESUME"] = "1"
    env["PSI_PARITY_RESUME"] = "1"
    if extra_env:
        env.update(extra_env)
    logf = open(f"/tmp/tpu_watch_r5_{name}.log", "ab")
    try:
        rc = subprocess.run(cmd, stdout=logf, stderr=subprocess.STDOUT,
                            timeout=timeout, env=env, cwd=REPO).returncode
    except subprocess.TimeoutExpired:
        log(f"stage {name}: TIMEOUT")
        return False
    finally:
        logf.close()
    log(f"stage {name}: rc={rc}")
    return rc == 0


STAGES = [
    ("parity", [sys.executable, "scripts/tpu_parity_suite.py", "r05"],
     7200, None),
    ("reploop", [sys.executable, "scripts/tpu_r4_reploop.py"],
     10800,
     {"PSI_AB_ONLY": "pair_plain_real,fused_plain_real,fused_plain_rand,"
                     "fused_delta_real,fused_plain_s16,fused_plain_s32",
      "PSI_AB_OUT": "/tmp/tpu_r5_reploop.json"}),
    ("bench", [sys.executable, "bench.py"], 3600,
     {"PSI_BENCH_FORCE_TPU": "1"}),
]


def main():
    while time.time() < DEADLINE:
        done = done_stages()
        todo = [s for s in STAGES if s[0] not in done]
        if not todo:
            log("all stages complete")
            return 0
        if not probe():
            log("tunnel down; sleeping")
            time.sleep(PROBE_INTERVAL)
            continue
        log("tunnel healthy")
        name, cmd, timeout, extra = todo[0]
        if name == "bench":
            # capture bench stdout (the JSON line) separately
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "axon"
            env["PSI_BENCH_FORCE_TPU"] = "1"
            try:
                out = subprocess.run(cmd, capture_output=True,
                                     timeout=timeout, env=env, cwd=REPO)
            except subprocess.TimeoutExpired:
                log("bench TIMEOUT")
                continue
            with open("/tmp/tpu_watch_r5_bench.log", "ab") as fh:
                fh.write(out.stderr)
            ok = False
            for line in out.stdout.decode().splitlines():
                if line.startswith("{"):
                    with open("/tmp/bench_r5_tpu.json", "w") as fh:
                        fh.write(line + "\n")
                    log("bench: " + line[:200])
                    ok = True
            if ok:
                mark(name)
            continue
        if run_stage(name, cmd, timeout, extra):
            mark(name)
        # loop re-probes before the next stage
    log("deadline reached")
    return 0


if __name__ == "__main__":
    sys.exit(main())
