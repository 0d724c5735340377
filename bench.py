"""Benchmark: batched FM backward search (the engine's hot kernel) on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = speedup over the single-core host (NumPy) backward search —
the stand-in for the reference's single-thread sdsl inner loop, since the
reference repo publishes no absolute numbers (BASELINE.md) and its C++
toolchain cannot be built in this zero-egress image.
"""

import json
import os
import sys
import time

import numpy as np


def probe_tpu(timeout_s: int = 90, attempts: int = 3) -> bool:
    """Check TPU reachability in a subprocess (the tunnel can wedge a
    process forever; a stuck probe must not hang the benchmark). The
    tunnel flaps, so retry a few times before giving up."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = jnp.ones((8, 8));"
        "print(float(np.asarray(x @ x)[0, 0]))"
    )
    for i in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                timeout=timeout_s,
            )
            if out.returncode == 0 and b"8.0" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            time.sleep(30)
    return False


def main():
    size_mb = float(os.environ.get("PSI_BENCH_MB", "4"))
    n_queries = int(os.environ.get("PSI_BENCH_QUERIES", str(1 << 19)))
    k = int(os.environ.get("PSI_BENCH_K", "20"))
    iters = int(os.environ.get("PSI_BENCH_ITERS", "5"))

    on_tpu = os.environ.get("JAX_PLATFORMS", "") == "axon"
    if on_tpu and not probe_tpu():
        # TPU tunnel unreachable: fall back to CPU with an explicit
        # metric name so the number is never mistaken for a chip result
        print("# TPU tunnel unreachable; benchmarking on CPU", file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"
        on_tpu = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    if not on_tpu and os.environ.get("JAX_PLATFORMS", "") != "axon":
        jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

    # persistent compile cache: first compile through the remote-compile
    # relay can take minutes; reruns hit the cache
    cache_dir = os.environ.get(
        "PSI_COMPILE_CACHE", os.path.expanduser("~/.cache/psi_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from psi_tpu.fmindex import FMIndex
    from psi_tpu.ops import fm as fm_ops

    rng = np.random.RandomState(42)
    n_paths = 4
    path_len = int(size_mb * 1e6 / n_paths)
    strings = [
        "".join(rng.choice(list("ACGT"), size=path_len)) for _ in range(n_paths)
    ]

    t0 = time.monotonic()
    fm = FMIndex.build_from_strings([s[::-1] for s in strings])
    build_s = time.monotonic() - t0
    print(f"# index build: {build_s:.1f}s for {size_mb}MB text", file=sys.stderr)

    # query batch: half true substrings, half random
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
    codes = (kmers + 1).astype(np.int32)

    codes_d = jnp.asarray(codes)

    def force(lo, hi):
        # force execution with an 8-byte fetch: block_until_ready is
        # deferred on the remote platform, and fetching the full result
        # would measure tunnel bandwidth, not the kernel
        return int(np.asarray(jnp.sum(hi - lo)))

    def run_mode(name, search=None, codes_for=None, **kw):
        if search is None:
            arrays = fm_ops.to_device(fm, **kw)
            search = lambda c: fm_ops.backward_search_codes(arrays, c)
        cd = codes_d if codes_for is None else codes_for
        t0 = time.monotonic()
        lo, hi = search(cd)
        force(lo, hi)
        print(
            f"# {name} compile+first run: {time.monotonic()-t0:.1f}s",
            file=sys.stderr,
        )
        t0 = time.monotonic()
        for _ in range(iters):
            lo, hi = search(cd)
            force(lo, hi)
        dt = (time.monotonic() - t0) / iters
        return n_queries / dt, dt, lo, hi

    ftab_bits = int(os.environ.get("PSI_BENCH_FTAB", "11"))
    rates = {}
    for name, kw in (
        ("checkpointed", {}),
        ("bitplane", {"bitplanes": True}),
        ("dense", {"dense_occ": True}),
        ("bitplane+ftab", {"bitplanes": True, "ftab_bits": ftab_bits}),
        ("dense+ftab", {"dense_occ": True, "ftab_bits": ftab_bits}),
    ):
        rate, dt, lo, hi = run_mode(name, **kw)
        rates[name] = (rate, dt)

    # trie-batched search (production on-path route: distinct sorted
    # keys; Pallas frontier kernels on TPU). Host schedule build is a
    # per-chunk host cost, reported separately.
    try:
        from psi_tpu.ops import fm_stream, fm_trie

        weights = (1 << (2 * np.arange(k - 1, -1, -1, dtype=np.int64)))
        keys_u = np.unique(
            (kmers.astype(np.int64) @ weights).astype(np.uint64)
        )
        sarr = fm_stream.build_stream_arrays(fm)
        t0 = time.monotonic()
        sched = fm_trie.build_schedule(keys_u, k)
        print(
            f"# trie host schedule: {time.monotonic()-t0:.2f}s "
            f"for {len(keys_u)} distinct keys",
            file=sys.stderr,
        )
        Npad = fm_stream.QTILE
        while Npad < len(keys_u):
            Npad *= 2
        # ftab-seeded start: levels 1..p replaced by one host lookup
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
        use_pallas = on_tpu

        def trie_run(_):
            return fm_trie._trie_device(
                sarr, parents, chars_t, use_pallas=use_pallas,
                lo0=lo0, hi0=hi0,
            )

        rate, dt, lo, hi = run_mode("trie", search=trie_run)
        # normalize: trie processed len(keys_u) distinct keys
        rate = rate * len(keys_u) / n_queries
        rates["trie"] = (rate, dt)
    except Exception as exc:  # pallas availability is platform-specific
        print(f"# trie mode unavailable: {exc}", file=sys.stderr)
    print(
        "# "
        + "; ".join(f"{k}: {v[0]:.3e} kmers/s" for k, v in rates.items()),
        file=sys.stderr,
    )
    best = max(rates, key=lambda k: rates[k][0])
    device_rate, device_s = rates[best]

    # host single-core baseline on a sample
    n_host = min(2000, n_queries)
    t0 = time.monotonic()
    for row in range(n_host):
        pat = "".join("ACGT"[c - 1] for c in codes[row])
        fm.backward_search(pat[::-1])
    host_s = time.monotonic() - t0
    host_rate = n_host / host_s

    counts = np.asarray(hi - lo)
    print(
        f"# device: {device_rate:.3e} kmers/s ({device_s*1e3:.1f} ms/batch); "
        f"host: {host_rate:.3e} kmers/s; hits: {int((counts > 0).sum())}",
        file=sys.stderr,
    )
    result = {
        "metric": (
            "fm_backward_search_throughput"
            if on_tpu
            else "fm_backward_search_throughput_cpu_fallback"
        ),
        "value": round(device_rate, 1),
        "unit": "kmer_queries/s",
        "vs_baseline": round(device_rate / host_rate, 2),
        "platform": "tpu" if on_tpu else "cpu",
    }

    # the hot kernel is random-gather-bound; on this relay the local CPU
    # XLA dense path can beat the remote chip — measure both and report
    # the best, honestly labeled (child run on CPU when we ran on TPU)
    if on_tpu and not os.environ.get("PSI_BENCH_CHILD"):
        import subprocess

        env = dict(os.environ)
        env["PSI_BENCH_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["PSI_BENCH_ITERS"] = "3"
        try:
            child = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, timeout=600, env=env,
            )
            for line in child.stdout.decode().splitlines():
                if line.startswith("{"):
                    cpu_res = json.loads(line)
                    print(
                        f"# cpu comparison: {cpu_res['value']:.3e} kmers/s",
                        file=sys.stderr,
                    )
                    if cpu_res["value"] > result["value"]:
                        result = cpu_res
                        result["metric"] = "fm_backward_search_throughput"
                        result["platform"] = "cpu (beat tpu: gather-bound kernel)"
        except Exception as exc:  # comparison is best-effort
            print(f"# cpu comparison failed: {exc}", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
