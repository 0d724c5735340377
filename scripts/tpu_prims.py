"""Micro-bench of the select/expand primitive candidates on the real
TPU, at the sustained-bench shapes (Npad=512K children, 2M mask bits,
cap=1M occurrence expansion).

The derive/expand steps of the small wire formats and the device
locate reduce to one of: searchsorted (binary-search gathers), stable
sort, scatter(+cummax), cumsum. This measures each in isolation with
the dispatch+fetch baseline subtracted (CLAUDE.md method), so wire/
kernel decisions are driven by measured per-primitive cost, not
lowering folklore.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from psi_tpu.cache import compile_cache_dir
jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 19          # children / queries
M4 = 4 * N           # mask bits
CAP = 1 << 20        # occurrence expansion width

rng = np.random.RandomState(7)
bits = (rng.rand(M4) < (N / M4) * 0.9).astype(np.int32)
cs_h = np.cumsum(bits).astype(np.int32)
w_h = rng.randint(0, 3, size=N).astype(np.int32)
csum_h = np.cumsum(w_h).astype(np.int32)
d8_h = rng.randint(0, 5, size=N).astype(np.uint8)

bits_d = jnp.asarray(bits)
cs_d = jnp.asarray(cs_h)
csum_d = jnp.asarray(csum_h)
d8_d = jnp.asarray(d8_h)
w_d = jnp.asarray(w_h)


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    _ = np.asarray(jnp.sum(out))      # compile + warm
    t0 = time.time()
    for _ in range(iters):
        _ = np.asarray(jnp.sum(fn(*args)))
    dt = (time.time() - t0) / iters * 1e3
    return name, dt


@jax.jit
def f_searchsorted_big(cs):
    tq = jnp.minimum(jnp.arange(N, dtype=jnp.int32) + 1, cs[-1])
    return jnp.searchsorted(cs, tq, side="left").astype(jnp.int32)


@jax.jit
def f_searchsorted_expand(csum):
    occ = jnp.arange(CAP, dtype=jnp.int32)
    return jnp.searchsorted(csum, occ, side="right").astype(jnp.int32)


@jax.jit
def f_sort_1op(b):
    key = jnp.arange(M4, dtype=jnp.int32) + (1 - b) * M4
    return jax.lax.sort(key)[:N]


@jax.jit
def f_sort_pair(b):
    key = jnp.arange(M4, dtype=jnp.int32) + (1 - b) * M4
    _, v = jax.lax.sort((key, key), num_keys=1, is_stable=True)
    return v[:N]


@jax.jit
def f_cumsum_small(d8):
    return jnp.cumsum(d8.astype(jnp.int32))


@jax.jit
def f_cumsum_big(b):
    return jnp.cumsum(b)


@jax.jit
def f_scatter_small(d8):
    d = d8.astype(jnp.int32)
    idx = jnp.arange(64, dtype=jnp.int32) * 8
    return d.at[idx].add(1, mode="drop")


@jax.jit
def f_scatter_cummax_expand(w, csum):
    # expansion via scatter-max of slot ids at run starts + cummax
    starts = csum - w
    slot = jnp.arange(N, dtype=jnp.int32)
    z = jnp.zeros(CAP, dtype=jnp.int32)
    z = z.at[jnp.where(w > 0, starts, CAP)].max(slot + 1, mode="drop")
    return jax.lax.associative_scan(jnp.maximum, z) - 1


@jax.jit
def f_cummax_only(b):
    return jax.lax.associative_scan(jnp.maximum, b)


@jax.jit
def f_gather_small_table(d8):
    # 512K gathers from a 4-element table (the delta-wire `pick` risk)
    tab = jnp.arange(4, dtype=jnp.int32)
    seg = d8.astype(jnp.int32) & 3
    return tab[seg]


def main():
    results = {}
    # dispatch+fetch baseline
    tiny = jnp.ones(8, dtype=jnp.int32)
    _ = np.asarray(jnp.sum(tiny + 1))
    t0 = time.time()
    for _ in range(10):
        _ = np.asarray(jnp.sum(tiny + 1))
    base = (time.time() - t0) / 10 * 1e3
    results["dispatch_baseline_ms"] = round(base, 1)
    for name, fn, args in [
        ("searchsorted_2M_512K", f_searchsorted_big, (cs_d,)),
        ("searchsorted_512K_1M", f_searchsorted_expand, (csum_d,)),
        ("sort_2M_1op", f_sort_1op, (bits_d,)),
        ("sort_2M_pair", f_sort_pair, (bits_d,)),
        ("cumsum_512K", f_cumsum_small, (d8_d,)),
        ("cumsum_2M", f_cumsum_big, (bits_d,)),
        ("scatter_add_64", f_scatter_small, (d8_d,)),
        ("scatter_cummax_expand_1M", f_scatter_cummax_expand,
         (w_d, csum_d)),
        ("cummax_2M", f_cummax_only, (bits_d,)),
        ("gather_tab4_512K", f_gather_small_table, (d8_d,)),
    ]:
        try:
            n, ms = timeit(name, fn, *args)
            results[n] = round(max(ms - base, 0.0), 2)
            print(f"{n}: {results[n]} ms (raw {ms:.1f})", flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = f"error: {exc}"[:200]
            print(name, "ERROR", str(exc)[:200], flush=True)
    with open("/tmp/tpu_prims.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
