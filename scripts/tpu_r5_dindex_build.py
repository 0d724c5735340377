"""Device vs host distance-index BUILD at the 100 Mbp shape
(VERDICT r4 item 4's perf half; the parity half is test-pinned in
tests/test_dindex.py).

Generates the BENCH_NOTES round-4 builder workload (100 Mbp pan-genome,
bubble every ~350 bp, dmin=1000 dmax=10000 -> 74.6 M intervals), then:

  1. host native OpenMP reverse-topo DP (native/psi_dindex.cpp) timing
  2. device interval-semiring path doubling (ops/dindex_build.py):
     cold (compile excluded via one warm-up at a smaller hinted shape
     is NOT possible — capacities are static — so the first call's
     compile is reported separately from a second, warm call) + parity

Writes /tmp/tpu_r5_dindex_build.json.

Usage: JAX_PLATFORMS=axon python scripts/tpu_r5_dindex_build.py [mbp]
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    out_path = os.environ.get(
        "PSI_OUT", "/tmp/tpu_r5_dindex_build.json"
    )
    import jax

    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat:
        jax.config.update("jax_platforms", plat)
    from psi_tpu.cache import enable_compile_cache

    enable_compile_cache(jax)

    from psi_tpu.simulate import make_pangenome_graph
    from psi_tpu.dindex import contract_chains
    from psi_tpu.ops import dindex_build
    from psi_tpu import native

    dmax = int(os.environ.get("PSI_DMAX", "10000"))
    ncomp = int(os.environ.get("PSI_NCOMP", "16"))
    res = {"mbp": mbp, "dmax": dmax, "ncomp": ncomp,
           "platform": jax.default_backend()}
    t0 = time.time()
    graph = make_pangenome_graph(
        int(mbp * 1e6), variant_rate=1.0 / 350, indel_frac=0.2, seed=7,
        n_components=ncomp,
    )
    res["graph_gen_s"] = round(time.time() - t0, 1)
    res["nodes"] = int(graph.node_count)
    node_len = np.diff(graph.label_offsets)

    t0 = time.time()
    sup, head, tail, sup_len, s_indptr, s_indices = contract_chains(
        node_len, graph.out_indptr, graph.out_indices
    )
    res["contract_s"] = round(time.time() - t0, 1)
    res["supernodes"] = int(len(sup_len))
    res["sup_edges"] = int(len(s_indices))
    print(f"graph {res['nodes']} nodes -> {res['supernodes']} supernodes, "
          f"{res['sup_edges']} edges", flush=True)

    t0 = time.time()
    nat = native.dindex_super_build(sup_len, s_indptr, s_indices, dmax)
    res["host_build_s"] = round(time.time() - t0, 1)
    res["intervals"] = int(len(nat[1]))
    print(f"host native build: {res['host_build_s']}s, "
          f"{res['intervals']} intervals", flush=True)

    e_hint = int(os.environ.get("PSI_EHINT", "0")) or (1 << max(
        int(res["intervals"] / ncomp * 1.5 - 1).bit_length(), 10
    ))
    res["e_hint"] = e_hint
    os.environ.setdefault("PSI_DINDEX_CBATCH", "4")
    res["cbatch"] = os.environ["PSI_DINDEX_CBATCH"]

    t0 = time.time()
    n_dev = dindex_build.build_super_device_per_component(
        sup_len, s_indptr, s_indices, dmax, e_hint=e_hint,
        stats_only=True,
    )
    res["device_build_cold_s"] = round(time.time() - t0, 1)
    print(f"device build cold (incl compile, nnz-only fetch): "
          f"{res['device_build_cold_s']}s nnz={n_dev}", flush=True)

    # warm, nnz-only fetch: pure device compute + dispatch (the row
    # fetch at this interval count is gigabytes over the ~35 MB/s
    # tunnel and is timed separately below)
    t0 = time.time()
    n_dev2 = dindex_build.build_super_device_per_component(
        sup_len, s_indptr, s_indices, dmax, e_hint=e_hint,
        stats_only=True,
    )
    res["device_compute_s"] = round(time.time() - t0, 1)
    res["nnz_device"] = int(n_dev2)
    print(f"device build warm (nnz-only): {res['device_compute_s']}s",
          flush=True)

    t0 = time.time()
    dev2 = dindex_build.build_super_device_per_component(
        sup_len, s_indptr, s_indices, dmax, e_hint=e_hint,
    )
    res["device_build_full_s"] = round(time.time() - t0, 1)
    res["parity"] = bool(dev2 is not None and all(
        np.array_equal(a, b) for a, b in zip(nat, dev2)
    ))
    nb = sum(a.nbytes for a in dev2) if dev2 is not None else 0
    res["fetch_bytes"] = int(nb)
    print(f"device build warm + full row fetch: "
          f"{res['device_build_full_s']}s "
          f"(fetch {nb/1e6:.0f} MB int64 host-side) "
          f"parity={res['parity']}", flush=True)

    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
