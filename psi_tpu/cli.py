"""psikt — the seed-finding CLI (flag + output parity with ref: src/psikt.cpp).

Output format: raw binary stream of (node_id, node_offset, read_id,
read_offset) per hit, 8-byte little-endian each (ref: psikt.cpp:172-181
writes the four size_t fields of each Seed).

Bidirected inputs (reverse-complement node doubling at ingest,
io/bidir.py) emit strand-aware: a hit on a reverse twin carries the
NEGATED original node id (vg is_reverse = True; ref: vg/vg.proto:29-34),
and its node_offset counts from the forward node's end — exactly vg's
reverse-orientation offset convention. Forward-only graphs
(graph.rc_base == 0) are byte-identical to the reference stream.
"""

from __future__ import annotations

import argparse
import logging
import os

import sys
import time
from typing import Optional

import numpy as np

log = logging.getLogger("psikt")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="psikt",
        description="Pan-genome seed finder (TPU-native PSI).",
    )
    p.add_argument("graph", metavar="GRAPH_FILE", help="graph file (vg or gfa)")
    p.add_argument("-f", "--fastq", required=True, help="reads in FASTQ format")
    p.add_argument("-o", "--output", default="out.gam", help="output file")
    p.add_argument("-I", "--path-index", default="", help="path index prefix")
    p.add_argument("-l", "--seed-length", type=int, required=True)
    p.add_argument(
        "-c", "--chunk-size", type=int, default=0,
        help="reads chunk size (0 = all reads as one chunk)",
    )
    p.add_argument(
        "-e", "--step-size", type=int, default=1,
        help="min approximate distance between consecutive starting loci",
    )
    p.add_argument(
        "-d", "--distance", type=int, default=0,
        help="distance between seeds (default: seed length)",
    )
    p.add_argument(
        "-n", "--path-num", type=int, default=0,
        help="number of paths included in the path index",
    )
    p.add_argument(
        "-P", "--no-patched", action="store_true",
        help="use full genome-wide paths",
    )
    p.add_argument("-t", "--context", type=int, default=0, help="patching context")
    p.add_argument(
        "-r", "--gocc-threshold", type=int, default=0,
        help="seed genome occurrence count threshold",
    )
    p.add_argument(
        "-E", "--max-mem", type=int, default=0,
        help="maximum number of MEMs on paths",
    )
    p.add_argument("-m", "--min-insert-size", type=int, default=0)
    p.add_argument("-M", "--max-insert-size", type=int, default=0)
    p.add_argument(
        "--dindex-mode", choices=["per-component", "whole"],
        default="per-component",
    )
    p.add_argument(
        "-i", "--index", default="WOTD",
        choices=["SA", "ESA", "WOTD", "DFI", "QGRAM", "FM"],
        help="reads-side index type (accepted for compatibility; the "
        "engine always uses the sorted packed k-mer index)",
    )
    p.add_argument("-x", "--index-only", action="store_true")
    p.add_argument("-L", "--log-file", default="psi.log")
    p.add_argument("-Q", "--no-log-file", action="store_true")
    p.add_argument("-q", "--quiet", action="store_true")
    p.add_argument("-C", "--no-color", action="store_true")
    p.add_argument("-D", "--disable-log", action="store_true")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument(
        "--mismatches", type=int, default=0,
        help="allowed mismatches per seed (extension: the reference "
        "declares but never implements approximate matching)",
    )
    p.add_argument(
        "--device", choices=["auto", "tpu", "cpu"], default="auto",
        help="compute platform for the batched engines",
    )
    p.add_argument(
        "--devices", default=None, metavar="N|auto",
        help="device-mesh width for the sharded query pipeline: a "
        "count, or 'auto' for all local devices (default: all devices "
        "on accelerator backends, 1 on CPU; also via PSI_DEVICES)",
    )
    p.add_argument(
        "--resume", action="store_true",
        help="resume an interrupted run from <output>.ckpt (skips already "
        "processed read chunks; requires identical arguments)",
    )
    p.add_argument(
        "--report", default="",
        help="write an end-of-run JSON metrics report (the reference's "
        "parse2csv benchmark schema)",
    )
    return p


def setup_logging(args):
    handlers = []
    if not args.quiet:
        handlers.append(logging.StreamHandler(sys.stderr))
    if not args.no_log_file and not args.disable_log:
        handlers.append(logging.FileHandler(args.log_file))
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="[%(asctime)s] [%(name)s] [%(levelname)s] %(message)s",
        handlers=handlers if not args.disable_log else [logging.NullHandler()],
    )


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    setup_logging(args)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from psi_tpu.io import load_graph
    from psi_tpu.io.fastq import FastxStream
    from psi_tpu.records import Records
    from psi_tpu.seed_finder import SeedFinder
    from psi_tpu.stats import SeedFinderStats, Timer

    stats = SeedFinderStats()
    SeedFinderStats.track(stats)
    SeedFinderStats.install_signal_handler()

    t0 = time.monotonic()
    log.info("Loading input graph from '%s'...", args.graph)
    graph = load_graph(args.graph)
    log.info(
        "Loaded the graph in %.3fs (%d nodes, %d edges, %d paths).",
        time.monotonic() - t0, graph.node_count, graph.edge_count,
        graph.get_path_count(),
    )

    finder = SeedFinder(
        graph,
        args.seed_length,
        gocc_threshold=args.gocc_threshold,
        max_mem=args.max_mem,
        seed_mismatches=args.mismatches,
        stats=stats,
        devices=args.devices,
    )
    mesh = finder._get_mesh()
    if mesh is not None:
        log.info(
            "Sharded query pipeline over a %d-device mesh.",
            mesh.shape["data"],
        )

    loaded = False
    if args.path_index:
        log.info("Opening path index '%s'...", args.path_index)
        loaded = finder.load_path_index(
            args.path_index, args.context, args.step_size,
            args.min_insert_size, args.max_insert_size,
        )
        if loaded:
            log.info("Path index loaded.")
        else:
            log.info("No valid path index found; creating...")
    if not loaded:
        finder.create_path_index(
            args.path_num,
            not args.no_patched,
            args.context,
            args.step_size,
            args.min_insert_size,
            args.max_insert_size,
            per_component=(args.dindex_mode == "per-component"),
        )
        log.info("Picked paths in %.3fs.", Timer.get_duration_ts("pick-paths"))
        if args.path_index:
            log.info("Saving path index...")
            if not finder.serialize_path_index(args.path_index, args.step_size):
                log.warning("Specified path index file is not writable. Skipping...")

    log.info(
        "Number of starting loci (in %d nodes of total %d): %d",
        finder.get_nof_uniq_nodes(), graph.node_count,
        len(finder.get_starting_loci()),
    )

    if args.index_only:
        log.info("Skipping seed finding as requested...")
        return 0

    found = 0
    covered_reads = set()
    n_chunks = 0

    # checkpoint/resume: deterministic restart from serialized indexes +
    # read offset (the failure-recovery semantics SURVEY §5 calls for)
    import json as _json

    ckpt_path = args.output + ".ckpt"
    resume_reads = 0
    resume_bytes = 0
    if args.resume and os.path.exists(ckpt_path):
        with open(ckpt_path) as fh:
            ck = _json.load(fh)
        resume_reads = ck.get("reads_consumed", 0)
        resume_bytes = ck.get("bytes_written", 0)
        found = ck.get("found", 0)
        log.info(
            "Resuming after %d reads (%d bytes of hits).",
            resume_reads, resume_bytes,
        )
    if resume_bytes and os.path.exists(args.output):
        out = open(args.output, "r+b")
        out.truncate(resume_bytes)
        out.seek(resume_bytes)
    else:
        resume_reads = 0
        resume_bytes = 0
        out = open(args.output, "wb")

    log.info("Finding seeds...")
    stream = FastxStream(args.fastq)
    while stream.counts() < resume_reads:
        skip = min(
            resume_reads - stream.counts(),
            args.chunk_size or resume_reads,
        )
        if not stream.read_chunk(skip)[0]:
            break
    t_find = time.monotonic()

    # host pipeline: a producer thread parses the next chunk and builds
    # its k-mer index while the device queries the current one (the
    # third parallel axis — host I/O <-> device compute overlap)
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    work_q: "queue.Queue" = queue.Queue(maxsize=2)
    prep_pool = ThreadPoolExecutor(max_workers=1)

    def producer():
        while True:
            offset = stream.counts()
            names, packed = stream.read_chunk_packed(args.chunk_size)
            if not names:
                work_q.put(None)
                return
            chunk = Records(names, rec_offset=offset, packed=packed)
            seeds = finder.get_seeds(chunk, args.distance)
            index = finder.index_reads(seeds)
            # trie schedule + device transfer off the critical path,
            # and PIPELINED: the prepare pool builds chunk n's plan
            # while this thread parses/seeds chunk n+1 (the consumer
            # waits on the future before querying)
            fut = prep_pool.submit(finder.prepare_onpath, index)
            work_q.put((chunk, seeds, index, fut))
            if args.chunk_size == 0:
                work_q.put(None)
                return

    threading.Thread(target=producer, daemon=True).start()

    while True:
        item = work_q.get()
        if item is None:
            break
        chunk, seeds, index, prep_fut = item
        log.info(
            "Fetched %d reads with total length of %dbp (%d seeds).",
            len(chunk), chunk.length_sum(), len(seeds),
        )
        prep_fut.result()  # on-path plan ready (built off-thread)
        hits = finder.seeds_all_arrays(seeds, index)
        found += len(hits)
        n_chunks += 1
        covered_reads.update(np.unique(hits["read_id"]).tolist())
        # bulk binary write of (node_id, node_offset, read_id, read_offset);
        # on node-doubled bidirected inputs (graph.rc_base > 0) hits on
        # reverse twins are emitted STRAND-AWARE: node_id = NEGATED
        # original node id (vg is_reverse = True), node_offset already
        # counts from the forward node's end (the vg reverse-offset
        # convention; see Graph.forward_strand)
        cols = np.empty((len(hits), 4), dtype="<i8")
        if graph.rc_base:
            fwd, rev = graph.forward_strand(hits["node_id"])
            cols[:, 0] = np.where(rev, -fwd, fwd)
        else:
            cols[:, 0] = hits["node_id"]
        cols[:, 1] = hits["node_offset"]
        cols[:, 2] = hits["read_id"]
        cols[:, 3] = hits["read_offset"]
        cols.tofile(out)
        out.flush()
        with open(ckpt_path, "w") as fh:
            _json.dump(
                {
                    # producer may be ahead; checkpoint what WE consumed
                    "reads_consumed": chunk.rec_offset + len(chunk),
                    "bytes_written": out.tell(),
                    "found": found,
                },
                fh,
            )
    out.close()
    if os.path.exists(ckpt_path):
        os.remove(ckpt_path)  # clean finish

    log.info("Found seeds in %.3fs.", time.monotonic() - t_find)
    log.info("Total number of seeds found: %d", found)
    log.info("Number of reads covered by seeds: %d", len(covered_reads))
    for name, timer in sorted(Timer.get_timers().items()):
        log.info("%s time: %.3fs", name, timer.lap())

    if args.report:
        _write_report(args, finder, graph, found, covered_reads, n_chunks)
    return 0


def _write_report(args, finder, graph, found, covered_reads, n_chunks):
    """End-of-run metrics in the reference's benchmark schema
    (field list per script/parse2csv_psikt_config.yaml)."""
    import json as _json

    from psi_tpu.stats import Timer

    def t(name):
        total = 0.0
        for tname, timer in Timer.get_timers().items():
            if tname.startswith(name):
                total += timer.lap()
        return round(total, 4)

    report = {
        "dataset": args.graph,
        "seedlen": args.seed_length,
        "distance": args.distance or args.seed_length,
        "pathno": args.path_num,
        "patched": not args.no_patched,
        "context": finder.pindex.get_context(),
        "readsindex": "sorted-kmer",
        "chunksize": args.chunk_size,
        "stepsize": args.step_size,
        "pathpicktime": t("pick-paths"),
        "pathindextime": t("index-paths"),
        "pathsavetime": t("save-pindex"),
        "pindexsize": int(finder.pindex.fm.size) if finder.pindex.fm else 0,
        "locino": len(finder.get_starting_loci()),
        "uniqnodes": finder.get_nof_uniq_nodes(),
        "totalnodes": graph.node_count,
        "pathquerytimeperchunk": round(
            t("seeds-on-paths") / max(1, n_chunks), 4
        ),
        "traversetimeperchunk": round(
            t("seeds-off-path") / max(1, n_chunks), 4
        ),
        "seedhits": found,
        "coveredreads": len(covered_reads),
        # traversal counters (ref: TraverserStats fed end-of-run report,
        # psikt.cpp:59-80)
        "godowns": finder.stats.get_this_thread_stats().godowns,
        "traversedpaths": finder.stats.get_this_thread_stats().paths_traversed,
        "avgpathlen": round(
            finder.stats.get_this_thread_stats().avg_pathlen(), 2
        ),
    }
    with open(args.report, "w") as fh:
        _json.dump(report, fh, indent=2)


if __name__ == "__main__":
    sys.exit(main())
