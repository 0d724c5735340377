"""GFA 1 / GFA 2 graph loader.

Supports the subsets used by vg-exported pan-genome graphs (the formats of
the reference's bundled test data, e.g. test/data/tiny/tiny.gfa):

GFA 1:  ``S <id> <seq>``, ``L <from> <fo> <to> <to_o> <overlap>``,
        ``P <name> <seg list> <overlaps>``
GFA 2:  ``S <id> <len> <seq>``, ``E <eid> <from±> <to±> ...``,
        ``O <name> <ref list>``

Only forward orientations are supported (psikt requires topologically
sorted forward graphs; ref: src/psikt.cpp:252-255).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from psi_tpu.graph import Graph


def _parse_oriented(ref: str) -> Tuple[int, str]:
    orient = ref[-1]
    if orient in "+-":
        return int(ref[:-1]), orient
    return int(ref), "+"


def load_gfa(path: str) -> Graph:
    nodes: Dict[int, str] = {}
    edges: List[Tuple[int, int]] = []
    paths: List[Tuple[str, List[int]]] = []

    with open(path, "r") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            fields = line.split("\t")
            tag = fields[0]
            if tag == "S":
                # GFA2: S id len seq ; GFA1: S id seq [tags]
                if len(fields) >= 4 and fields[2].isdigit() and not set(
                    fields[2]
                ) <= set("ACGTNacgtn"):
                    nodes[int(fields[1])] = fields[3]
                else:
                    nodes[int(fields[1])] = fields[2]
            elif tag == "L":
                f, fo = _parse_oriented(fields[1] + fields[2])
                t, to = _parse_oriented(fields[3] + fields[4])
                if fo != "+" or to != "+":
                    raise ValueError("only forward-orientation edges supported")
                edges.append((f, t))
            elif tag == "E":
                f, fo = _parse_oriented(fields[2])
                t, to = _parse_oriented(fields[3])
                if fo != "+" or to != "+":
                    raise ValueError("only forward-orientation edges supported")
                edges.append((f, t))
            elif tag == "P":
                segs = [_parse_oriented(s)[0] for s in fields[2].split(",")]
                paths.append((fields[1], segs))
            elif tag == "O":
                segs = [_parse_oriented(s)[0] for s in fields[2].split(" ")]
                paths.append((fields[1], segs))

    return Graph.from_parts(nodes, edges, paths)
