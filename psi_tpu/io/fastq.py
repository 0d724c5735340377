"""Streaming FASTQ/FASTA reader feeding fixed-shape read batches.

Replaces the reference's kseq++ streaming frontend
(ref: include/psi/sequence.hpp:1608-1624, src/psikt.cpp:257-263):
reads are consumed in chunks with a running record offset so read ids are
global across chunks.
"""

from __future__ import annotations

import gzip
from typing import Iterator, List, Optional, Tuple


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def iter_fastx(path: str) -> Iterator[Tuple[str, str]]:
    """Yield (name, sequence) records from FASTQ or FASTA."""
    with _open(path) as fh:
        first = fh.read(1)
        if not first:
            return
        if first == ">":
            header = fh.readline().strip()
            name = header.split()[0] if header else ""
            seq_parts: List[str] = []
            for line in fh:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    yield name, "".join(seq_parts)
                    name = line[1:].split()[0]
                    seq_parts = []
                else:
                    seq_parts.append(line)
            yield name, "".join(seq_parts)
        elif first == "@":
            name = fh.readline().strip().split()[0]
            while True:
                seq = fh.readline().rstrip("\n")
                plus = fh.readline()
                qual = fh.readline()
                if not qual:
                    if seq:
                        yield name, seq
                    return
                yield name, seq
                header = fh.readline()
                if not header:
                    return
                name = header.strip().lstrip("@").split()[0]
        else:
            raise ValueError(f"unrecognized sequence file format: {path}")


class FastxStream:
    """Chunked reader with a global record counter
    (counts() mirrors kseq++ SeqStreamIn usage for rec_offset)."""

    def __init__(self, path: str):
        self._iter = iter_fastx(path)
        self._count = 0

    def counts(self) -> int:
        return self._count

    def read_chunk(self, n: int = 0) -> Tuple[List[str], List[str]]:
        """Read up to n records (all if n == 0). Returns (names, seqs)."""
        names: List[str] = []
        seqs: List[str] = []
        for name, seq in self._iter:
            names.append(name)
            seqs.append(seq)
            self._count += 1
            if n and len(names) == n:
                break
        return names, seqs


def read_fastq(path: str, n: int = 0) -> Tuple[List[str], List[str]]:
    """Read up to n records from a FASTQ/FASTA file (all if n == 0)."""
    return FastxStream(path).read_chunk(n)
