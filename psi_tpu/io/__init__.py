"""Host-side I/O frontends: graph loaders (GFA, vg protobuf) and FASTQ."""

from psi_tpu.io.gfa import load_gfa  # noqa: F401
from psi_tpu.io.vgio import load_vg  # noqa: F401
from psi_tpu.io.fastq import read_fastq  # noqa: F401


def load_graph(path: str):
    """Load a sequence graph from a .gfa or .vg file by extension."""
    if path.endswith(".gfa"):
        return load_gfa(path)
    if path.endswith(".vg") or path.endswith(".pb"):
        return load_vg(path)
    raise ValueError(f"unsupported graph format: {path}")
