"""Host-keyed persistent XLA compile cache.

The persistent compilation cache saves the 1-10 minute remote-relay
compiles between runs, but XLA CPU executables embed the build host's
CPU feature set: loading an entry compiled on a different machine can
SIGILL (observed as a loader warning in the round-4 bench tail when the
round moved VMs). Keying the cache directory by a fingerprint of the
host CPU makes a foreign entry unreachable instead of loadable.

All entry points (bench.py, scripts/, the tunnel watcher, the TPU smoke
test) route through `compile_cache_dir()`; the legacy flat directory
`~/.cache/psi_tpu_xla` is left alone (its entries are untrusted — no
fingerprint recorded what host wrote them).
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Short stable hash of what determines CPU-executable
    compatibility: machine arch + the CPU flag set + model name."""
    import platform

    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "model name")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def compile_cache_dir(create: bool = True) -> str:
    """Per-host cache directory (PSI_COMPILE_CACHE overrides; an
    override is trusted as-is — the caller asked for that exact dir)."""
    override = os.environ.get("PSI_COMPILE_CACHE")
    if override:
        if create:
            os.makedirs(override, exist_ok=True)
        return override
    base = os.path.expanduser("~/.cache/psi_tpu_xla")
    d = os.path.join(base, f"h-{host_fingerprint()}")
    if create:
        os.makedirs(d, exist_ok=True)
    return d


def enable_compile_cache(jax_module=None) -> str:
    """Point jax at the host-keyed persistent cache; returns the dir."""
    if jax_module is None:
        import jax as jax_module
    d = compile_cache_dir()
    jax_module.config.update("jax_compilation_cache_dir", d)
    jax_module.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1.0
    )
    return d
