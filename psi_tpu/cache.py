"""Host-keyed persistent XLA compile cache.

The persistent compilation cache saves the 1-10 minute remote-relay
compiles between runs, but XLA **CPU** executables embed the build
host's CPU feature set: loading an entry compiled on a different
machine can SIGILL (observed as a loader warning in the round-4 bench
tail after the round moved VMs). TPU executables are compiled for the
chip, not the host, and are safe to share across VMs.

So the dir is picked by the active backend:
  * TPU/axon  -> the legacy flat dir (``~/.cache/psi_tpu_xla``) —
    reusing the expensive relay-compiled entries across VMs is exactly
    what we want, and a TPU-backend process never loads a CPU entry
    (the cache key includes the platform);
  * CPU       -> a per-host fingerprinted subdir, so a foreign CPU
    executable is unreachable instead of loadable.

All entry points (bench.py, scripts/, the tunnel watcher, the TPU smoke
test) route through ``compile_cache_dir()`` / ``enable_compile_cache()``.
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


def compile_cache_dir(backend: str | None = None, create: bool = True) -> str:
    """Cache directory for the active backend (PSI_COMPILE_CACHE
    overrides; an override is trusted as-is — the caller asked for that
    exact dir). `backend` defaults to the JAX_PLATFORMS env."""
    override = os.environ.get("PSI_COMPILE_CACHE")
    if override:
        if create:
            os.makedirs(override, exist_ok=True)
        return override
    if backend is None:
        backend = os.environ.get("JAX_PLATFORMS", "") or "cpu"
    backend = backend.split(",")[0].lower()
    base = os.path.expanduser("~/.cache/psi_tpu_xla")
    if backend in ("cpu",):
        d = os.path.join(base, f"h-{host_fingerprint()}")
    else:
        # device backends (axon/tpu): chip executables, host-portable
        d = base
    if create:
        os.makedirs(d, exist_ok=True)
    return d


def enable_compile_cache(jax_module=None, backend: str | None = None) -> str:
    """Point jax at the persistent cache for the active backend;
    returns the dir."""
    if jax_module is None:
        import jax as jax_module
    d = compile_cache_dir(backend)
    jax_module.config.update("jax_compilation_cache_dir", d)
    jax_module.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1.0
    )
    return d
