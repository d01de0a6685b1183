"""Persistent XLA compilation cache for every rpagp entry point (opt-out).

Why this exists: the r4 protein end-to-end decomposition measured the
runner's user-visible cost as ~85% XLA COMPILE — the train step compiles
in ~200-300 s (load-dependent) while executing at 26 ms/step, so a
120-iteration split spends ~6 s computing and ~6 minutes compiling
(docs/BENCHMARKS.md r4g). jax ships with the persistent cache DISABLED,
so every new process pays every compile again; enabling it makes the
first-ever run per (program, platform) write MB-scale artifacts and
every later process load them in seconds — measured 31.8 s -> 2.0 s for
a p=4096 factor graph on the axon TPU backend (15x), and it works for
the CPU test suite's compiles too.

Cache-correctness notes: the key covers the optimized HLO + compile
options + platform, so env-keyed trace-time switches (RPAGP_TRI_UPDATE,
RPAGP_PALLAS_LADDER, ...) produce distinct entries, and CPU/TPU entries
never collide. Concurrent writers (the multihost tests' worker
processes) are safe: jax writes entries atomically and treats the cache
as best-effort.

Reference analog: the torch ecosystem's process-persistent compile
caches (inductor/cuDNN autotune); GPyTorch itself has no compile step,
which is why the reference never needed this.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> str | None:
    """Point jax at a persistent compilation cache directory.

    RPAGP_COMPILE_CACHE overrides the location (default
    ~/.cache/rpagp_xla); "0"/"off"/"none" disables. Returns the active
    path, or None when disabled. Safe to call more than once and before
    or after backend initialization (it only sets jax config values)."""
    path = os.environ.get("RPAGP_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/rpagp_xla"))
    if path.lower() in ("0", "off", "none", ""):
        return None
    import jax

    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        # read-only HOME / sandboxed CI: the cache is an optional
        # optimization — never let it fail an entry point at import
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    # default threshold is 1s already in recent jax, but pin it: the
    # many ~2-10 s subgraphs (prepare, posterior chunks) matter as much
    # as the one 200 s train step
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
