"""Persistent AOT (jax.export) cache for the train step: skip Python
trace+lower, not just the XLA compile.

Why this exists: with the persistent XLA compile cache (compile_cache.py,
r4g) a warm process still pays ~50-100 s of Python TRACE+LOWER for the
flagship-class step graph (the blocked-factor unroll, tri-update
recursion and cond ladder branches emit a very large jaxpr —
docs/BENCHMARKS.md r4g), re-paid per process. jax.export serializes the
LOWERED StableHLO module to disk; a warm process deserializes it
(flatbuffer read, ~ms) and runs it directly — the Python trace+lower
never happens again on this machine.

Key discipline: the cache key covers everything that changes the traced
program — jax version, backend platform, the rpagp package SOURCE HASH
(any code edit invalidates every entry), the caller-supplied semantic
key (model spec repr, n, solver mode, train config), the RPAGP_* env
switches read at trace time, and the avals (shape/dtype) of every
argument leaf. Keys are sha256; entries are written atomically.

Failure discipline: every cache operation degrades to the plain jitted
step on any exception — AOT is an optimization, never a correctness
dependency. RPAGP_AOT_CACHE=off disables; RPAGP_AOT_CACHE=<dir>
relocates (default ~/.cache/rpagp_aot).

Reference analog: none — GPyTorch executes eagerly and pays zero
compile; this is the TPU-native framework closing the end-to-end gap
its compilation model opened (VERDICT r4 weak #1).
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile

_SOURCE_HASH: str | None = None
_REGISTERED = False
# in-process memo: key -> wrapped callable (k splits share one wrapper)
_WRAPPED: dict = {}


def _cache_dir() -> str | None:
    path = os.environ.get("RPAGP_AOT_CACHE",
                          os.path.expanduser("~/.cache/rpagp_aot"))
    if path.lower() in ("0", "off", "none", ""):
        return None
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    return path


def _source_hash() -> str:
    """Hash of every .py source in the rpagp package (+ jax/optax
    versions): any code edit must invalidate every AOT entry, because
    the serialized module bakes in the traced program."""
    global _SOURCE_HASH
    if _SOURCE_HASH is not None:
        return _SOURCE_HASH
    import jax
    import optax

    import rpagp

    h = hashlib.sha256()
    h.update(f"jax={jax.__version__};optax={optax.__version__}".encode())
    pkg = os.path.dirname(os.path.abspath(rpagp.__file__))
    for root, _dirs, files in sorted(os.walk(pkg)):
        for fname in sorted(files):
            if fname.endswith((".py", ".cpp", ".so")):
                p = os.path.join(root, fname)
                h.update(fname.encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    _SOURCE_HASH = h.hexdigest()
    return _SOURCE_HASH


def _register_serializations() -> None:
    """Register the optax state namedtuples that appear in opt_state
    pytrees (jax.export refuses unregistered custom pytree nodes)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jexport
    from optax._src import base as _ob
    from optax._src import transform as _ot

    for cls in (_ot.ScaleByAdamState, _ob.EmptyState):
        try:
            jexport.register_namedtuple_serialization(
                cls, serialized_name=f"optax.{cls.__name__}")
        except ValueError:
            pass  # already registered
    # schedule states exist only on some optax versions/paths
    for name in ("ScaleByScheduleState",):
        cls = getattr(_ot, name, None)
        if cls is not None:
            try:
                jexport.register_namedtuple_serialization(
                    cls, serialized_name=f"optax.{name}")
            except ValueError:
                pass
    # rpagp's own buffer/cache pytrees (SKI geometry rides in the
    # buffers arg; the preconditioner in the BBMM path's loss_args)
    from ..ops.love import LoveCache
    from ..ops.precond import Preconditioner
    from ..ops.ski import SKIState

    for cls in (SKIState, Preconditioner, LoveCache):
        try:
            jexport.register_namedtuple_serialization(
                cls, serialized_name=f"rpagp.{cls.__name__}")
        except ValueError:
            pass
    _REGISTERED = True


def _platform(example_args) -> str:
    """Platform the step will actually run on: the committed device of
    the first jax-array argument leaf. jax.default_backend() is wrong
    here — the axon TPU plugin keeps backend priority even when
    jax_default_device pins cpu:0 (CLAUDE.md env rules), and export
    refuses to run a 'tpu' module on cpu."""
    import jax

    for leaf in jax.tree.leaves(example_args):
        dev = getattr(leaf, "device", None)
        platform = getattr(dev, "platform", None)
        if platform:
            return platform
    return jax.default_backend()


def _entry_key(key_parts, example_args, platform: str) -> str:
    import jax

    from ..train import resolve_env_switches

    avals = tuple(
        (tuple(x.shape), str(x.dtype)) if hasattr(x, "shape") else repr(x)
        for x in jax.tree.leaves(example_args)
    )
    blob = repr((
        _source_hash(),
        platform,
        resolve_env_switches(),
        key_parts,
        avals,
    ))
    return hashlib.sha256(blob.encode()).hexdigest()


def aot_step(step_fn, example_args, key_parts):
    """Return a callable equivalent to the jitted `step_fn`, served from
    the persistent AOT cache when possible.

    - warm entry: deserialize the StableHLO module (no trace+lower) and
      run it under one thin jit (the XLA compile of the deserialized
      module hits the persistent compile cache).
    - cold entry: trace+lower ONCE via jax.export, persist atomically,
      and execute through the same exported module so warm and cold
      processes run the identical program.
    - any failure: return step_fn unchanged.

    key_parts must determine the traced program together with the arg
    avals (the runner passes (spec, n, mode, train-config) — all frozen
    dataclasses with deterministic reprs).
    """
    cdir = _cache_dir()
    if cdir is None:
        return step_fn
    try:
        import jax
        from jax import export as jexport

        _register_serializations()
        platform = _platform(example_args)
        key = _entry_key(key_parts, example_args, platform)
        if key in _WRAPPED:
            return _WRAPPED[key]
        path = os.path.join(cdir, key + ".jaxexp")
        exported = None
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exported = jexport.deserialize(bytearray(f.read()))
            except Exception as e:  # corrupt/stale entry: rebuild
                print(f"[aot] discarding unreadable cache entry: {e}",
                      file=sys.stderr)
                exported = None
        if exported is None:
            # pallas/mosaic lowerings are backend custom calls that
            # export's stability allowlist rejects; we only ever reload
            # on the same machine + jax version + source hash, so the
            # stability guarantee is not needed
            disabled = [jexport.DisabledSafetyCheck.custom_call(t)
                        for t in ("tpu_custom_call", "CustomCall",
                                  "__gpu$xla.gpu.triton")]
            exported = jexport.export(
                jax.jit(step_fn),
                platforms=[platform],
                disabled_checks=disabled,
            )(*example_args)
            blob = exported.serialize()
            fd, tmp = tempfile.mkstemp(dir=cdir, suffix=".tmp")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)  # atomic: concurrent writers safe
            except OSError:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
        call = jax.jit(exported.call)
        if len(_WRAPPED) > 32:
            _WRAPPED.pop(next(iter(_WRAPPED)))
        _WRAPPED[key] = call
        return call
    except Exception as e:
        print(f"[aot] falling back to plain jit ({type(e).__name__}: {e})",
              file=sys.stderr)
        return step_fn
