"""Checkpoint / resume with config fingerprinting.

The reference pickles per-layer param values with a config-string
fingerprint, prints a unified diff on mismatch and recovers by shape
matching (reference src/net/netbase.py:405-477).  Here a checkpoint is a
single msgpack file (flax.serialization) holding the pytree + a JSON config
fingerprint, with the same diff-on-mismatch and shape-recovery semantics.
Trainer snapshot cadence and best-weights restore live in trainer.py
(reference nettrainer.py:816-820, 884-902).
"""

from __future__ import annotations

import difflib
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

MAGIC = b"DPTPU1\x00"


def _fingerprint(config: Any) -> str:
    """Stable JSON description of a config object."""

    def default(o):
        if hasattr(o, "_asdict"):
            return o._asdict()
        if isinstance(o, (np.ndarray, jax.Array)):
            return {"__array__": list(o.shape), "dtype": str(o.dtype)}
        if isinstance(o, type):
            return o.__name__
        return str(o)

    return json.dumps(config, default=default, sort_keys=True, indent=1)


def save_checkpoint(path: str, tree: Any, config: Any = None) -> None:
    """Write pytree + config fingerprint. Atomic (write temp then rename)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    blob = serialization.to_bytes(jax.device_get(tree))
    fp = _fingerprint(config).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(len(fp).to_bytes(8, "little"))
        f.write(fp)
        f.write(blob)
    os.replace(tmp, path)


def checkpoint_keys(path: str) -> set:
    """Top-level key names of a stored checkpoint tree.

    Cheap structure probe so loaders can build a matching restore target
    for optional subtrees (e.g. the trainer's persisted best-weights
    tracker) without tripping the shape-recovery fallback on checkpoints
    written before the subtree existed."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not a deepprior_tpu checkpoint")
        n = int.from_bytes(f.read(8), "little")
        f.read(n)
        blob = f.read()
    raw = serialization.msgpack_restore(blob)
    return set(raw.keys()) if isinstance(raw, dict) else set()


def load_checkpoint(
    path: str, target: Any, config: Any = None, strict: bool = False
) -> Tuple[Any, bool]:
    """Restore a pytree into `target`'s structure.

    Config mismatch prints a unified diff (netbase.py:440-450 semantics);
    if the stored tree does not match the target structure, falls back to
    matching leaves by path suffix + shape (the reference's shape-based
    recovery, netbase.py:451-476).  Returns (tree, exact_match).
    """
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not a deepprior_tpu checkpoint")
        n = int.from_bytes(f.read(8), "little")
        stored_fp = f.read(n).decode()
        blob = f.read()

    exact = True
    if config is not None:
        now_fp = _fingerprint(config)
        if now_fp != stored_fp:
            exact = False
            diff = "\n".join(
                difflib.unified_diff(
                    stored_fp.splitlines(), now_fp.splitlines(),
                    "checkpoint", "current", lineterm="",
                )
            )
            msg = f"checkpoint config mismatch for {path}:\n{diff}"
            if strict:
                raise ValueError(msg)
            print(f"WARNING: {msg}")

    try:
        return serialization.from_bytes(target, blob), exact
    except Exception:
        if strict:
            raise
        # shape-based recovery: restore into a raw state dict, then graft
        # leaves whose path-suffix + shape match the target
        raw = serialization.msgpack_restore(blob)
        flat_raw = _flatten(raw)
        tgt_state = serialization.to_state_dict(target)
        flat_tgt = _flatten(tgt_state)
        used = set()
        restored = dict(flat_tgt)
        for tkey, tval in flat_tgt.items():
            tshape = getattr(tval, "shape", None)
            best = None
            for rkey, rval in flat_raw.items():
                if rkey in used or getattr(rval, "shape", None) != tshape:
                    continue
                # prefer matching trailing path components
                score = _suffix_score(tkey, rkey)
                if best is None or score > best[0]:
                    best = (score, rkey, rval)
            if best is not None and best[0] > 0:
                used.add(best[1])
                restored[tkey] = best[2]
        rebuilt = _unflatten(restored)
        print(
            f"WARNING: structural mismatch for {path}; recovered "
            f"{len(used)}/{len(flat_tgt)} leaves by name/shape match"
        )
        return serialization.from_state_dict(target, rebuilt), False


def _flatten(d, prefix=()):
    out = {}
    if isinstance(d, dict):
        for k, v in d.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = d
    return out


def _unflatten(flat):
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        cur = out
        for p in path[:-1]:
            cur = cur.setdefault(p, {})
        cur[path[-1]] = v
    return out


def _suffix_score(a: Tuple[str, ...], b: Tuple[str, ...]) -> int:
    s = 0
    for x, y in zip(reversed(a), reversed(b)):
        if x != y:
            break
        s += 1
    return s
