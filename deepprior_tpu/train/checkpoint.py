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
    if os.path.isdir(path):
        # a prior --sharded-snapshots run left a checkpoint DIRECTORY at
        # the rolling path; the snapshot-cadence contract is overwrite,
        # so a format switch must not crash the os.replace below.  Only
        # our own debris is removed: an arbitrary directory (e.g. an
        # outdir passed where a file path belongs) must stay a loud
        # error, not a recursive delete.
        entries = set(os.listdir(path))
        sharded_markers = {
            "fingerprint.json", "fingerprint.json.new",
            "fingerprint.json.new.tmp", "tree", "tree.new",
        }
        if entries and not all(
            e in sharded_markers or ".orbax-checkpoint-tmp-" in e
            for e in entries
        ):
            # ALL entries must be our own sharded-checkpoint debris: a
            # directory holding even one unrelated user file stays a loud
            # error rather than a recursive delete.  An EMPTY directory is
            # removable debris too — checkpoint_sharded's save runs
            # makedirs before its first marker write, so a crash in that
            # window legitimately leaves one.
            raise IsADirectoryError(
                f"refusing to overwrite non-checkpoint directory {path}"
            )
        # multihost: one process removes, everyone waits (concurrent
        # rmtrees race mid-walk on a shared filesystem) — the same
        # process-0 + barrier pattern as checkpoint_sharded._promote
        import shutil

        if jax.process_index() == 0:
            shutil.rmtree(path)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("deepprior_ckpt_fmt_switch")
            # node-local checkpoint paths: process 0's rmtree only reached
            # its own filesystem; any copy still visible here belongs to
            # this host's processes (ignore_errors absorbs same-host
            # sibling races — the os.replace below still fails loudly if
            # the directory truly cannot be cleared)
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
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
    written before the subtree existed.

    Genuinely cheap: reads only the top-level msgpack map header and its
    key strings, seeking PAST every value (the parameter blobs) — a full
    msgpack_restore here would deserialize the entire checkpoint a second
    time on every resume, doubling resume I/O and peak host memory.  Any
    parse surprise falls back to the full decode."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not a deepprior_tpu checkpoint")
        n = int.from_bytes(f.read(8), "little")
        f.seek(n, os.SEEK_CUR)
        try:
            return _msgpack_top_level_keys(f)
        except Exception:
            f.seek(len(MAGIC) + 8 + n)
            raw = serialization.msgpack_restore(f.read())
            return set(raw.keys()) if isinstance(raw, dict) else set()


def _msgpack_read(f, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise ValueError("truncated msgpack stream")
    return b


def _msgpack_skip(f) -> None:
    """Advance `f` past one msgpack value without materializing it
    (container headers recurse; byte payloads are seeked over)."""
    t = _msgpack_read(f, 1)[0]
    if t <= 0x7F or 0xE0 <= t <= 0xFF or t in (0xC0, 0xC2, 0xC3):
        return  # fixint / nil / bool
    if 0x80 <= t <= 0x8F:  # fixmap
        for _ in range(2 * (t & 0x0F)):
            _msgpack_skip(f)
        return
    if 0x90 <= t <= 0x9F:  # fixarray
        for _ in range(t & 0x0F):
            _msgpack_skip(f)
        return
    if 0xA0 <= t <= 0xBF:  # fixstr
        f.seek(t & 0x1F, os.SEEK_CUR)
        return
    if t in (0xC4, 0xC5, 0xC6):  # bin8/16/32
        ln = int.from_bytes(_msgpack_read(f, 1 << (t - 0xC4)), "big")
        f.seek(ln, os.SEEK_CUR)
        return
    if t in (0xC7, 0xC8, 0xC9):  # ext8/16/32 (+1 type byte)
        ln = int.from_bytes(_msgpack_read(f, 1 << (t - 0xC7)), "big")
        f.seek(ln + 1, os.SEEK_CUR)
        return
    if t in (0xCA, 0xCB):  # float32/64
        f.seek(4 if t == 0xCA else 8, os.SEEK_CUR)
        return
    if 0xCC <= t <= 0xD3:  # uint8-64 / int8-64
        f.seek(1 << ((t - 0xCC) & 0x03), os.SEEK_CUR)
        return
    if 0xD4 <= t <= 0xD8:  # fixext1/2/4/8/16 (+1 type byte)
        f.seek((1 << (t - 0xD4)) + 1, os.SEEK_CUR)
        return
    if t in (0xD9, 0xDA, 0xDB):  # str8/16/32
        ln = int.from_bytes(_msgpack_read(f, 1 << (t - 0xD9)), "big")
        f.seek(ln, os.SEEK_CUR)
        return
    if t in (0xDC, 0xDD):  # array16/32
        cnt = int.from_bytes(_msgpack_read(f, 2 if t == 0xDC else 4), "big")
        for _ in range(cnt):
            _msgpack_skip(f)
        return
    if t in (0xDE, 0xDF):  # map16/32
        cnt = int.from_bytes(_msgpack_read(f, 2 if t == 0xDE else 4), "big")
        for _ in range(2 * cnt):
            _msgpack_skip(f)
        return
    raise ValueError(f"unknown msgpack type byte 0x{t:02x}")


def _msgpack_top_level_keys(f) -> set:
    """Key strings of the msgpack map starting at f's position; values
    are skipped, not decoded."""
    t = _msgpack_read(f, 1)[0]
    if 0x80 <= t <= 0x8F:
        cnt = t & 0x0F
    elif t == 0xDE:
        cnt = int.from_bytes(_msgpack_read(f, 2), "big")
    elif t == 0xDF:
        cnt = int.from_bytes(_msgpack_read(f, 4), "big")
    else:
        return set()  # not a map at the top level
    keys = set()
    for _ in range(cnt):
        kt = _msgpack_read(f, 1)[0]
        if 0xA0 <= kt <= 0xBF:
            ln = kt & 0x1F
        elif kt in (0xD9, 0xDA, 0xDB):
            ln = int.from_bytes(_msgpack_read(f, 1 << (kt - 0xD9)), "big")
        else:
            raise ValueError(f"non-string checkpoint key type 0x{kt:02x}")
        keys.add(_msgpack_read(f, ln).decode("utf-8"))
        _msgpack_skip(f)
    return keys


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
                # prefer matching trailing path components; break ties by
                # leading components — ('params', ..., 'kernel') must pick
                # stored 'params/...' over 'best/params/...' (the stale
                # best-tracker duplicate scores the same suffix), and vice
                # versa, independent of dict iteration order
                score = (_suffix_score(tkey, rkey), _prefix_score(tkey, rkey))
                if best is None or score > best[0]:
                    best = (score, rkey, rval)
            if best is not None and best[0][0] > 0:
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


def _prefix_score(a: Tuple[str, ...], b: Tuple[str, ...]) -> int:
    s = 0
    for x, y in zip(a, b):
        if x != y:
            break
        s += 1
    return s
