"""Sharded / asynchronous checkpointing (orbax-tensorstore backend).

The msgpack checkpoint (train/checkpoint.py — the reference-parity path,
netbase.py:405-477 semantics) gathers the full pytree to the host and
writes one blob.  That is right for single-host work and mirrors the
reference's pickle; at pod scale the gather is the failure mode: every
host funnels every parameter through host memory and one process
serializes alone.  This backend keeps arrays SHARDED end to end:

- save: each process writes only its addressable shards (tensorstore /
  OCDBT); no global gather, no host-0 bottleneck.  `async_save=True`
  returns while the write drains in the background (training continues;
  call `wait_until_finished` or save again — saves serialize).
- restore: shards land directly on the target mesh placement (the
  caller's shardings), never materializing an unsharded global array —
  which also removes DistTrainer's re-place dance on resume.

Same config-fingerprint contract as checkpoint.py: the fingerprint JSON
is stored next to the tree and diffed on mismatch (load refuses unless
`allow_mismatch`, printing the unified diff the reference prints,
netbase.py:432-446).  Structure recovery is intentionally NOT offered
here — sharded checkpoints target production resume where the config is
fingerprint-identical; for surgery across architecture changes use the
msgpack path's shape recovery.
"""

from __future__ import annotations

import difflib
import json
import os
from typing import Any, Optional

import jax

from deepprior_tpu.train.checkpoint import _fingerprint

_FP_NAME = "fingerprint.json"
_FP_NEW_NAME = "fingerprint.json.new"
_TREE_NAME = "tree"
_TREE_NEW_NAME = "tree.new"


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def _committed_tree(path: str) -> Optional[str]:
    """The newest COMMITTED tree dir under a checkpoint path, or None.

    Saves write to tree.new (orbax materializes the name only on commit)
    and promote it over tree at the next sync point, so when both exist
    tree.new is the newer complete snapshot; mid-write or mid-promotion
    crashes always leave at least one committed dir behind."""
    for name in (_TREE_NEW_NAME, _TREE_NAME):
        d = os.path.join(path, name)
        if os.path.isdir(d):
            return d
    return None


def _fp_for(path: str) -> Optional[str]:
    """The fingerprint file PAIRED with the newest committed tree.

    save() writes fingerprint.json.new before kicking the tree write and
    _promote renames it over fingerprint.json together with tree.new ->
    tree, so the pairing rule is: a committed tree.new pairs with
    fingerprint.json.new when that exists (pre-promote state; also every
    crash window — fp.new is written first, so tree.new implies fp.new),
    otherwise with fingerprint.json (promote replaces the fp FIRST, so
    once fp.new is gone fingerprint.json already holds the new config).
    A committed `tree` always pairs with fingerprint.json.  Returns None
    when no committed tree or no paired fingerprint exists."""
    tree_dir = _committed_tree(path)
    if tree_dir is None:
        return None
    if os.path.basename(tree_dir) == _TREE_NEW_NAME:
        fp_new = os.path.join(path, _FP_NEW_NAME)
        if os.path.exists(fp_new):
            return fp_new
    fp = os.path.join(path, _FP_NAME)
    return fp if os.path.exists(fp) else None


def is_sharded_checkpoint(path: str) -> bool:
    """True when path holds a RESTORABLE sharded checkpoint: a committed
    tree plus its paired fingerprint marker (a crash before the first
    commit leaves markers alone — that is debris, not a checkpoint, and
    resume must not dispatch to the sharded restore)."""
    return os.path.isdir(path) and _fp_for(path) is not None


def _barrier(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _promote(path: str) -> None:
    """Promote a committed tree.new over tree (process 0 + barrier).

    Called after every drain point.  Crash-safe at every step: while
    tree (old) is being removed or after it is gone, tree.new is intact
    and _committed_tree prefers it; the final rename is atomic."""
    new_dir = os.path.join(path, _TREE_NEW_NAME)
    if jax.process_index() == 0 and os.path.isdir(new_dir):
        import shutil

        # fingerprint FIRST: while tree.new exists it pairs with fp.new
        # (see _fp_for), so replacing fingerprint.json before the tree
        # rename keeps every crash window consistently paired — a crash
        # here leaves tree.new + promoted fingerprint.json, which _fp_for
        # resolves to the (identical) fingerprint.json
        fp_new = os.path.join(path, _FP_NEW_NAME)
        if os.path.exists(fp_new):
            os.replace(fp_new, os.path.join(path, _FP_NAME))
        old_dir = os.path.join(path, _TREE_NAME)
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)
        os.rename(new_dir, old_dir)
    _barrier("deepprior_sharded_ckpt_promote")


class ShardedCheckpointer:
    """Thin lifecycle wrapper: one orbax (Async)Checkpointer reused across
    snapshots, so async saves overlap training and serialize with each
    other.  Use as a context manager or call close()."""

    def __init__(self, async_save: bool = False):
        ocp = _ocp()
        handler = ocp.StandardCheckpointHandler()
        self._ckptr = (
            ocp.AsyncCheckpointer(handler)
            if async_save
            else ocp.Checkpointer(handler)
        )
        self.async_save = async_save
        self._last_path: Optional[str] = None

    # -- lifecycle ----------------------------------------------------
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        self.wait_until_finished()
        self._ckptr.close()

    def wait_until_finished(self):
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()
        if self._last_path is not None:
            path, self._last_path = self._last_path, None
            _promote(path)

    # -- save / restore -------------------------------------------------
    def save(self, path: str, tree: Any, config: Any = None) -> None:
        """Write the pytree (sharded arrays stay sharded) + fingerprint.

        Arrays must be jax.Arrays (or host values); do NOT device_get
        sharded arrays first — each process writes its own shards.

        Crash-atomic rolling saves: the new snapshot is written to
        tree.new (orbax itself writes a temp dir and renames on commit,
        so tree.new only EXISTS once complete) while the previous
        committed tree is left untouched; promotion over tree happens at
        the next drain point (_promote).  A crash anywhere — including
        mid-async-write, when training has already moved on — leaves at
        least one committed tree for restore to find."""
        path = os.path.abspath(path)
        ocp = _ocp()
        new_dir = os.path.join(path, _TREE_NEW_NAME)
        # drain any in-flight async save FIRST (its commit step creates
        # tree.new, so checking existence before draining races); this
        # also promotes the previous snapshot of OUR last save
        self.wait_until_finished()
        # Housekeeping under process 0 only (concurrent rmtrees on a
        # shared filesystem race mid-walk); the barrier inside _promote
        # is UNCONDITIONAL in multi-process mode so it cannot deadlock
        # when the dir's visibility differs across processes, and no
        # process starts the orbax save while cleanup is in flight.
        _promote(path)  # leftover committed tree.new from a crashed run
        if jax.process_index() == 0:
            if os.path.isfile(path):
                # a prior msgpack (single-file) snapshot at the rolling
                # path: the snapshot-cadence contract is overwrite, so a
                # format switch must not crash makedirs below
                os.remove(path)
            if os.path.isdir(path):
                # stale orbax temp dirs from crashed writes (never an
                # in-flight one: all saves on this path are drained)
                import shutil

                for name in os.listdir(path):
                    if ".orbax-checkpoint-tmp-" in name:
                        shutil.rmtree(os.path.join(path, name))
        _barrier("deepprior_sharded_ckpt_clean")
        os.makedirs(path, exist_ok=True)
        # fingerprint staged as fp.new BEFORE the tree write kicks off and
        # promoted together with tree.new at the drain point (_promote):
        # writing fingerprint.json directly here would pair the NEW
        # config's fingerprint with the OLD committed tree in the async
        # crash window, silently suppressing the mismatch diff on resume
        if jax.process_index() == 0:
            fp_new = os.path.join(path, _FP_NEW_NAME)
            tmp = fp_new + ".tmp"
            with open(tmp, "w") as f:
                f.write(_fingerprint(config))
            os.replace(tmp, fp_new)
        _barrier("deepprior_sharded_ckpt_fp_staged")
        self._ckptr.save(new_dir, args=ocp.args.StandardSave(tree))
        self._last_path = path

    def metadata_keys(self, path: str) -> set:
        """Top-level key names of the stored tree (cheap: metadata only —
        the structure probe for optional subtrees like the trainer's
        best tracker, same contract as checkpoint.checkpoint_keys)."""
        path = os.path.abspath(path)
        tree_dir = _committed_tree(path)
        if tree_dir is None:
            raise FileNotFoundError(f"no committed tree under {path}")
        meta = self._ckptr.metadata(tree_dir)
        tree = getattr(meta, "item_metadata", meta)
        if hasattr(tree, "tree"):  # StandardCheckpointHandler metadata
            tree = tree.tree
        return set(tree.keys())

    def restore(
        self,
        path: str,
        target: Any,
        config: Any = None,
        allow_mismatch: bool = False,
    ):
        """Restore onto `target`'s structure and placements.

        target: a pytree of concrete arrays OR jax.ShapeDtypeStruct with
        `.sharding` set — restored leaves land with exactly those
        shardings (no host round-trip, no re-placement needed).
        Returns (tree, fingerprint_matched)."""
        path = os.path.abspath(path)
        ocp = _ocp()
        matched = True
        if config is not None:
            fp_path = _fp_for(path)
            if fp_path is None:
                raise FileNotFoundError(
                    f"no committed checkpoint fingerprint under {path}"
                )
            with open(fp_path) as f:
                stored = f.read()
            now = _fingerprint(config)
            if stored != now:
                matched = False
                diff = "\n".join(
                    difflib.unified_diff(
                        stored.splitlines(),
                        now.splitlines(),
                        "checkpoint config",
                        "current config",
                        lineterm="",
                    )
                )
                if not allow_mismatch:
                    raise ValueError(
                        f"config fingerprint mismatch for {path}:\n{diff}"
                    )
                print(f"WARNING: resuming across config change:\n{diff}")

        def as_abstract(leaf):
            if isinstance(leaf, jax.ShapeDtypeStruct):
                return leaf
            if isinstance(leaf, jax.Array):
                return jax.ShapeDtypeStruct(
                    leaf.shape, leaf.dtype, sharding=leaf.sharding
                )
            return leaf  # python scalars restore as saved

        abstract = jax.tree.map(as_abstract, target)
        tree_dir = _committed_tree(path)
        if tree_dir is None:
            raise FileNotFoundError(f"no committed tree under {path}")
        tree = self._ckptr.restore(
            tree_dir, args=_ocp().args.StandardRestore(abstract)
        )
        return tree, matched


def save_checkpoint_sharded(
    path: str, tree: Any, config: Any = None
) -> None:
    """One-shot synchronous sharded save (see ShardedCheckpointer)."""
    with ShardedCheckpointer(async_save=False) as ck:
        ck.save(path, tree, config=config)


def load_checkpoint_sharded(
    path: str, target: Any, config: Any = None, allow_mismatch: bool = False
):
    """One-shot sharded restore (see ShardedCheckpointer.restore)."""
    with ShardedCheckpointer(async_save=False) as ck:
        return ck.restore(
            path, target, config=config, allow_mismatch=allow_mismatch
        )
