"""Sharded (orbax/tensorstore) checkpointing: shard-preserving round
trips, fingerprint gating, and trainer-level resume parity with the
msgpack path (train/checkpoint_sharded.py; the msgpack path carries the
reference's pickle semantics, netbase.py:405-477 — this backend is the
pod-scale variant with no reference counterpart)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.train.checkpoint_sharded import (
    ShardedCheckpointer,
    is_sharded_checkpoint,
    load_checkpoint_sharded,
    save_checkpoint_sharded,
)
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer


def test_sharded_roundtrip_preserves_shardings(tmp_path):
    """Leaves restore bit-exactly AND land on the target placements —
    including a tp-sharded matrix on a dp x tp mesh."""
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("dp", "tp"))
    sh = NamedSharding(mesh, P(None, "tp"))
    rep = NamedSharding(mesh, P())
    w = jax.device_put(
        jnp.arange(64, dtype=jnp.float32).reshape(8, 8), sh
    )
    b = jax.device_put(jnp.ones((8,)), rep)
    tree = {"params": {"w": w, "b": b}, "step": 7, "epoch": 3}

    path = str(tmp_path / "snap")
    save_checkpoint_sharded(path, tree, config={"lr": 0.1})
    assert is_sharded_checkpoint(path)

    target = {
        "params": {
            "w": jax.device_put(jnp.zeros((8, 8)), sh),
            "b": jax.device_put(jnp.zeros((8,)), rep),
        },
        "step": 0,
        "epoch": 0,
    }
    got, matched = load_checkpoint_sharded(path, target, config={"lr": 0.1})
    assert matched
    assert got["step"] == 7 and got["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                  np.asarray(w))
    assert got["params"]["w"].sharding == sh
    assert got["params"]["b"].sharding == rep


def test_sharded_fingerprint_gates(tmp_path):
    """A config change refuses to restore (unified diff in the message)
    unless allow_mismatch — same contract as the msgpack path."""
    path = str(tmp_path / "snap")
    x = jnp.arange(8.0)
    save_checkpoint_sharded(path, {"x": x}, config={"lr": 0.1})
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        load_checkpoint_sharded(path, {"x": x}, config={"lr": 0.5})
    got, matched = load_checkpoint_sharded(
        path, {"x": x}, config={"lr": 0.5}, allow_mismatch=True
    )
    assert not matched
    np.testing.assert_array_equal(np.asarray(got["x"]), np.asarray(x))


def test_async_save_overwrites_and_drains(tmp_path):
    """Snapshot cadence rewrites the same path: async saves serialize,
    the committed tree is the LAST save's."""
    path = str(tmp_path / "snap")
    with ShardedCheckpointer(async_save=True) as ck:
        ck.save(path, {"v": jnp.zeros(4), "epoch": 0}, config=None)
        ck.save(path, {"v": jnp.ones(4), "epoch": 5}, config=None)
        ck.wait_until_finished()
        got, _ = ck.restore(path, {"v": jnp.zeros(4), "epoch": 0})
    assert got["epoch"] == 5
    np.testing.assert_array_equal(np.asarray(got["v"]), np.ones(4))
    assert sorted(
        ShardedCheckpointer().metadata_keys(path)
    ) == ["epoch", "v"]


def test_snapshot_format_switch_overwrites(tmp_path):
    """The rolling-snapshot contract is overwrite: switching a run between
    --sharded-snapshots and the msgpack format over the same outdir must
    replace the old snapshot, not crash on the leftover file/directory."""
    from deepprior_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    path = str(tmp_path / "net_last.ckpt")
    # msgpack file first, then a sharded save to the same path
    save_checkpoint(path, {"v": jnp.zeros(4)}, config=None)
    assert os.path.isfile(path)
    save_checkpoint_sharded(path, {"v": jnp.ones(4)}, config=None)
    assert is_sharded_checkpoint(path)
    got, _ = load_checkpoint_sharded(path, {"v": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(got["v"]), np.ones(4))
    # and back: msgpack over the sharded directory
    save_checkpoint(path, {"v": jnp.full((4,), 2.0)}, config=None)
    assert os.path.isfile(path)
    got = load_checkpoint(path, {"v": jnp.zeros(4)})[0]
    np.testing.assert_array_equal(np.asarray(got["v"]), np.full((4,), 2.0))


def test_crash_before_first_commit_is_debris(tmp_path):
    """A crash after the fingerprint lands but before orbax commits any
    tree leaves a marker + temp-dir debris: that must NOT be treated as a
    restorable sharded checkpoint (resume would dispatch into a missing
    tree), and a later save over the same path must clean it up."""
    path = str(tmp_path / "snap")
    os.makedirs(os.path.join(path, ".orbax-checkpoint-tmp-123"))
    with open(os.path.join(path, "fingerprint.json"), "w") as f:
        f.write("{}")
    assert not is_sharded_checkpoint(path)
    with pytest.raises(FileNotFoundError, match="no committed tree"):
        load_checkpoint_sharded(path, {"v": jnp.zeros(4)})
    save_checkpoint_sharded(path, {"v": jnp.ones(4)}, config=None)
    assert is_sharded_checkpoint(path)
    assert not os.path.exists(
        os.path.join(path, ".orbax-checkpoint-tmp-123")
    )
    got, _ = load_checkpoint_sharded(path, {"v": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(got["v"]), np.ones(4))


def test_crash_before_promotion_prefers_tree_new(tmp_path):
    """Crash window between a committed tree.new and its promotion over
    tree: restore must pick the NEWER snapshot (tree.new), the old tree
    must still satisfy is_sharded_checkpoint alone (mid-promotion crash),
    and the next save must promote the leftover before overwriting."""
    path = str(tmp_path / "snap")
    save_checkpoint_sharded(path, {"v": jnp.zeros(4), "epoch": 0})
    assert os.path.isdir(os.path.join(path, "tree"))

    # second save, crash simulated BEFORE the drain point that promotes:
    # bypass the wrapper's close (which would promote) after the sync
    # orbax save commits tree.new
    ck = ShardedCheckpointer(async_save=False)
    ck.save(path, {"v": jnp.ones(4), "epoch": 5}, config=None)
    ck._ckptr.close()  # release orbax without promoting — the "crash"
    assert os.path.isdir(os.path.join(path, "tree.new"))
    assert os.path.isdir(os.path.join(path, "tree"))

    assert is_sharded_checkpoint(path)
    got, _ = load_checkpoint_sharded(path, {"v": jnp.zeros(4), "epoch": 0})
    assert got["epoch"] == 5  # the newer committed snapshot wins
    np.testing.assert_array_equal(np.asarray(got["v"]), np.ones(4))

    # mid-promotion crash: old tree already gone, rename not yet done
    import shutil

    shutil.rmtree(os.path.join(path, "tree"))
    assert is_sharded_checkpoint(path)
    got, _ = load_checkpoint_sharded(path, {"v": jnp.zeros(4), "epoch": 0})
    assert got["epoch"] == 5

    # the next save over the path promotes the leftover, then overwrites
    save_checkpoint_sharded(path, {"v": jnp.full((4,), 2.0), "epoch": 9})
    assert os.path.isdir(os.path.join(path, "tree"))
    assert not os.path.exists(os.path.join(path, "tree.new"))
    got, _ = load_checkpoint_sharded(path, {"v": jnp.zeros(4), "epoch": 0})
    assert got["epoch"] == 9


def test_msgpack_save_refuses_foreign_directory(tmp_path):
    """save_checkpoint's format-switch overwrite only removes OUR debris:
    pointing the rolling path at an arbitrary populated directory (e.g.
    an outdir passed where a file path belongs) must raise, not rmtree."""
    from deepprior_tpu.train.checkpoint import save_checkpoint

    path = str(tmp_path / "outdir")
    os.makedirs(path)
    with open(os.path.join(path, "results.json"), "w") as f:
        f.write("{}")
    with pytest.raises(IsADirectoryError, match="refusing to overwrite"):
        save_checkpoint(path, {"v": jnp.zeros(4)}, config=None)
    assert os.path.exists(os.path.join(path, "results.json"))


def test_msgpack_save_recovers_empty_directory(tmp_path):
    """An EMPTY directory at the rolling path is our own debris: a sharded
    save killed between its makedirs and the first marker write leaves one
    (checkpoint_sharded.py save order).  save_checkpoint must remove it and
    proceed, not raise forever."""
    from deepprior_tpu.train.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    path = str(tmp_path / "net_last")
    os.makedirs(path)  # the crash window leaves exactly this
    save_checkpoint(path, {"v": jnp.full((4,), 3.0)}, config=None)
    assert os.path.isfile(path)
    got, _ = load_checkpoint(path, {"v": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(got["v"]), 3.0)


@pytest.fixture(scope="module")
def trained():
    cam = NYU_CAMERA
    seq = make_sequence(cam, 32, num_joints=14, seed=11)
    data = TrainData.from_sequence(seq)
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    cfg = TrainConfig(batch_size=16, learning_rate=0.002, n_epochs=2,
                      aug_modes=None, snapshot_every=1,
                      use_early_stopping=False)
    t = Trainer(model, cfg, cam)
    s = t.init_state(np.asarray(data.crops[:16]))
    s, _ = t.fit(s, data, log=lambda m: None)
    return cam, data, model, cfg, t, s


@pytest.mark.slow
def test_trainer_sharded_snapshot_roundtrip(trained, tmp_path):
    """save_train_state with sharded_snapshots=True writes a directory;
    load_train_state auto-detects it and restores params, BN stats,
    optimizer moments, step, epoch, and the best tracker bit-exactly."""
    cam, data, model, cfg, t, s = trained
    t.sharded_snapshots = True
    path = str(tmp_path / "net_last.ckpt")
    best = (1.25, s.params, s.batch_stats, 1)
    t.save_train_state(path, s, epoch=1, best=best)
    t._drain_snapshots()
    assert is_sharded_checkpoint(path) and os.path.isdir(path)

    t2 = Trainer(model, cfg, cam)
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    s2, next_epoch = t2.load_train_state(path, s2)
    assert next_epoch == 2
    assert int(s2.step) == int(s.step)
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s.opt_state),
                    jax.tree.leaves(s2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    val, bp, bs, be = t2._take_resumed_best()
    assert val == 1.25 and be == 1
    for a, b in zip(jax.tree.leaves(best[1]), jax.tree.leaves(bp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_distributed_sharded_resume_bit_identical(tmp_path):
    """DistributedTrainer + sharded snapshots: the restore target is the
    mesh-placed init state, so shards land directly on their placements
    (no re-place pass) and the resumed run stays bit-identical to an
    uninterrupted one."""
    from deepprior_tpu.parallel import DistributedTrainer, make_mesh

    cam = NYU_CAMERA
    seq = make_sequence(cam, 32, num_joints=14, seed=13)
    data = TrainData.from_sequence(seq)
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    cfg = TrainConfig(batch_size=16, learning_rate=0.002, n_epochs=4,
                      aug_modes=None, snapshot_every=1,
                      use_early_stopping=False)
    mesh = make_mesh(dp=4, tp=2)

    t1 = DistributedTrainer(model, cfg, cam, mesh)
    s1 = t1.init_state(np.asarray(data.crops[:16]))
    s1, _ = t1.fit(s1, t1.place_data(data), log=lambda m: None)

    t2 = DistributedTrainer(model, cfg, cam, mesh)
    t2.sharded_snapshots = True
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    s2, _ = t2.fit(s2, t2.place_data(data), n_epochs=2, log=lambda m: None)
    path = str(tmp_path / "dist_snap.ckpt")
    t2.save_train_state(path, s2, epoch=1)
    t2._drain_snapshots()

    t3 = DistributedTrainer(model, cfg, cam, mesh)
    s3 = t3.init_state(np.asarray(data.crops[:16]))
    s3, next_epoch = t3.load_train_state(path, s3)
    assert next_epoch == 2
    # shards landed on the mesh placements (tp-sharded FC kernels included)
    for a, b in zip(jax.tree.leaves(s3.params),
                    jax.tree.leaves(t3.init_state(
                        np.asarray(data.crops[:16])).params)):
        assert a.sharding == b.sharding
    s3, _ = t3.fit(s3, t3.place_data(data), start_epoch=next_epoch,
                   log=lambda m: None)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fingerprint_pairs_with_committed_tree(tmp_path):
    """The config fingerprint commits WITH its tree, not before it: a
    crash in the async window must never pair the NEW config's
    fingerprint with the OLD committed tree (which would silently
    suppress the mismatch diff on resume)."""
    from deepprior_tpu.train.checkpoint_sharded import (
        ShardedCheckpointer, is_sharded_checkpoint, load_checkpoint_sharded,
    )

    path = str(tmp_path / "snap")
    cfg_a = {"lr": 1e-3}
    cfg_b = {"lr": 5e-4}
    save_checkpoint_sharded(path, {"v": jnp.zeros(4), "epoch": 1},
                            config=cfg_a)
    assert is_sharded_checkpoint(path)

    # crash window 1: fingerprint staged (fp.new = B) but the tree write
    # never committed -> the committed tree still pairs with config A
    with open(os.path.join(path, "fingerprint.json.new"), "w") as f:
        from deepprior_tpu.train.checkpoint import _fingerprint

        f.write(_fingerprint(cfg_b))
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        load_checkpoint_sharded(path, {"v": jnp.zeros(4), "epoch": 0},
                                config=cfg_b)
    got, ok = load_checkpoint_sharded(path, {"v": jnp.zeros(4), "epoch": 0},
                                      config=cfg_a)
    assert ok and got["epoch"] == 1
    os.remove(os.path.join(path, "fingerprint.json.new"))

    # crash window 2: tree.new (B) committed but not yet promoted -> the
    # newest committed tree pairs with fp.new (B), and a fresh restore
    # sees config B + values B
    ck = ShardedCheckpointer(async_save=False)
    ck.save(path, {"v": jnp.ones(4), "epoch": 7}, config=cfg_b)
    assert os.path.isdir(os.path.join(path, "tree.new"))
    assert os.path.exists(os.path.join(path, "fingerprint.json.new"))
    got, ok = load_checkpoint_sharded(path, {"v": jnp.zeros(4), "epoch": 0},
                                      config=cfg_b)
    assert ok and got["epoch"] == 7
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        load_checkpoint_sharded(path, {"v": jnp.zeros(4), "epoch": 0},
                                config=cfg_a)
    # drain: promote renames both markers together
    ck.close()
    assert not os.path.exists(os.path.join(path, "tree.new"))
    assert not os.path.exists(os.path.join(path, "fingerprint.json.new"))
    got, ok = load_checkpoint_sharded(path, {"v": jnp.zeros(4), "epoch": 0},
                                      config=cfg_b)
    assert ok and got["epoch"] == 7
