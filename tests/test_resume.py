"""Checkpoint/resume: training continues bit-consistently after restore."""

import numpy as np
import pytest

# subprocess / multi-process / convergence tests: full runs are the
# round gate; the fast dev loop deselects with -m 'not slow'
pytestmark = pytest.mark.slow

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer


@pytest.fixture(scope="module")
def setup():
    cam = NYU_CAMERA
    seq = make_sequence(cam, 48, num_joints=14, seed=21)
    data = TrainData.from_sequence(seq)
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    cfg = TrainConfig(batch_size=16, learning_rate=0.002, n_epochs=4,
                      aug_modes=None, snapshot_every=1, use_early_stopping=False)
    return cam, data, model, cfg


def test_resume_matches_uninterrupted(setup, tmp_path):
    cam, data, model, cfg = setup

    # uninterrupted run
    t1 = Trainer(model, cfg, cam)
    s1 = t1.init_state(np.asarray(data.crops[:16]))
    s1, h1 = t1.fit(s1, data, log=lambda m: None)

    # interrupted: 2 epochs, snapshot, restore, 2 more
    t2 = Trainer(model, cfg, cam)
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    s2, _ = t2.fit(s2, data, n_epochs=2, log=lambda m: None)
    path = str(tmp_path / "snap.ckpt")
    t2.save_train_state(path, s2, epoch=1)

    t3 = Trainer(model, cfg, cam)
    s3 = t3.init_state(np.asarray(data.crops[:16]))
    s3, next_epoch = t3.load_train_state(path, s3)
    assert next_epoch == 2
    s3_final, h3 = t3.fit(s3, data, start_epoch=next_epoch, log=lambda m: None)

    # fit() fast-forwards the permutation RNG and the aug/dropout key
    # through the already-trained epochs, so the resumed run consumes the
    # exact streams the uninterrupted run did: the parameter trajectories
    # must agree to float determinism (same device, same programs)
    import jax

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3_final.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the recorded costs of the resumed epochs match the tail of the
    # uninterrupted history
    c1 = np.asarray(h1["train_cost"])
    c3 = np.asarray(h3["train_cost"])
    np.testing.assert_allclose(c3[-len(c1) // 2:], c1[-len(c1) // 2:],
                               rtol=0, atol=0)

    # step counter continued
    assert int(s3_final.step) == int(s1.step)


def test_early_stopping_best_survives_resume(setup, tmp_path):
    """The early-stopping tracker is persisted in snapshots and consumed on
    resume: without this, a resumed run forgets the pre-interruption global
    best and restores the best of the remaining epochs only (breaking the
    bit-identical-resume contract for the default early-stopping config)."""
    import jax

    cam, data, model, _ = setup
    cfg = TrainConfig(batch_size=16, learning_rate=0.002, n_epochs=4,
                      aug_modes=None, snapshot_every=1,
                      use_early_stopping=True, eval_every=1)
    t = Trainer(model, cfg, cam)
    s = t.init_state(np.asarray(data.crops[:16]))

    # fabricate an unbeatable pre-interruption best (the INITIAL params,
    # distinctive vs anything training produces) and round-trip it
    best_params = jax.device_get(s.params)
    best_stats = jax.device_get(s.batch_stats)
    path = str(tmp_path / "best_snap.ckpt")
    t.save_train_state(path, s, epoch=1,
                       best=(1e-9, best_params, best_stats, 0))

    t2 = Trainer(model, cfg, cam)
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    s2, next_epoch = t2.load_train_state(path, s2)
    assert next_epoch == 2
    restored = t2._take_resumed_best()
    assert restored[0] == 1e-9 and restored[3] == 0
    for a, b in zip(jax.tree.leaves(best_params), jax.tree.leaves(restored[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # behavioral: the resumed epochs can never beat val=1e-9, so the final
    # early-stopping restore must hand back the persisted best weights
    t3 = Trainer(model, cfg, cam)
    s3 = t3.init_state(np.asarray(data.crops[:16]))
    s3, next_epoch = t3.load_train_state(path, s3)
    s3f, _ = t3.fit(s3, data, val_data=data, start_epoch=next_epoch,
                    log=lambda m: None)
    for a, b in zip(jax.tree.leaves(best_params), jax.tree.leaves(s3f.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # legacy snapshots (no persisted tracker) still load, with a fresh one
    t4 = Trainer(model, cfg, cam)
    s4 = t4.init_state(np.asarray(data.crops[:16]))
    t4.save_train_state(path, s4, epoch=0)
    s4, _ = t4.load_train_state(path, s4)
    assert t4._take_resumed_best()[1] is None


def test_snapshot_written_during_fit(setup, tmp_path):
    cam, data, model, cfg = setup
    t = Trainer(model, cfg, cam)
    s = t.init_state(np.asarray(data.crops[:16]))
    snap = str(tmp_path / "net")
    t.fit(s, data, n_epochs=2, snapshot_path=snap, log=lambda m: None)
    import os

    assert os.path.exists(snap + "_last.ckpt")
    # restorable
    s2 = t.init_state(np.asarray(data.crops[:16]))
    s2, next_epoch = t.load_train_state(snap + "_last.ckpt", s2)
    assert next_epoch >= 1

def test_streamed_resume_matches_uninterrupted(setup, tmp_path):
    """fit_streamed(start_epoch=k) + restored state == one uninterrupted
    streamed run, bit-for-bit (permutations skip inside macro_chunks, the
    step key fast-forwards by k*steps splits)."""
    cam, data, model, cfg = setup
    arrays = {
        "crops": np.asarray(data.crops),
        "gt3d_crop": np.asarray(data.gt3d_crop),
        "com": np.asarray(data.com),
        "cube": np.asarray(data.cube),
        "m": np.asarray(data.m),
    }

    t1 = Trainer(model, cfg, cam)
    s1 = t1.init_state(np.asarray(data.crops[:16]))
    s1, h1 = t1.fit_streamed(s1, arrays, n_epochs=4, chunk_steps=2,
                             log=lambda m: None)

    t2 = Trainer(model, cfg, cam)
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    s2, _ = t2.fit_streamed(s2, arrays, n_epochs=2, chunk_steps=2,
                            log=lambda m: None)
    path = str(tmp_path / "stream_snap.ckpt")
    t2.save_train_state(path, s2, epoch=1)

    t3 = Trainer(model, cfg, cam)
    s3 = t3.init_state(np.asarray(data.crops[:16]))
    s3, next_epoch = t3.load_train_state(path, s3)
    assert next_epoch == 2
    s3, h3 = t3.fit_streamed(s3, arrays, n_epochs=4, chunk_steps=2,
                             start_epoch=next_epoch, log=lambda m: None)

    import jax

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c1 = np.asarray(h1["train_cost"])
    c3 = np.asarray(h3["train_cost"])
    np.testing.assert_allclose(c3, c1[-len(c3):], rtol=0, atol=0)

def test_distributed_resume_matches_uninterrupted(setup, tmp_path):
    """The dp x tp trainer resumes bit-identically as well: the RNG
    fast-forward lives in the shared fit(), and load_train_state's
    host round trip must not disturb the GSPMD placement semantics."""
    from deepprior_tpu.parallel import DistributedTrainer, make_mesh

    cam, data, model, cfg = setup
    mesh = make_mesh(dp=4, tp=2)

    t1 = DistributedTrainer(model, cfg, cam, mesh)
    s1 = t1.init_state(np.asarray(data.crops[:16]))
    s1, _ = t1.fit(s1, t1.place_data(data), log=lambda m: None)

    t2 = DistributedTrainer(model, cfg, cam, mesh)
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    s2, _ = t2.fit(s2, t2.place_data(data), n_epochs=2, log=lambda m: None)
    path = str(tmp_path / "dist_snap.ckpt")
    t2.save_train_state(path, s2, epoch=1)

    t3 = DistributedTrainer(model, cfg, cam, mesh)
    s3 = t3.init_state(np.asarray(data.crops[:16]))
    s3, next_epoch = t3.load_train_state(path, s3)
    assert next_epoch == 2
    s3, _ = t3.fit(s3, t3.place_data(data), start_epoch=next_epoch,
                   log=lambda m: None)

    import jax

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

def test_distributed_streamed_resume(setup, tmp_path):
    """The large-scale composition: mesh-sharded trainer + host-resident
    streamed dataset + resume, still bit-identical."""
    from deepprior_tpu.parallel import DistributedTrainer, make_mesh

    cam, data, model, cfg = setup
    mesh = make_mesh(dp=4, tp=2)
    arrays = {
        "crops": np.asarray(data.crops),
        "gt3d_crop": np.asarray(data.gt3d_crop),
        "com": np.asarray(data.com),
        "cube": np.asarray(data.cube),
        "m": np.asarray(data.m),
    }

    t1 = DistributedTrainer(model, cfg, cam, mesh)
    s1 = t1.init_state(np.asarray(data.crops[:16]))
    s1, _ = t1.fit_streamed(s1, arrays, n_epochs=4, chunk_steps=2,
                            log=lambda m: None)

    t2 = DistributedTrainer(model, cfg, cam, mesh)
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    s2, _ = t2.fit_streamed(s2, arrays, n_epochs=2, chunk_steps=2,
                            log=lambda m: None)
    path = str(tmp_path / "dist_stream_snap.ckpt")
    t2.save_train_state(path, s2, epoch=1)

    t3 = DistributedTrainer(model, cfg, cam, mesh)
    s3 = t3.init_state(np.asarray(data.crops[:16]))
    s3, next_epoch = t3.load_train_state(path, s3)
    s3, _ = t3.fit_streamed(s3, arrays, n_epochs=4, chunk_steps=2,
                            start_epoch=next_epoch, log=lambda m: None)

    import jax

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
