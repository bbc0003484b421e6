"""Auxiliary subsystem tests: prefetcher, hooks, debug activations,
point cloud."""

import numpy as np
import pytest

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.train.prefetch import DevicePrefetcher, chunked_epochs
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer
from deepprior_tpu.utils.pointcloud import PointCloud


def test_chunked_epochs_covers_data():
    arrays = {"x": np.arange(20)[:, None], "y": np.arange(20) * 3}
    batches = list(chunked_epochs(arrays, batch_size=8, n_epochs=2, seed=0))
    # 3 per epoch: the 4-sample tail trains in an alignData-padded batch
    # (reference nettrainer.py:365-413), never dropped
    assert len(batches) == 6
    for b in batches:
        assert b["x"].shape[0] == 8  # static shapes incl. the padded tail
        np.testing.assert_array_equal(b["y"], b["x"][:, 0] * 3)  # co-indexed
    # every frame appears in every epoch
    for ep in (batches[:3], batches[3:]):
        seen = set(np.concatenate([b["x"][:, 0] for b in ep]).tolist())
        assert seen == set(range(20))
    # the pad is the reference's seeded-random quirk: identical per epoch
    np.testing.assert_array_equal(batches[2]["x"][4:], batches[5]["x"][4:])


def test_device_prefetcher():
    arrays = {"x": np.random.default_rng(0).normal(size=(32, 4)).astype(np.float32)}
    it = DevicePrefetcher(chunked_epochs(arrays, 8, 1, seed=1))
    out = list(it)
    assert len(out) == 4
    import jax

    assert isinstance(out[0]["x"], jax.Array)


def test_device_prefetcher_propagates_worker_errors():
    """A failing host iterator (OOM, bad file, transfer error) must raise
    in the consumer, not masquerade as clean end-of-data — otherwise
    fit_streamed would end an epoch early and report a half-trained run
    as success."""

    def bad_iter():
        yield {"x": np.zeros((4, 2), np.float32)}
        raise MemoryError("staging failed")

    it = DevicePrefetcher(bad_iter())
    next(it)  # the good batch arrives
    with pytest.raises(RuntimeError, match="worker failed") as ei:
        next(it)
    assert isinstance(ei.value.__cause__, MemoryError)


@pytest.mark.slow
def test_epoch_hooks_and_debug_activations():
    cam = NYU_CAMERA
    seq = make_sequence(cam, 32, num_joints=14, seed=7)
    data = TrainData.from_sequence(seq)
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    cfg = TrainConfig(batch_size=16, n_epochs=2, aug_modes=None)
    trainer = Trainer(model, cfg, cam)
    state = trainer.init_state(np.asarray(data.crops[:16]))

    events = []
    state, _ = trainer.fit(
        state, data, log=lambda m: None,
        on_epoch_start=lambda e, s: events.append(("start", e)),
        on_epoch_end=lambda e, s, c: events.append(("end", e, float(c.mean()))),
    )
    assert ("start", 0) in events and ("start", 1) in events
    assert any(ev[0] == "end" and ev[1] == 1 for ev in events)

    out, inter = trainer.predict_with_intermediates(
        state, np.asarray(data.crops[:16])
    )
    assert out.shape == (16, 42)
    # per-layer activations captured (ConvPool towers + MLP head)
    assert len(inter) >= 4


def test_pointcloud_subsample(tmp_path):
    pc = PointCloud(max_num_points=100)
    pts = np.random.default_rng(0).normal(size=(5000, 3)).astype(np.float32)
    pc.set_points(pts)
    assert pc.points.shape == (100, 3)
    pc.add_point([1.0, 2.0, 3.0])
    assert pc.points.shape == (100, 3)  # replacement, not growth
    p = pc.save(str(tmp_path / "pc.png"))
    import os

    assert os.path.getsize(p) > 0
    pc.clear_points()
    assert len(pc.points) == 0


@pytest.mark.slow
def test_fit_streamed():
    """Streamed training (host arrays -> prefetcher -> per-batch jit step)
    learns like the device-resident path."""
    cam = NYU_CAMERA
    seq = make_sequence(cam, 64, num_joints=14, seed=13)
    data = TrainData.from_sequence(seq)
    arrays = {
        "crops": np.asarray(data.crops),
        "gt3d_crop": np.asarray(data.gt3d_crop),
        "com": np.asarray(data.com),
        "cube": np.asarray(data.cube),
        "m": np.asarray(data.m),
    }
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    cfg = TrainConfig(batch_size=16, learning_rate=0.002, n_epochs=6,
                      aug_modes=("com", "rot", "none"))
    trainer = Trainer(model, cfg, cam)
    state = trainer.init_state(arrays["crops"][:16])
    state, hist = trainer.fit_streamed(state, arrays, log=lambda m: None)
    costs = np.asarray(hist["train_cost"])
    assert np.isfinite(costs).all()
    assert costs[-8:].mean() < costs[:8].mean()


def test_synth_sequence_cache(tmp_path, monkeypatch):
    """Large synthetic sequences round-trip through the npz cache
    identically (data/synthetic.py::make_sequence caching)."""
    import deepprior_tpu.data.synthetic as synth
    from deepprior_tpu.camera import NYU_CAMERA

    monkeypatch.setattr(synth, "CACHE_MIN_FRAMES", 8)
    monkeypatch.setenv("HOME", str(tmp_path))
    s1 = synth.make_sequence(NYU_CAMERA, 8, seed=11)
    import os
    cdir = tmp_path / ".cache" / "deepprior_synth"
    assert len(list(cdir.glob("*.npz"))) == 1
    s2 = synth.make_sequence(NYU_CAMERA, 8, seed=11)
    import numpy as np
    for a, b in zip(s1.data, s2.data):
        np.testing.assert_array_equal(a.dpt, b.dpt)
        np.testing.assert_array_equal(a.gt3Dcrop, b.gt3Dcrop)
        np.testing.assert_array_equal(a.T, b.T)
        np.testing.assert_array_equal(a.com, b.com)
    # a different seed misses the cache
    s3 = synth.make_sequence(NYU_CAMERA, 8, seed=12)
    assert not np.array_equal(s3.data[0].dpt, s1.data[0].dpt)


def test_profiling_timers():
    """time_batched_inference and device_loop_latency return sane ms on the
    CPU backend (the helpers' host-fetch barrier contract, CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    from deepprior_tpu.utils.profiling import (
        device_loop_latency,
        time_batched_inference,
    )

    fn = jax.jit(lambda x: (x @ x).sum(axis=1))
    x = jnp.ones((64, 64))
    ms = time_batched_inference(fn, (x,), iters=3)
    assert ms >= 0.0

    def step(c):
        y = (x + c[0]) @ x
        return y[0, :1] * 1e-32

    dev_ms = device_loop_latency(step, jnp.zeros(1), iters=5)
    assert dev_ms >= 0.0


def test_require_accelerator_retry_path():
    """require_accelerator must complete its wait-and-retry loop and raise
    the documented RuntimeError on a CPU-only backend — in particular
    _clear_backends must not AttributeError on JAX 0.9, where the public
    jax.clear_backends was removed (advisor finding, mains/common.py:36-50).
    Subprocess: clearing backend caches mid-suite would invalidate live
    arrays in this process."""
    import os
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    code = (
        "import sys; sys.path.insert(0, 'mains');"
        "import common;"
        "common.require_accelerator(retries=3, wait_s=0.05)"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=repo, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode != 0
    assert "no accelerator available" in out.stderr
    assert "AttributeError" not in out.stderr
    # the loop actually retried (first attempt prints the waiting notice)
    assert "waiting for it" in out.stdout


def test_make_trainer_sp_plumbing():
    """mains.common.make_trainer(sp=2) builds a DistributedTrainer on a
    ('dp','sp','tp') mesh and its constrain rule spatially shards crops."""
    import os
    import sys

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "mains"))
    import common

    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.parallel import DistributedTrainer

    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=8, n_epochs=1, aug_modes=None)
    tr = common.make_trainer(model, cfg, NYU_CAMERA, dp=2, tp=2, sp=2)
    assert isinstance(tr, DistributedTrainer)
    assert dict(tr.mesh.shape) == {"dp": 2, "sp": 2, "tp": 2}
    con = tr.shard_batch(jnp.zeros((8, 128, 128)))
    assert con.sharding.spec == P("dp", "sp", None)


def test_aug_block_k_cli_plumbing():
    """--aug-block-k reaches TrainConfig, and augment_batch falls back to
    the per-sample kernel when the batch is not divisible by K."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "mains"))
    import common

    args = common.base_parser("t").parse_args(
        ["--synthetic", "--aug-block-k", "8"]
    )
    assert args.aug_block_k == 8
    cfg = TrainConfig(batch_size=8, n_epochs=1,
                      aug_block_k=args.aug_block_k)
    assert cfg.aug_block_k == 8

    # non-divisible batch: the gather path ignores block_k; the Pallas
    # wrapper would assert — augment_batch guards with a fallback to None
    import numpy as np

    import jax

    from deepprior_tpu.camera import NYU_CAMERA as cam
    from deepprior_tpu.ops.augment import augment_batch

    rng = np.random.default_rng(0)
    b = 3  # not divisible by 2
    crops = rng.uniform(-1, 1, (b, 128, 128)).astype(np.float32)
    gt3d = rng.normal(0, 50, (b, 14, 3)).astype(np.float32)
    com = np.tile(np.array([320.0, 240.0, 700.0], np.float32), (b, 1))
    cube = np.tile(np.array([300.0, 300.0, 300.0], np.float32), (b, 1))
    m = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    ref = augment_batch(jax.random.key(0), crops, gt3d, com, cube, m, cam,
                        use_pallas=False, block_k=None)
    out = augment_batch(jax.random.key(0), crops, gt3d, com, cube, m, cam,
                        use_pallas=False, block_k=2)
    for a, r in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))
