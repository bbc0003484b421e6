"""Trainer tests: end-to-end toy training, schedule, optimizer, checkpoint."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import fit_pose_prior
from deepprior_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from deepprior_tpu.train.optimizer import lr_of_ep, reference_adam, reference_rmsprop
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer


def test_lr_schedule():
    s = lr_of_ep(0.01)
    assert float(s(0)) == pytest.approx(0.001)
    assert float(s(1)) == pytest.approx(0.001)
    assert float(s(2)) == pytest.approx(0.01 / 3.0)
    assert float(s(3)) == pytest.approx(0.01 * np.exp(-0.12), rel=1e-5)
    assert float(s(50)) < float(s(3))


def test_reference_adam_minimizes_quadratic():
    tx = reference_adam()
    params = {"w": jnp.array([5.0, -3.0])}
    opt_state = tx.init(params)
    lr = 0.1
    for _ in range(200):
        grads = jax.tree.map(lambda w: 2 * w, params)  # d/dw w^2
        upd, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p - lr * u, params, upd)
    assert float(jnp.abs(params["w"]).max()) < 1e-2


def test_reference_rmsprop_minimizes_quadratic():
    tx = reference_rmsprop()
    params = {"w": jnp.array([5.0, -3.0])}
    opt_state = tx.init(params)
    # rms-normalized steps behave like sign-SGD (~lr per iteration), so
    # reaching the optimum from |w|=5 takes ~|w|/lr iterations
    for _ in range(1200):
        grads = jax.tree.map(lambda w: 2 * w, params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p - 0.01 * u, params, upd)
    assert float(jnp.abs(params["w"]).max()) < 0.1


@pytest.fixture(scope="module")
def toy_setup():
    cam = NYU_CAMERA
    seq = make_sequence(cam, 64, num_joints=14, seed=3)
    data = TrainData.from_sequence(seq)
    rng = np.random.default_rng(23455)
    prior = fit_pose_prior(
        cam, rng, data.gt3d_crop, data.com, data.cube,
        n_components=30, num_poses=5000,
    )
    return cam, data, prior


def test_train_data_from_sequence(toy_setup):
    cam, data, _ = toy_setup
    assert data.crops.shape == (64, 128, 128)
    assert data.gt3d_crop.shape == (64, 14, 3)
    assert data.crops.min() >= -1.0 - 1e-5 and data.crops.max() <= 1.0 + 1e-5


@pytest.mark.slow
def test_end_to_end_training_reduces_loss(toy_setup):
    cam, data, prior = toy_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(
        batch_size=16, learning_rate=0.003, n_epochs=8,
        aug_modes=("com", "rot", "none"), eval_every=2,
    )
    trainer = Trainer(model, cfg, cam, prior=prior)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    state, hist = trainer.fit(state, data, val_data=data, log=lambda m: None)
    costs = np.asarray(hist["train_cost"])
    assert np.isfinite(costs).all()
    # loss should drop substantially over 8 epochs on 64 samples
    assert costs[-4:].mean() < costs[:4].mean() * 0.7
    assert len(hist["val_error_mm"]) >= 3


def test_training_without_augmentation(toy_setup):
    cam, data, prior = toy_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, learning_rate=0.003, n_epochs=3, aug_modes=None)
    trainer = Trainer(model, cfg, cam, prior=prior)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    state, hist = trainer.fit(state, data, log=lambda m: None)
    assert np.isfinite(np.asarray(hist["train_cost"])).all()


def test_direct_pose_regression(toy_setup):
    """No PCA prior: targets are (B, J, 3) normalized poses; loss is the
    per-joint-summed squared error (poseregnettrainer.py:99-101)."""
    cam, data, _ = toy_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    cfg = TrainConfig(batch_size=16, learning_rate=0.001, n_epochs=2, aug_modes=None)
    trainer = Trainer(model, cfg, cam, prior=None)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    state, hist = trainer.fit(state, data, log=lambda m: None)
    assert np.isfinite(np.asarray(hist["train_cost"])).all()
    obs = trainer.evaluate(state, data)
    assert np.isfinite(obs["error_mm_avg"])


def test_sub_epoch_validation(toy_setup):
    """validation_frequency runs observers every V minibatches inside the
    epoch (reference nettrainer.py:859-889): 64 frames / batch 16 = 4
    steps; V=2 -> 2 validations per epoch."""
    cam, data, _ = toy_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    cfg = TrainConfig(
        batch_size=16, n_epochs=2, aug_modes=None, validation_frequency=2
    )
    trainer = Trainer(model, cfg, cam, prior=None)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    state, hist = trainer.fit(state, data, val_data=data, log=lambda m: None)
    assert len(hist["val_error_mm"]) == 4  # 2 segments x 2 epochs
    assert np.isfinite(hist["val_error_mm"]).all()
    assert len(hist["train_cost"]) == 8  # 4 steps x 2 epochs, none dropped


def test_evaluate_device_resident(toy_setup):
    """evaluate() accepts device-resident TrainData and returns the same
    metrics as with host arrays (the device-side scan path)."""
    cam, data, _ = toy_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    cfg = TrainConfig(batch_size=16, n_epochs=1, aug_modes=None)
    trainer = Trainer(model, cfg, cam, prior=None)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    sub = TrainData(*(np.asarray(a)[:19] for a in data))
    host = trainer.evaluate(state, sub)
    dev = trainer.evaluate(state, jax.tree.map(jnp.asarray, sub))
    for k in host:
        assert host[k] == pytest.approx(dev[k], rel=1e-6), k


def test_predict_pads_tail(toy_setup):
    cam, data, prior = toy_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, n_epochs=1, aug_modes=None)
    trainer = Trainer(model, cfg, cam, prior=prior)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    out = trainer.predict(state, np.asarray(data.crops[:19]))
    assert out.shape == (19, 30)


@pytest.mark.slow
def test_macro_chunking_invariant(toy_setup):
    """fit_streamed's loss trace must not depend on chunk_steps — the
    macro-chunk scan consumes RNG per minibatch exactly like the
    single-step path (reference macro batches, nettrainer.py:489-599)."""
    cam, data, prior = toy_setup
    arrays = {
        "crops": np.asarray(data.crops),
        "gt3d_crop": np.asarray(data.gt3d_crop),
        "com": np.asarray(data.com),
        "cube": np.asarray(data.cube),
        "m": np.asarray(data.m),
    }
    traces = []
    for k in (1, 4):
        model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
        cfg = TrainConfig(batch_size=16, n_epochs=2, aug_modes=("com", "none"))
        trainer = Trainer(model, cfg, cam, prior=prior)
        state = trainer.init_state(arrays["crops"][:16])
        _, hist = trainer.fit_streamed(
            state, arrays, chunk_steps=k, log=lambda m: None
        )
        traces.append(np.asarray(hist["train_cost"]))
    assert traces[0].shape == traces[1].shape == (8,)  # 4 steps x 2 epochs
    np.testing.assert_allclose(traces[0], traces[1], rtol=1e-6)


@pytest.mark.slow
def test_fit_trains_tail_batch(toy_setup):
    """The n % batch_size tail trains every epoch via alignData padding
    (reference nettrainer.py:365-413) — 40 frames / batch 16 = 3 steps
    per epoch (2 full + 1 padded), not 2 (VERDICT r3 missing #3)."""
    cam, data, prior = toy_setup
    sub = TrainData(*(np.asarray(a)[:40] for a in data))
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, n_epochs=2, aug_modes=None)
    trainer = Trainer(model, cfg, cam, prior=prior)
    state = trainer.init_state(np.asarray(sub.crops[:16]))
    state, hist = trainer.fit(state, sub, log=lambda m: None)
    assert len(hist["train_cost"]) == 6  # 3 steps x 2 epochs
    assert np.isfinite(hist["train_cost"]).all()

    # the streamed path sees the same ceil(n/b) epoch length
    arrays = {k: np.asarray(getattr(sub, k))
              for k in ("crops", "gt3d_crop", "com", "cube", "m")}
    model2 = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    trainer2 = Trainer(model2, cfg, cam, prior=prior)
    state2 = trainer2.init_state(arrays["crops"][:16])
    _, hist2 = trainer2.fit_streamed(state2, arrays, log=lambda m: None)
    assert len(hist2["train_cost"]) == 6

    with pytest.raises(ValueError, match="smaller than one batch"):
        tiny = TrainData(*(np.asarray(a)[:8] for a in data))
        trainer.fit(state, tiny, log=lambda m: None)


@pytest.mark.slow
def test_streamed_sub_epoch_validation(toy_setup):
    """cfg.validation_frequency works under fit_streamed (VERDICT r3 weak
    #1: it used to print a note and silently validate at epoch boundaries
    only): chunks are cut at segment boundaries, observers run every V
    minibatches, and the loss trace is unchanged by the segmentation."""
    cam, data, prior = toy_setup
    arrays = {
        "crops": np.asarray(data.crops),
        "gt3d_crop": np.asarray(data.gt3d_crop),
        "com": np.asarray(data.com),
        "cube": np.asarray(data.cube),
        "m": np.asarray(data.m),
    }
    hists = []
    for vf in (None, 2):
        model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
        cfg = TrainConfig(batch_size=16, n_epochs=2,
                          aug_modes=("com", "none"),
                          validation_frequency=vf)
        trainer = Trainer(model, cfg, cam, prior=prior)
        state = trainer.init_state(arrays["crops"][:16])
        # chunk_steps=3 straddles the vf=2 boundary unless macro_chunks
        # re-cuts it (4 steps/epoch -> segments of 2)
        _, hist = trainer.fit_streamed(
            state, arrays, val_data=data, chunk_steps=3, log=lambda m: None
        )
        hists.append(hist)
    base, sub = hists
    assert len(base["val_error_mm"]) == 2  # epoch boundaries only
    assert len(sub["val_error_mm"]) == 4  # 2 segments x 2 epochs
    assert np.isfinite(sub["val_error_mm"]).all()
    # the epoch-boundary observers are shared: segment-end values at the
    # epoch boundary equal the unsegmented run's boundary observers
    np.testing.assert_allclose(sub["val_error_mm"][1::2],
                               base["val_error_mm"], rtol=1e-6)
    # the minibatch stream is unchanged by segmentation
    np.testing.assert_allclose(sub["train_cost"], base["train_cost"],
                               rtol=1e-6)


def test_macro_chunks_match_chunked_epochs():
    """macro_chunks yields chunked_epochs' batches, stacked."""
    from deepprior_tpu.train.prefetch import chunked_epochs, macro_chunks

    rng = np.random.default_rng(0)
    arrays = {"a": rng.normal(size=(37, 5)).astype(np.float32)}
    flat = list(chunked_epochs(arrays, batch_size=8, n_epochs=2, seed=7))
    chunks = list(macro_chunks(arrays, batch_size=8, n_epochs=2,
                               chunk_steps=3, seed=7))
    # 5 steps/epoch (37 -> 4 full + 1 alignData-padded tail batch)
    # -> chunks of 3 and 2 per epoch
    assert [c["a"].shape[0] for c in chunks] == [3, 2, 3, 2]
    stacked = np.concatenate([c["a"] for c in chunks], axis=0)
    np.testing.assert_array_equal(
        stacked, np.stack([b["a"] for b in flat], axis=0)
    )


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "params": {"dense": {"kernel": np.ones((4, 3), np.float32)}},
        "step": np.int32(7),
    }
    p = str(tmp_path / "ck.ckpt")
    save_checkpoint(p, tree, config={"lr": 0.01})
    restored, exact = load_checkpoint(p, tree, config={"lr": 0.01})
    assert exact
    np.testing.assert_array_equal(
        restored["params"]["dense"]["kernel"], tree["params"]["dense"]["kernel"]
    )


def test_checkpoint_config_diff(tmp_path, capsys):
    tree = {"w": np.zeros(3, np.float32)}
    p = str(tmp_path / "ck.ckpt")
    save_checkpoint(p, tree, config={"lr": 0.01})
    _, exact = load_checkpoint(p, tree, config={"lr": 0.02})
    assert not exact
    out = capsys.readouterr().out
    assert "mismatch" in out and "0.01" in out and "0.02" in out
    with pytest.raises(ValueError):
        load_checkpoint(p, tree, config={"lr": 0.02}, strict=True)


def test_checkpoint_shape_recovery(tmp_path):
    """Structural mismatch falls back to name/shape grafting
    (netbase.py:451-476 semantics)."""
    stored = {"layers": {"0": {"kernel": np.full((4, 3), 7.0, np.float32)}}}
    p = str(tmp_path / "ck.ckpt")
    save_checkpoint(p, stored)
    target = {
        "blocks": {"first": {"kernel": np.zeros((4, 3), np.float32)},
                   "second": {"kernel": np.zeros((2, 2), np.float32)}}
    }
    restored, exact = load_checkpoint(p, target)
    assert not exact
    np.testing.assert_array_equal(
        restored["blocks"]["first"]["kernel"], 7.0 * np.ones((4, 3))
    )
    np.testing.assert_array_equal(
        restored["blocks"]["second"]["kernel"], np.zeros((2, 2))
    )


def test_checkpoint_keys_is_lazy(tmp_path, monkeypatch):
    """checkpoint_keys reads only the top-level map header + key strings
    (seeking past the parameter blobs) — a full msgpack_restore would
    double resume I/O and peak host memory (ADVICE r3)."""
    from deepprior_tpu.train import checkpoint as ckpt_mod
    from deepprior_tpu.train.checkpoint import checkpoint_keys

    tree = {
        "params": {"dense": {"kernel": np.ones((64, 32), np.float32),
                             "bias": np.zeros(32, np.float32)}},
        "opt_state": [{"mu": np.ones(5, np.float32)}],
        "step": np.int32(7),
        "epoch": 3,
        "best": {"val": 1.5, "params": {"k": np.ones(4, np.float32)}},
    }
    p = str(tmp_path / "ck.ckpt")
    save_checkpoint(p, tree)

    def boom(*a, **k):
        raise AssertionError("checkpoint_keys fell back to a full decode")

    monkeypatch.setattr(ckpt_mod.serialization, "msgpack_restore", boom)
    assert checkpoint_keys(p) == {
        "params", "opt_state", "step", "epoch", "best"
    }


def test_checkpoint_recovery_prefers_matching_subtree(tmp_path):
    """With the persisted best tracker, 'params/.../kernel' and
    'best/params/.../kernel' score identical suffixes; recovery must pick
    the same-subtree leaf, not the stale best duplicate (ADVICE r3)."""
    a = np.full((4, 3), 1.0, np.float32)
    b = np.full((4, 3), 2.0, np.float32)
    stored = {
        "params": {"dense": {"kernel": a}},
        "best": {"params": {"dense": {"kernel": b}}},
    }
    p = str(tmp_path / "ck.ckpt")
    save_checkpoint(p, stored)
    target = {
        "params": {"dense": {"kernel": np.zeros((4, 3), np.float32)}},
        "best": {"params": {"dense": {"kernel": np.zeros((4, 3), np.float32)}}},
        "new_field": np.zeros(1, np.float32),  # forces the fallback
    }
    restored, exact = load_checkpoint(p, target)
    assert not exact
    np.testing.assert_array_equal(restored["params"]["dense"]["kernel"], a)
    np.testing.assert_array_equal(
        restored["best"]["params"]["dense"]["kernel"], b
    )


def test_evaluate_trims_padding(toy_setup):
    """With n % batch_size != 0, evaluate() must equal a straight
    full-array computation — padded tail duplicates trimmed, batch means
    weighted by real counts (reference netbase.py:290-307 trims padding).
    Regression for the round-1 bias."""
    cam, data, _ = toy_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    cfg = TrainConfig(batch_size=16, n_epochs=1, aug_modes=None)
    trainer = Trainer(model, cfg, cam, prior=None)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    # 19 samples -> batches of 16 + 3: the padded path must not bias
    sub = TrainData(*(np.asarray(a)[:19] for a in data))
    obs = trainer.evaluate(state, sub)

    # straight full-array computation (no batching, no padding)
    out = trainer.predict(state, sub.crops, batch_size=16)  # (19, 42)
    gt3d = np.asarray(sub.gt3d_crop)
    cube_z = np.asarray(sub.cube)[:, 2]
    y = gt3d / (cube_z[:, None, None] / 2.0)
    out3 = out.reshape(y.shape)
    cost = np.mean(np.sum((out3 - y) ** 2, axis=2).mean(axis=1))
    err = np.mean(np.sqrt(np.sum((out3 - y) ** 2, axis=2)))
    dist = np.sqrt(
        np.sum((out3 * (cube_z[:, None, None] / 2.0) - gt3d) ** 2, axis=2)
    )
    assert obs["cost"] == pytest.approx(cost, rel=1e-5)
    assert obs["error_norm"] == pytest.approx(err, rel=1e-5)
    assert obs["error_mm_avg"] == pytest.approx(dist.mean(), rel=1e-5)
    assert obs["error_mm_max"] == pytest.approx(dist.max(), rel=1e-5)


@pytest.mark.slow
def test_early_stopping_restores_batch_stats(toy_setup):
    """Early stopping must restore the BEST epoch's batch_stats together
    with its params: for BatchNorm models the validated network is the
    (params, running stats) pair (round-1 advisor finding)."""
    from deepprior_tpu.models import ResNet, ResNetConfig

    cam, data, _ = toy_setup
    model = ResNet(ResNetConfig(num_joints=14, n_dims=3, depth=11,
                                stages=(4, 4, 4, 4, 4), hidden=32))
    cfg = TrainConfig(batch_size=16, learning_rate=0.001, n_epochs=4,
                      aug_modes=None, eval_every=1)
    trainer = Trainer(model, cfg, cam, prior=None)
    state = trainer.init_state(np.asarray(data.crops[:16]))

    # force a known best epoch (1) via a scripted validation metric
    scripted = iter([5.0, 1.0, 3.0, 4.0])
    real_eval = trainer.evaluate
    trainer.evaluate = lambda st, vd: {
        "cost": 0.0, "error_norm": 0.0,
        "error_mm_avg": next(scripted), "error_mm_max": 0.0,
    }
    captured = {}

    def on_end(epoch, st, costs):
        if epoch == 1:
            captured["params"] = jax.device_get(st.params)
            captured["batch_stats"] = jax.device_get(st.batch_stats)

    state, _ = trainer.fit(
        state, data, val_data=data, log=lambda m: None, on_epoch_end=on_end
    )
    trainer.evaluate = real_eval
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(captured["params"])[0],
        jax.tree_util.tree_flatten_with_path(jax.device_get(state.params))[0],
    ):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(captured["batch_stats"])[0],
        jax.tree_util.tree_flatten_with_path(jax.device_get(state.batch_stats))[0],
    ):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))


@pytest.mark.slow
def test_fit_streamed_first_class(toy_setup, tmp_path):
    """fit_streamed must carry the same observer surface as fit:
    validation history, early stopping, snapshots (reference para_load
    training still ran full validation, nettrainer.py:859-889)."""
    cam, data, prior = toy_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, learning_rate=0.003, n_epochs=3,
                      aug_modes=None, eval_every=1, snapshot_every=1)
    trainer = Trainer(model, cfg, cam, prior=prior)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    arrays = {
        "crops": np.asarray(data.crops),
        "gt3d_crop": np.asarray(data.gt3d_crop),
        "com": np.asarray(data.com),
        "cube": np.asarray(data.cube),
        "m": np.asarray(data.m),
    }
    snap = str(tmp_path / "streamed")
    state, hist = trainer.fit_streamed(
        state, arrays, val_data=data, snapshot_path=snap, log=lambda m: None
    )
    assert set(hist.keys()) == {"train_cost", "val_error_mm"}
    assert len(hist["val_error_mm"]) == 3
    assert np.isfinite(np.asarray(hist["train_cost"])).all()
    assert os.path.exists(f"{snap}_last.ckpt")


def test_nan_guard(toy_setup):
    cam, data, prior = toy_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, learning_rate=1e6, n_epochs=3, aug_modes=None)
    trainer = Trainer(model, cfg, cam, prior=prior)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    with pytest.raises(FloatingPointError):
        trainer.fit(state, data, log=lambda m: None)


def test_l2_penalty_excludes_batchnorm():
    """Weight decay covers conv/hidden kernels only — the reference's BN
    layers contribute no decay weights (batchnormlayer.py:146), and
    decaying BN gamma destabilizes training."""
    import jax.numpy as jnp

    from deepprior_tpu.train.trainer import _l2_penalty

    params = {
        "Conv_0": {"kernel": jnp.full((2, 2), 2.0), "bias": jnp.ones(2)},
        "BatchNorm_0": {"scale": jnp.full((4,), 3.0), "bias": jnp.ones(4)},
        "Dense_0": {"kernel": jnp.full((3,), 1.0), "bias": jnp.ones(3)},
    }
    # 4 * 2^2 (conv) + 3 * 1^2 (dense); no bias, no BN gamma
    assert float(_l2_penalty(params)) == 16.0 + 3.0
