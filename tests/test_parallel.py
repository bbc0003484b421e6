"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# multi-device mesh / convergence tests: full runs are the round
# gate; the fast dev loop deselects with -m 'not slow'
pytestmark = pytest.mark.slow
from jax.sharding import PartitionSpec as P

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.parallel import DistributedTrainer, make_mesh, param_shardings
from deepprior_tpu.prior import fit_pose_prior
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh(dp=4, tp=2)
    assert m.shape == {"dp": 4, "tp": 2}
    m = make_mesh(tp=2)
    assert m.shape == {"dp": 4, "tp": 2}
    m = make_mesh(n_devices=4, tp=1)
    assert m.shape == {"dp": 4, "tp": 1}
    m = make_mesh(sp=2, tp=2)
    assert m.shape == {"dp": 2, "sp": 2, "tp": 2}
    m = make_mesh(sp=2, tp=1)
    assert m.shape == {"dp": 4, "sp": 2, "tp": 1}


def test_param_shardings_megatron_pattern():
    mesh = make_mesh(dp=4, tp=2)
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    vars_ = model.init(jax.random.key(0), jnp.zeros((2, 128, 128, 1)))
    sh = param_shardings(vars_["params"], mesh)
    head = sh["MLPHead_0"]
    assert head["Dense_0"]["kernel"].spec == P(None, "tp")  # column
    assert head["Dense_0"]["bias"].spec == P("tp")
    assert head["Dense_1"]["kernel"].spec == P("tp", None)  # row
    assert head["Dense_1"]["bias"].spec == P()
    # conv kernels replicated
    conv = sh["ConvPool_0"]["Conv_0"]["kernel"]
    assert conv.spec == P()


@pytest.fixture(scope="module")
def dist_setup():
    cam = NYU_CAMERA
    seq = make_sequence(cam, 48, num_joints=14, seed=9)
    data = TrainData.from_sequence(seq)
    rng = np.random.default_rng(23455)
    prior = fit_pose_prior(
        cam, rng, data.gt3d_crop, data.com, data.cube, 30, num_poses=3000
    )
    return cam, data, prior


def test_distributed_training_step(dist_setup):
    """Full dp=4 x tp=2 sharded train epoch executes and stays finite."""
    cam, data, prior = dist_setup
    mesh = make_mesh(dp=4, tp=2)
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, learning_rate=0.003, n_epochs=2,
                      aug_modes=("com", "rot", "none"))
    trainer = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    # params actually sharded over tp
    k = state.params["MLPHead_0"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "tp")
    data_p = trainer.place_data(data)
    state, hist = trainer.fit(state, data_p, log=lambda m: None)
    assert np.isfinite(np.asarray(hist["train_cost"])).all()


def test_dp_matches_single_device_loss(dist_setup):
    """Data-parallel training must be numerically equivalent to single
    device (same RNG, same batches) modulo float reduction order."""
    cam, data, prior = dist_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, learning_rate=0.003, n_epochs=2, aug_modes=None)

    t1 = Trainer(model, cfg, cam, prior=prior)
    s1 = t1.init_state(np.asarray(data.crops[:16]))
    s1, h1 = t1.fit(s1, data, log=lambda m: None)

    mesh = make_mesh(dp=8, tp=1)
    t2 = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    s2, h2 = t2.fit(s2, t2.place_data(data), log=lambda m: None)

    np.testing.assert_allclose(
        np.asarray(h1["train_cost"]), np.asarray(h2["train_cost"]), rtol=1e-3
    )


def test_sp_matches_single_device_loss(dist_setup):
    """Spatial partitioning (crop H sharded over 'sp', GSPMD halo
    exchanges around the convs/pools) must train numerically equivalent
    to single device modulo float reduction order."""
    cam, data, prior = dist_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, learning_rate=0.003, n_epochs=2, aug_modes=None)

    t1 = Trainer(model, cfg, cam, prior=prior)
    s1 = t1.init_state(np.asarray(data.crops[:16]))
    s1, h1 = t1.fit(s1, data, log=lambda m: None)

    mesh = make_mesh(dp=2, sp=2, tp=2)
    t2 = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    # the constrain rule spatially shards only the crop images
    con = t2.shard_batch(jnp.zeros((16, 128, 128)))
    assert con.sharding.spec == P("dp", "sp", None)
    con = t2.shard_batch(jnp.zeros((16, 14, 3)))  # labels: batch-only
    assert con.sharding.spec == P("dp", None, None)
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    s2, h2 = t2.fit(s2, t2.place_data(data), log=lambda m: None)

    np.testing.assert_allclose(
        np.asarray(h1["train_cost"]), np.asarray(h2["train_cost"]), rtol=1e-3
    )


def test_sp_augmented_epoch_finite(dist_setup):
    """dp2 x sp2 x tp2 with the full on-device augmentation in the step:
    the warp/threshold math partitions over the spatially-sharded crops
    and the epoch stays finite."""
    cam, data, prior = dist_setup
    mesh = make_mesh(dp=2, sp=2, tp=2)
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, learning_rate=0.003, n_epochs=2,
                      aug_modes=("com", "rot", "none"))
    trainer = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    state, hist = trainer.fit(state, trainer.place_data(data), log=lambda m: None)
    assert np.isfinite(np.asarray(hist["train_cost"])).all()


def test_sharded_data_matches_replicated_loss(dist_setup):
    """place_data(shard=True) splits the N axis over dp (dataset capacity
    scales with chips) while the global-index gather keeps the computed
    batches — and hence the loss trace — identical to the replicated run."""
    cam, data, prior = dist_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, learning_rate=0.003, n_epochs=2, aug_modes=None)
    mesh = make_mesh(dp=8, tp=1)

    t1 = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    s1 = t1.init_state(np.asarray(data.crops[:16]))
    d_rep = t1.place_data(data, shard=False)
    s1, h1 = t1.fit(s1, d_rep, log=lambda m: None)

    t2 = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    d_sh = t2.place_data(data, shard=True)
    # the source arrays really are sharded over dp on the N axis
    assert d_sh.crops.sharding.spec == P("dp", None, None)
    assert d_sh.crops.addressable_shards[0].data.shape[0] == data.n // 8
    s2, h2 = t2.fit(s2, d_sh, log=lambda m: None)

    np.testing.assert_allclose(
        np.asarray(h1["train_cost"]), np.asarray(h2["train_cost"]), rtol=1e-4
    )


def test_sharded_data_pads_with_wraparound(dist_setup):
    """N not divisible by dp: wrap-around repeat padding (alignData
    semantics, nettrainer.py:365-413)."""
    cam, data, prior = dist_setup
    mesh = make_mesh(dp=8, tp=1)
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=8, n_epochs=1, aug_modes=None)
    trainer = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    sub = TrainData(*(np.asarray(a)[:43] for a in data))  # 43 % 8 = 3
    placed = trainer.place_data(sub, shard=True)
    assert placed.crops.shape[0] == 48
    np.testing.assert_array_equal(
        np.asarray(placed.crops[43:]), np.asarray(sub.crops[:5])
    )
    state = trainer.init_state(np.asarray(data.crops[:8]))
    state, hist = trainer.fit(state, placed, log=lambda m: None)
    assert np.isfinite(np.asarray(hist["train_cost"])).all()


def test_distributed_eval(dist_setup):
    cam, data, prior = dist_setup
    mesh = make_mesh(dp=4, tp=2)
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, n_epochs=1, aug_modes=None)
    trainer = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    obs = trainer.evaluate(state, data)
    assert np.isfinite(obs["error_mm_avg"])


def test_distributed_resnet_batchnorm(dist_setup):
    """BatchNorm trains under a dp-sharded batch: with jit+GSPMD the batch
    mean is a global reduction over the sharded axis (psum inserted by the
    compiler), so no explicit cross-replica stat sync is needed."""
    from deepprior_tpu.models import ResNet, ResNetConfig

    cam, data, prior = dist_setup
    mesh = make_mesh(dp=4, tp=2)
    model = ResNet(ResNetConfig(num_joints=1, n_dims=30, depth=11,
                                stages=(8, 16, 16, 16, 16)))
    cfg = TrainConfig(batch_size=16, learning_rate=0.001, n_epochs=1,
                      aug_modes=None, model_has_dropout=False)
    trainer = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    state = trainer.init_state(np.asarray(data.crops[:16]))
    before = jax.tree.leaves(jax.device_get(state.batch_stats))
    state, hist = trainer.fit(state, trainer.place_data(data), log=lambda m: None)
    after = jax.tree.leaves(jax.device_get(state.batch_stats))
    assert np.isfinite(np.asarray(hist["train_cost"])).all()
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_dcn_mesh_matches_single_device_loss(dist_setup):
    """Multi-slice ('dcn','dp','tp') mesh: batch shards over dcn+dp jointly,
    tp stays within a slice; the loss trace equals single-device training
    (same RNG/batches) modulo float reduction order."""
    cam, data, prior = dist_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, learning_rate=0.003, n_epochs=2,
                      aug_modes=None)

    t1 = Trainer(model, cfg, cam, prior=prior)
    s1 = t1.init_state(np.asarray(data.crops[:16]))
    s1, h1 = t1.fit(s1, data, log=lambda m: None)

    mesh = make_mesh(slices=2, dp=2, tp=2)
    assert mesh.axis_names == ("dcn", "dp", "tp")
    t2 = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    s2 = t2.init_state(np.asarray(data.crops[:16]))
    d = t2.place_data(data, shard=True)
    assert d.crops.sharding.spec == P(("dcn", "dp"), None, None)
    k = s2.params["MLPHead_0"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "tp")
    s2, h2 = t2.fit(s2, d, log=lambda m: None)

    np.testing.assert_allclose(
        np.asarray(h1["train_cost"]), np.asarray(h2["train_cost"]), rtol=1e-3
    )


def test_distributed_fit_streamed(dist_setup):
    """Streamed (>HBM) training under the mesh: batches stage pre-sharded
    over the data axes; the loss trace equals the single-device streamed
    run (same chunked_epochs seed -> same batches)."""
    cam, data, prior = dist_setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    cfg = TrainConfig(batch_size=16, learning_rate=0.003, n_epochs=2,
                      aug_modes=None)
    arrays = {
        "crops": np.asarray(data.crops),
        "gt3d_crop": np.asarray(data.gt3d_crop),
        "com": np.asarray(data.com),
        "cube": np.asarray(data.cube),
        "m": np.asarray(data.m),
    }

    t1 = Trainer(model, cfg, cam, prior=prior)
    s1 = t1.init_state(arrays["crops"][:16])
    s1, h1 = t1.fit_streamed(s1, arrays, log=lambda m: None)

    mesh = make_mesh(dp=4, tp=2)
    t2 = DistributedTrainer(model, cfg, cam, mesh, prior=prior)
    s2 = t2.init_state(arrays["crops"][:16])
    s2, h2 = t2.fit_streamed(s2, arrays, val_data=data, log=lambda m: None)

    np.testing.assert_allclose(
        np.asarray(h1["train_cost"]), np.asarray(h2["train_cost"]), rtol=1e-3
    )
    assert len(h2["val_error_mm"]) == 2


def test_sharded_estimator_matches_single_device():
    """ShardedEstimator (dp x tp GSPMD serving) returns the same joints as
    the single-device FusedEstimator on the 8-device mesh."""
    import jax
    import jax.numpy as jnp

    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.data.synthetic import make_frame
    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.parallel import ShardedEstimator, make_mesh
    from deepprior_tpu.prior import PCAPrior
    from deepprior_tpu.realtime.fused import FusedEstimator

    rng = np.random.default_rng(11)
    cam = NYU_CAMERA
    frames = [make_frame(cam, rng) for _ in range(8)]
    depth = jnp.asarray(
        np.stack([f.extraData["dpt_full"] for f in frames])
    )
    com = jnp.asarray(np.stack([f.com for f in frames]))

    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    prior = PCAPrior(
        components=rng.standard_normal((30, 42)).astype(np.float32) * 0.05,
        mean=np.zeros(42, np.float32),
    )
    est = FusedEstimator(model, cam, prior=prior, crop_method="onehot")
    ref_joints, ref_com3d, ref_crops = est(variables, depth, com)

    mesh = make_mesh(tp=2)  # dp=4 x tp=2 on the simulated 8 devices
    sharded = ShardedEstimator(est, mesh, variables)
    joints, com3d, crops = sharded(depth, com)

    np.testing.assert_array_equal(np.asarray(crops), np.asarray(ref_crops))
    np.testing.assert_allclose(
        np.asarray(joints), np.asarray(ref_joints), rtol=1e-5, atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(com3d), np.asarray(ref_com3d))

    # replicated-params variant (dp-only mesh)
    mesh_dp = make_mesh(tp=1)
    sharded_dp = ShardedEstimator(est, mesh_dp, variables, tp_params=False)
    joints_dp, _, _ = sharded_dp(depth, com)
    np.testing.assert_allclose(
        np.asarray(joints_dp), np.asarray(ref_joints), rtol=1e-5, atol=1e-3
    )


def test_sharded_estimator_pallas_shard_map():
    """The dp-only path routes through shard_map with the Pallas crop
    kernel intact: tracing must succeed with per-shard batch shapes (full
    interpret-mode execution is minutes-slow on CPU; the kernel itself is
    covered by tests/test_pallas_crop.py and BENCH_CHECK on device)."""
    import jax
    import jax.numpy as jnp

    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.parallel import ShardedEstimator, make_mesh
    from deepprior_tpu.realtime.fused import FusedEstimator

    cam = NYU_CAMERA
    model = PoseRegNet(PoseRegNetConfig(num_joints=2, n_dims=3,
                                        dropout=False))
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 128, 128, 1))
    )
    est = FusedEstimator(model, cam, crop_method="pallas")
    mesh = make_mesh(tp=1)
    sharded = ShardedEstimator(est, mesh, variables, tp_params=False)
    out = jax.eval_shape(
        sharded._fn,
        sharded.variables,
        jax.ShapeDtypeStruct((8, 480, 640), jnp.float32),
        jax.ShapeDtypeStruct((8, 3), jnp.float32),
    )
    assert out[0].shape == (8, 2, 3)
    assert out[2].shape == (8, 128, 128)


def test_stream_put_shards_batch_axis(dist_setup):
    """stream_put (the per-batch staging companion of chunked_epochs)
    splits axis 0 over the data axes so the step's sharding constraint is
    a no-op; stream_put_chunk shards axis 1 (batch) and leaves the scan
    axis whole."""
    from jax.sharding import PartitionSpec as P

    cam, data, prior = dist_setup
    cfg = TrainConfig(batch_size=8, n_epochs=1, aug_modes=None)
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    trainer = DistributedTrainer(model, cfg, cam, make_mesh(dp=4, tp=2),
                                 prior=prior)
    batch = {"crops": np.zeros((8, 16, 16), np.float32),
             "com": np.zeros((8, 3), np.float32)}
    out = trainer.stream_put(batch)
    assert out["crops"].sharding.spec == P(trainer._batch_axes, None, None)
    assert out["com"].sharding.spec == P(trainer._batch_axes, None)
    chunk = {"crops": np.zeros((2, 8, 16, 16), np.float32)}
    outc = trainer.stream_put_chunk(chunk)
    assert outc["crops"].sharding.spec == P(
        None, trainer._batch_axes, None, None
    )


def test_sharded_estimator_requires_com_without_detect():
    """com=None is only recoverable by a detecting pipeline; a silent
    zeros CoM would crop empty space and return garbage joints."""
    import pytest as _pytest

    from deepprior_tpu.camera import NYU_CAMERA as cam
    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.parallel import make_mesh
    from deepprior_tpu.parallel.serve import ShardedEstimator
    from deepprior_tpu.realtime.fused import FusedEstimator

    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=6,
                                        dropout=False))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    est = FusedEstimator(model, cam, crop_method="onehot")
    sharded = ShardedEstimator(est, make_mesh(tp=1), variables,
                               tp_params=False)
    with _pytest.raises(ValueError, match="detect=True"):
        sharded(np.zeros((8, 480, 640), np.float32))
