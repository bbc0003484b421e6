"""Model zoo shape/behavior tests (reference architectures §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepprior_tpu.models import (
    PoseRegNet,
    PoseRegNetConfig,
    ResNet,
    ResNetConfig,
    ScaleNet,
    ScaleNetConfig,
)
from deepprior_tpu.models.scalenet import multiscale_center_crops


def _count_params(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


def test_poseregnet_shapes():
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))  # flagship
    x = jnp.zeros((2, 128, 128, 1))
    vars_ = model.init(jax.random.key(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (2, 30)
    # trunk flatten is 8*11*11=968 (reference shape math, poseregnet.py:80)
    fc1 = vars_["params"]["MLPHead_0"]["Dense_0"]["kernel"]
    assert fc1.shape == (968, 1024)


def test_poseregnet_type11_bottleneck():
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3, embedding=30))
    x = jnp.zeros((2, 128, 128, 1))
    vars_ = model.init(jax.random.key(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (2, 42)
    head = vars_["params"]["MLPHead_0"]
    assert head["Dense_2"]["kernel"].shape == (1024, 30)
    assert head["Dense_3"]["kernel"].shape == (30, 42)


def test_poseregnet_dropout_deterministic():
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    x = jnp.ones((2, 128, 128, 1))
    vars_ = model.init(jax.random.key(0), x)
    o1 = model.apply(vars_, x, train=False)
    o2 = model.apply(vars_, x, train=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = model.apply(vars_, x, train=True, rngs={"dropout": jax.random.key(1)})
    o4 = model.apply(vars_, x, train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(o3), np.asarray(o4))


def test_scalenet_center_crops():
    x = jnp.arange(2 * 128 * 128, dtype=jnp.float32).reshape(2, 128, 128, 1)
    xs = multiscale_center_crops(x)
    assert xs[0].shape == (2, 128, 128, 1)
    assert xs[1].shape == (2, 64, 64, 1)
    assert xs[2].shape == (2, 32, 32, 1)
    # /2 crop is the center region, not a resize
    np.testing.assert_array_equal(
        np.asarray(xs[1][0, 0, 0, 0]), np.asarray(x[0, 32, 32, 0])
    )


def test_scalenet_shapes():
    model = ScaleNet(ScaleNetConfig(num_joints=1, n_dims=3))
    x = jnp.zeros((2, 128, 128, 1))
    vars_ = model.init(jax.random.key(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (2, 3)
    # concat feature width: 968 + 968 + 512 = 2448 (scalenet.py:107-111)
    fc1 = vars_["params"]["MLPHead_0"]["Dense_0"]["kernel"]
    assert fc1.shape == (2448, 1024)


def test_scalenet_explicit_inputs():
    model = ScaleNet(ScaleNetConfig())
    xs = [
        jnp.zeros((2, 128, 128, 1)),
        jnp.zeros((2, 64, 64, 1)),
        jnp.zeros((2, 32, 32, 1)),
    ]
    vars_ = model.init(jax.random.key(0), xs)
    assert model.apply(vars_, xs).shape == (2, 3)


@pytest.mark.parametrize("rtype", [0, 1, 4])
@pytest.mark.slow
def test_resnet_types(rtype):
    cfg = ResNetConfig.from_reference_type(rtype, num_joints=14)
    model = ResNet(cfg)
    x = jnp.zeros((2, 128, 128, 1))
    vars_ = model.init(jax.random.key(0), x)
    out, _ = model.apply(
        vars_, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(0)},
    )
    assert out.shape == (2, 42)
    assert (cfg.embedding == 30) == (rtype in (1, 4))


def test_resnet_spatial_quirk():
    """Stage 4 must NOT downsample (reference identity-path stride quirk):
    flatten size is 8*8*256 = 16384 for 128x128 inputs."""
    model = ResNet(ResNetConfig())
    x = jnp.zeros((1, 128, 128, 1))
    vars_ = model.init(jax.random.key(0), x)
    fc1 = vars_["params"]["Dense_0"]["kernel"]
    assert fc1.shape == (8 * 8 * 256, 1024)


def test_resnet_batchnorm_updates():
    model = ResNet(ResNetConfig())
    x = jax.random.normal(jax.random.key(1), (2, 128, 128, 1))
    vars_ = model.init(jax.random.key(0), x)
    _, updates = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(vars_["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )


def test_bfloat16_compute():
    model = PoseRegNet(
        PoseRegNetConfig(num_joints=1, n_dims=30, dtype=jnp.bfloat16)
    )
    x = jnp.ones((2, 128, 128, 1))
    vars_ = model.init(jax.random.key(0), x)
    out = model.apply(vars_, x)
    assert out.dtype == jnp.float32  # output upcast for stable losses
    assert np.isfinite(np.asarray(out)).all()


def test_scalenet_shared_conv():
    """Shared conv kernels across scales with per-scale pooling (the
    reference's shared_conv option, scalenet.py:179-180)."""
    model = ScaleNet(ScaleNetConfig(num_joints=1, n_dims=3, shared_conv=True))
    x = jnp.zeros((2, 128, 128, 1))
    vars_ = model.init(jax.random.key(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (2, 3)
    # exactly 3 shared conv kernels exist (not 9)
    towers = vars_["params"]["_SharedConvTowers_0"]
    assert sorted(towers.keys()) == [
        "shared_conv_0", "shared_conv_1", "shared_conv_2"
    ]


def test_resnet_types_2_3():
    for rtype in (2, 3):
        cfg = ResNetConfig.from_reference_type(rtype, num_joints=14)
        assert cfg.dropout and cfg.embedding is None


def test_pool2d_kinds():
    from deepprior_tpu.models.layers import pool2d

    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    mx = np.asarray(pool2d(x, (2, 2), "max"))[0, :, :, 0]
    np.testing.assert_array_equal(mx, [[5, 7], [13, 15]])
    av = np.asarray(pool2d(x, (2, 2), "avg"))[0, :, :, 0]
    np.testing.assert_array_equal(av, [[2.5, 4.5], [10.5, 12.5]])
    ss = np.asarray(pool2d(x, (2, 2), "subsample"))[0, :, :, 0]
    np.testing.assert_array_equal(ss, [[0, 2], [8, 10]])
    np.testing.assert_array_equal(np.asarray(pool2d(x, (2, 2), "none")),
                                  np.asarray(x))


def test_orthogonal_init():
    from deepprior_tpu.models.layers import orthogonal_init

    w = orthogonal_init(jax.random.key(0), (64, 64), jnp.float32)
    np.testing.assert_allclose(np.asarray(w.T @ w), np.eye(64), atol=1e-4)


def test_learned_param_activation():
    """2-arg activations get a trainable per-unit `c` (init 0.5) in each
    hidden layer — reference hiddenlayer.py:40-169 / nonlinearitylayer.py:
    112-117."""
    from deepprior_tpu.models.layers import prelu, takes_learned_param

    assert takes_learned_param(prelu)
    assert not takes_learned_param(jax.nn.relu)
    assert not takes_learned_param(None)

    cfg = PoseRegNetConfig(num_joints=2, n_dims=3, activation=prelu,
                           dropout=False)
    model = PoseRegNet(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 128, 128, 1)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    head = variables["params"]["MLPHead_0"]
    assert head["c0"].shape == (1024,) and head["c1"].shape == (1024,)
    np.testing.assert_allclose(np.asarray(head["c0"]), 0.5)

    # c0=0.5 init makes the activation leaky-relu(0.5); gradient must flow
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 6)

    def loss(params):
        return jnp.sum(model.apply({"params": params}, x, train=False) ** 2)

    grads = jax.grad(loss)(variables["params"])
    assert float(jnp.abs(grads["MLPHead_0"]["c0"]).max()) > 0.0

    # the default relu config keeps the parameter tree unchanged (no c)
    plain = PoseRegNet(PoseRegNetConfig(num_joints=2, n_dims=3,
                                        dropout=False))
    pv = plain.init(jax.random.key(0), x, train=False)
    assert "c0" not in pv["params"]["MLPHead_0"]


@pytest.mark.slow
def test_packed_convpool_equivalence():
    """packed=True is the same layer: identical parameter tree, outputs
    equal to the plain conv->pool path up to f.p. summation order
    (layers._PackedConvPool docstring)."""
    import jax

    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 128, 128, 1)).astype(np.float32))

    plain = PoseRegNet(PoseRegNetConfig(num_joints=2, n_dims=3, dropout=False))
    packed = PoseRegNet(
        PoseRegNetConfig(num_joints=2, n_dims=3, dropout=False,
                         packed_conv=True)
    )
    variables = plain.init(jax.random.key(0), x, train=False)
    pv = packed.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(pv)
    assert [tuple(l.shape) for l in jax.tree.leaves(variables)] == [
        tuple(l.shape) for l in jax.tree.leaves(pv)
    ]

    # SAME weights through both paths
    out_plain = plain.apply(variables, x, train=False)
    out_packed = packed.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_packed), rtol=1e-4, atol=1e-4
    )

    # gradient flows through the packed kernel embedding
    def loss(params):
        return jnp.sum(packed.apply({"params": params}, x, train=False) ** 2)

    grads = jax.grad(loss)(variables["params"])
    g0 = grads["ConvPool_0"]["Conv_0"]["kernel"]
    assert float(jnp.abs(g0).max()) > 0.0


def test_packed_convpool_scalenet():
    """ScaleNet towers honor packed_conv with the same parameter tree."""
    import jax

    from deepprior_tpu.models import ScaleNet, ScaleNetConfig

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 1)).astype(np.float32))
    plain = ScaleNet(ScaleNetConfig(dropout=False))
    packed = ScaleNet(ScaleNetConfig(dropout=False, packed_conv=True))
    variables = plain.init(jax.random.key(0), x, train=False)
    pv = packed.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(pv)
    np.testing.assert_allclose(
        np.asarray(plain.apply(variables, x, train=False)),
        np.asarray(packed.apply(variables, x, train=False)),
        rtol=1e-4,
        atol=1e-4,
    )


def test_packed_convpool_scalenet_shared():
    """shared_conv + packed_conv compose: the shared kernels are packed
    per-scale at apply time, the parameter tree is unchanged, and outputs
    match the plain shared path with the same weights."""
    import jax

    from deepprior_tpu.models import ScaleNet, ScaleNetConfig

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 1)).astype(np.float32))
    plain = ScaleNet(ScaleNetConfig(dropout=False, shared_conv=True))
    packed = ScaleNet(
        ScaleNetConfig(dropout=False, shared_conv=True, packed_conv=True)
    )
    variables = plain.init(jax.random.key(0), x, train=False)
    pv = packed.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(pv)
    assert [tuple(l.shape) for l in jax.tree.leaves(variables)] == [
        tuple(l.shape) for l in jax.tree.leaves(pv)
    ]
    np.testing.assert_allclose(
        np.asarray(plain.apply(variables, x, train=False)),
        np.asarray(packed.apply(variables, x, train=False)),
        rtol=1e-4,
        atol=1e-4,
    )


def test_packed_convpool_resnet_stem():
    """ResNet's packed stem (explicit SAME pad + fused conv/pool) matches
    the plain stem with the same parameter tree."""
    import jax

    from deepprior_tpu.models import ResNet, ResNetConfig

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 1)).astype(np.float32))
    plain = ResNet(ResNetConfig(num_joints=2, n_dims=3))
    packed = ResNet(ResNetConfig(num_joints=2, n_dims=3, packed_conv=True))
    variables = plain.init(jax.random.key(0), x, train=False)
    pv = packed.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(pv)
    np.testing.assert_allclose(
        np.asarray(plain.apply(variables, x, train=False)),
        np.asarray(packed.apply(variables, x, train=False)),
        rtol=1e-4,
        atol=1e-4,
    )
