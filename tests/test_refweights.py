"""Reference pickle weight import (utils/refweights.py)."""

import gzip
import pickle

import pytest

import jax
import numpy as np

from deepprior_tpu.models import (
    PoseRegNet,
    PoseRegNetConfig,
    ScaleNet,
    ScaleNetConfig,
)
from deepprior_tpu.utils.refweights import (
    load_reference_pickle,
    poseregnet_params_from_reference,
    reference_pickle_from_params,
    scalenet_params_from_reference,
)


@pytest.mark.slow
def test_poseregnet_roundtrip(tmp_path):
    """flax -> reference pickle layout -> flax preserves every weight and
    the network function (incl. the conv flip and NCHW/NHWC flatten
    permutation being mutual inverses)."""
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    variables = model.init(jax.random.key(0), np.zeros((1, 128, 128, 1)))

    state = reference_pickle_from_params(variables)
    # write like netbase.py:417 (gzip, protocol 2 = the py2-era format)
    path = str(tmp_path / "net.pkl.gz")
    with gzip.open(path, "wb") as fh:
        pickle.dump(state, fh, 2)

    layers = load_reference_pickle(path)
    assert layers[4] == [] and layers[6] == []  # dropout layers: no params
    restored = poseregnet_params_from_reference(layers)

    flat0 = jax.tree.leaves(variables["params"])
    flat1 = jax.tree.leaves(restored["params"])
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = np.random.default_rng(1).standard_normal((2, 128, 128, 1)).astype(
        np.float32
    )
    y0 = model.apply(variables, x, train=False)
    y1 = model.apply(restored, x, train=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_scalenet_import_structure():
    """A reference-layout ScaleNet dict (9 tower convs + FC head with
    dropout gaps) maps onto the flax tree with matching shapes and a
    working forward pass."""
    model = ScaleNet(ScaleNetConfig(num_joints=1, n_dims=3))
    variables = model.init(jax.random.key(0), np.zeros((1, 128, 128, 1)))
    p = variables["params"]

    layers = {}
    num = 0
    for t in range(3):
        for j in range(3):
            kern = np.asarray(p[f"_Tower_{t}"][f"ConvPool_{j}"]["Conv_0"]["kernel"])
            w = np.ascontiguousarray(kern.transpose(3, 2, 0, 1)[:, :, ::-1, ::-1])
            b = np.asarray(p[f"_Tower_{t}"][f"ConvPool_{j}"]["Conv_0"]["bias"])
            layers[num] = [w, b]
            num += 1
    tower_chw = ((8, 11, 11), (8, 11, 11), (8, 8, 8))
    for i in range(3):
        w = np.asarray(p["MLPHead_0"][f"Dense_{i}"]["kernel"])
        if i == 0:
            blocks, s = [], 0
            for c, h, wd in tower_chw:
                n = c * h * wd
                blk = (
                    w[s : s + n]
                    .reshape(h, wd, c, -1)
                    .transpose(2, 0, 1, 3)
                    .reshape(n, -1)
                )
                blocks.append(blk)
                s += n
            w = np.concatenate(blocks, axis=0)
        layers[num] = [np.ascontiguousarray(w),
                       np.asarray(p["MLPHead_0"][f"Dense_{i}"]["bias"])]
        num += 1
        if i < 2:
            layers[num] = []
            num += 1

    restored = scalenet_params_from_reference(layers)
    x = np.random.default_rng(2).standard_normal((2, 128, 128, 1)).astype(
        np.float32
    )
    y0 = model.apply(variables, x, train=False)
    y1 = model.apply(restored, x, train=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def _np_reference_convpool(x_nchw, w_oihw, b, pool):
    """The REFERENCE ConvPoolLayer forward, written straight from its
    semantics (convpoollayer.py:39-305) in plain numpy: Theano conv2d is
    TRUE convolution (filter_flip=True) in OIHW over NCHW, valid padding;
    bias is added before the pool; pool_2d(ignore_border=True) floors odd
    extents; then ReLU.  Deliberately independent of utils/refweights.py
    so the two can disagree."""
    from numpy.lib.stride_tricks import sliding_window_view

    wf = w_oihw[:, :, ::-1, ::-1]  # true convolution = flipped correlation
    win = sliding_window_view(x_nchw, wf.shape[-2:], axis=(2, 3))
    y = np.einsum("bchwuv,ocuv->bohw", win, wf, optimize=True)
    y = y + b[None, :, None, None]
    ph, pw = pool
    if (ph, pw) != (1, 1):
        n, o, h, w = y.shape
        y = y[:, :, : h // ph * ph, : w // pw * pw]
        y = y.reshape(n, o, h // ph, ph, w // pw, pw).max(axis=(3, 5))
    return np.maximum(y, 0.0)


def test_poseregnet_numpy_reference_forward():
    """Convention cross-check BEYOND round-trip: a random reference-layout
    net is run through an independent numpy implementation of the
    reference's own forward (true conv, NCHW, bias-before-pool,
    ignore_border pooling, NCHW flatten into the FC stack;
    poseregnet.py:61-143) and through import + flax apply.  The round-trip
    test stays green under a self-consistent-but-wrong kernel flip or
    flatten permutation; this one does not."""
    rng = np.random.default_rng(11)
    conv_specs = [(8, 1, 5, 5, (4, 4)), (8, 8, 5, 5, (2, 2)),
                  (8, 8, 3, 3, (1, 1))]
    layers, num = {}, 0
    for o, i, kh, kw, _ in conv_specs:
        layers[num] = [
            (rng.standard_normal((o, i, kh, kw)) * 0.2).astype(np.float32),
            rng.standard_normal((o,)).astype(np.float32),
        ]
        num += 1
    for j, (fi, fo) in enumerate([(968, 1024), (1024, 1024), (1024, 42)]):
        layers[num] = [
            (rng.standard_normal((fi, fo)) / np.sqrt(fi)).astype(np.float32),
            (rng.standard_normal((fo,)) * 0.1).astype(np.float32),
        ]
        num += 1
        if j < 2:
            layers[num] = []  # dropout: no params
            num += 1

    x_nchw = rng.uniform(-1.0, 1.0, (2, 1, 128, 128)).astype(np.float32)

    y = x_nchw
    for (_, _, _, _, pool), n in zip(conv_specs, range(3)):
        y = _np_reference_convpool(y, layers[n][0], layers[n][1], pool)
    assert y.shape == (2, 8, 11, 11)
    y = y.reshape(2, -1)  # NCHW flatten order
    for j, n in enumerate([3, 5, 7]):
        y = y @ layers[n][0] + layers[n][1]
        if j < 2:
            y = np.maximum(y, 0.0)

    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    restored = poseregnet_params_from_reference(layers)
    out = model.apply(restored, x_nchw.transpose(0, 2, 3, 1), train=False)
    np.testing.assert_allclose(np.asarray(out), y, rtol=1e-4, atol=2e-4)


def test_bn_invstd_reference_formula():
    """The reference BatchNorm applies gamma*(x-mean)*inv_std + beta with
    stored inv_std = 1/sqrt(var + 1e-4) (batchnormlayer.py:141-155); the
    importer maps var' = inv_std^-2 - eps_flax so flax's
    1/sqrt(var' + eps_flax) reproduces inv_std.  Check against the
    reference formula itself, not a round-trip."""
    import flax.linen as nn

    rng = np.random.default_rng(5)
    c = 16
    mean = rng.uniform(-1, 1, c).astype(np.float32)
    var_ref = rng.uniform(0.2, 2.0, c).astype(np.float32)
    inv_std = (1.0 / np.sqrt(var_ref + 1e-4)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, c).astype(np.float32)
    beta = rng.uniform(-0.5, 0.5, c).astype(np.float32)
    x = rng.standard_normal((4, 7, 7, c)).astype(np.float32)

    want = gamma * (x - mean) * inv_std + beta

    eps_flax = 1e-5
    var = 1.0 / np.square(inv_std) - eps_flax  # the importer's conversion
    bn = nn.BatchNorm(use_running_average=True, epsilon=eps_flax,
                      momentum=0.9)
    got = bn.apply(
        {
            "params": {"scale": gamma, "bias": beta},
            "batch_stats": {"mean": mean, "var": var.astype(np.float32)},
        },
        x,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_resnet_import_roundtrip():
    """ResNet-47-family pickle mapping: emission-order walk (BN/NL/Conv
    blocks + projection shortcut), BN inv_std -> var conversion, head
    flatten permutation — reconstructed variables reproduce the forward
    pass exactly on a small 9n+2 instance."""
    from deepprior_tpu.models import ResNet, ResNetConfig
    from deepprior_tpu.utils.refweights import resnet_params_from_reference

    cfg = ResNetConfig(num_joints=1, n_dims=30, depth=11,
                       stages=(8, 16, 16, 16, 16))
    model = ResNet(cfg)
    variables = model.init(jax.random.key(0), np.zeros((1, 128, 128, 1)))
    p, bs = variables["params"], variables["batch_stats"]

    # give the running stats non-trivial values so the BN conversion and
    # the eval-mode forward genuinely depend on them
    rng = np.random.default_rng(7)
    bs = jax.tree.map(
        lambda x: (rng.uniform(0.5, 1.5, x.shape)).astype(np.float32), bs
    )
    variables = {"params": p, "batch_stats": bs}

    eps_ref, eps_flax = 1e-4, 1e-5

    def inv_conv(kern):
        return np.ascontiguousarray(
            np.asarray(kern).transpose(3, 2, 0, 1)[:, :, ::-1, ::-1]
        )

    def emit_bn(layers, num, mod_p, mod_s):
        var = np.asarray(mod_s["var"])
        inv_std = 1.0 / np.sqrt(var + eps_flax)
        layers[num] = [np.asarray(mod_p["bias"]), np.asarray(mod_p["scale"]),
                       np.asarray(mod_s["mean"]), inv_std.astype(np.float32)]
        layers[num + 1] = []  # nonlinearity
        return num + 2

    layers, num = {}, 0
    layers[num] = [inv_conv(p["Conv_0"]["kernel"]),
                   np.asarray(p["Conv_0"]["bias"])]
    num += 1
    in_ch = cfg.stages[0]
    bidx = 0
    for width in cfg.stages[1:]:
        for _ in range(cfg.blocks_per_stage):
            bp = p[f"_Bottleneck_{bidx}"]
            bss = bs[f"_Bottleneck_{bidx}"]
            for j in range(3):
                num = emit_bn(layers, num, bp[f"BatchNorm_{j}"],
                              bss[f"BatchNorm_{j}"])
                layers[num] = [inv_conv(bp[f"Conv_{j}"]["kernel"]),
                               np.asarray(bp[f"Conv_{j}"]["bias"])]
                num += 1
            if in_ch != width:
                layers[num] = [inv_conv(bp["Conv_3"]["kernel"]),
                               np.asarray(bp["Conv_3"]["bias"])]
                num += 1
            in_ch = width
            bidx += 1
    num = emit_bn(layers, num, p["BatchNorm_0"], bs["BatchNorm_0"])
    # only stage 1 projects (8->16); identity blocks ignore the stride,
    # so the trunk output is 128/2/2 = 32 spatial
    c, h, wd = cfg.stages[-1], 32, 32
    for i in range(3):
        w = np.asarray(p[f"Dense_{i}"]["kernel"])
        if i == 0:
            w = (w.reshape(h, wd, c, -1).transpose(2, 0, 1, 3)
                 .reshape(c * h * wd, -1))
        layers[num] = [np.ascontiguousarray(w),
                       np.asarray(p[f"Dense_{i}"]["bias"])]
        num += 1
        if i < 2:
            layers[num] = []  # dropout
            num += 1

    restored = resnet_params_from_reference(layers, cfg=cfg)
    x = np.random.default_rng(3).standard_normal((2, 128, 128, 1)).astype(
        np.float32
    )
    y0 = model.apply(variables, x, train=False)
    y1 = model.apply(restored, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-4)


def test_model_from_reference_pickle_infers_head(tmp_path):
    """network_prior-style pickle (decode appended, 4 denses): family +
    head config inferred, outputs match the source net exactly."""
    import pickle

    import jax
    import jax.numpy as jnp

    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.utils.refweights import (
        model_from_reference_pickle,
        reference_pickle_from_params,
    )

    src = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3, embedding=30,
                                      dropout=False))
    variables = src.init(jax.random.key(3), jnp.zeros((1, 128, 128, 1)))
    state = reference_pickle_from_params(variables)
    path = str(tmp_path / "network_prior.pkl")
    with open(path, "wb") as fh:
        pickle.dump(state, fh, protocol=2)

    model, loaded, needs_prior = model_from_reference_pickle(path, "poseregnet")
    assert not needs_prior
    assert model.cfg.num_joints == 14
    assert model.cfg.n_dims == 3
    assert model.cfg.embedding == 30

    x = jnp.asarray(
        np.random.default_rng(5).uniform(-1, 1, (4, 128, 128, 1)), jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(model.apply(loaded, x)),
        np.asarray(src.apply(variables, x)),
        rtol=0, atol=1e-5,
    )


def test_model_from_reference_pickle_flags_embedding_net(tmp_path):
    """A 3-dense, 30-D-output pickle is the pre-decode embedding net: the
    caller must bring the PCA prior."""
    import pickle

    import jax
    import jax.numpy as jnp

    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.utils.refweights import (
        model_from_reference_pickle,
        reference_pickle_from_params,
    )

    src = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30, dropout=False))
    variables = src.init(jax.random.key(4), jnp.zeros((1, 128, 128, 1)))
    path = str(tmp_path / "net.pkl")
    with open(path, "wb") as fh:
        pickle.dump(reference_pickle_from_params(variables), fh, protocol=2)

    model, _, needs_prior = model_from_reference_pickle(path, "poseregnet")
    assert needs_prior
    assert model.cfg.num_joints * model.cfg.n_dims == 30


def test_model_from_reference_pickle_embedding_override(tmp_path):
    """A bare 42-dim output is ambiguous (NYU 14x3 direct regression vs a
    non-default 42-D PCA embedding): the heuristic picks regression, and
    out_is_embedding=True forces the embedding reading."""
    import pickle

    import jax
    import jax.numpy as jnp

    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.utils.refweights import (
        model_from_reference_pickle,
        reference_pickle_from_params,
    )

    src = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=42, dropout=False))
    variables = src.init(jax.random.key(6), jnp.zeros((1, 128, 128, 1)))
    path = str(tmp_path / "net42.pkl")
    with open(path, "wb") as fh:
        pickle.dump(reference_pickle_from_params(variables), fh, protocol=2)

    model, _, needs_prior = model_from_reference_pickle(path, "poseregnet")
    assert not needs_prior and model.cfg.num_joints == 14

    model, _, needs_prior = model_from_reference_pickle(
        path, "poseregnet", out_is_embedding=True
    )
    assert needs_prior
    assert model.cfg.num_joints == 1 and model.cfg.n_dims == 42


def test_out_is_embedding_false_rejects_non_multiple_of_3(tmp_path):
    """out_is_embedding=False with an out % 3 != 0 head is an impossible
    direct-regression net; it must fail at the override site with a clear
    message, not later as a reshape error (ADVICE r3)."""
    import pickle

    import jax
    import jax.numpy as jnp
    import pytest

    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.utils.refweights import (
        model_from_reference_pickle,
        reference_pickle_from_params,
    )

    src = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=40, dropout=False))
    variables = src.init(jax.random.key(8), jnp.zeros((1, 128, 128, 1)))
    path = str(tmp_path / "net40.pkl")
    with open(path, "wb") as fh:
        pickle.dump(reference_pickle_from_params(variables), fh, protocol=2)

    with pytest.raises(ValueError, match="multiple-of-3"):
        model_from_reference_pickle(path, "poseregnet",
                                    out_is_embedding=False)
    # the non-override heuristic still reads it as an embedding
    _, _, needs_prior = model_from_reference_pickle(path, "poseregnet")
    assert needs_prior
