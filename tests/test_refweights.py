"""Reference pickle weight import (utils/refweights.py)."""

import gzip
import pickle

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
