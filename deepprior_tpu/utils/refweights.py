"""Import reference-trained pickle weights into flax params.

The reference saves nets as a pickle dict (netbase.py:405-422):
  {'class': <name>, 'network': <str>,
   '<layerNum>-values': [W, b, ...params, ...params_nontrained]}
with Theano conventions:
  * conv W is OIHW and theano.conv2d is TRUE convolution (filter_flip=True),
    so kernels flip spatially and transpose to flax's HWIO;
  * activations flatten NCHW -> C*H*W row order, while flax flattens
    NHWC -> H*W*C, so the first Dense after a conv trunk permutes its
    input rows accordingly;
  * ConvPoolLayer adds bias before the maxpool; max(x+b) == max(x)+b, so
    the bias maps unchanged onto our bias-after-pool layers.

Supported: PoseRegNet types 0/11, ScaleNet type 1, AND ResNet-47 (the
reference's gzip/raw '.pkl' artifacts, e.g. network_prior.pkl from the
main scripts).  ResNet pickles interleave BatchNorm running stats in
params_nontrained; `resnet_params_from_reference` walks the emission
order and converts BN inv_std -> variance exactly.

Verified two ways (tests/test_refweights.py): round-trip tests
(flax -> reference layout -> flax), and an INDEPENDENT numpy
implementation of the reference's own forward semantics (true
convolution in OIHW over NCHW, bias before ignore_border pooling, NCHW
flatten, and the BN inv_std formula) that must agree with the imported
flax nets — so a self-consistent-but-wrong convention cannot slip
through.  Theano itself is not available in this image to cross-check
against live reference nets.
"""

from __future__ import annotations

import gzip
import pickle
from typing import Any, Dict, List

import numpy as np


def load_reference_pickle(path: str) -> Dict[int, List[np.ndarray]]:
    """Read a reference NetBase pickle -> {layerNum: [param arrays]}.

    Handles the '.gz' double-format like netbase.py:417 and python-2 era
    protocol-2 pickles (latin1 numpy decoding).
    """
    opener = gzip.open if path.lower().endswith(".gz") else open
    with opener(path, "rb") as fh:
        state = pickle.load(fh, encoding="latin1")
    out: Dict[int, List[np.ndarray]] = {}
    for key, val in state.items():
        if not key.endswith("-values"):
            continue
        out[int(key.split("-")[0])] = [np.asarray(v) for v in val]
    return out


def _conv_kernel(theano_w: np.ndarray) -> np.ndarray:
    """OIHW true-convolution filter -> flax HWIO cross-correlation kernel."""
    return np.ascontiguousarray(
        theano_w[:, :, ::-1, ::-1].transpose(2, 3, 1, 0)
    )


def _flatten_perm(w: np.ndarray, chw: tuple) -> np.ndarray:
    """Permute Dense input rows from NCHW-flatten order to NHWC-flatten."""
    c, h, wd = chw
    return np.ascontiguousarray(
        w.reshape(c, h, wd, -1).transpose(1, 2, 0, 3).reshape(c * h * wd, -1)
    )


def poseregnet_params_from_reference(
    layers: Dict[int, List[np.ndarray]],
    conv_out_chw: tuple = (8, 11, 11),
) -> Dict[str, Any]:
    """Map a PoseRegNet pickle (poseregnet.py:61-101 layer order: 3x
    ConvPool, then Hidden/Dropout pairs and the final linear(s)) onto
    models/poseregnet.PoseRegNet's param tree.

    conv_out_chw: the last conv tower output (C, H, W) — (8, 11, 11) for
    128x128 inputs.  Works for type 0 (3 Dense) and type 11 (4 Dense:
    30-D bottleneck + decode) — dropout layers carry no params and are
    skipped by layer number.
    """
    convs = [layers[i] for i in (0, 1, 2)]
    dense_nums = [i for i in sorted(layers) if i >= 3 and layers[i]]
    denses = [layers[i] for i in dense_nums]

    params: Dict[str, Any] = {}
    for i, (w, b) in enumerate(convs):
        params[f"ConvPool_{i}"] = {
            "Conv_0": {"kernel": _conv_kernel(w), "bias": np.asarray(b)}
        }
    head: Dict[str, Any] = {}
    for i, (w, b) in enumerate(denses):
        w = np.asarray(w)
        if i == 0:
            w = _flatten_perm(w, conv_out_chw)
        head[f"Dense_{i}"] = {"kernel": w, "bias": np.asarray(b)}
    params["MLPHead_0"] = head
    return {"params": params}


def scalenet_params_from_reference(
    layers: Dict[int, List[np.ndarray]],
    tower_out_chw=((8, 11, 11), (8, 11, 11), (8, 8, 8)),
) -> Dict[str, Any]:
    """Map a ScaleNet type-1 pickle (scalenet.py:53-130: numInputs=3 towers
    of inpConv=3 ConvPool layers, then the FC head over the concatenated
    tower features) onto models/scalenet.ScaleNet's param tree.

    The first Dense's rows permute per tower block (each tower flattens
    NCHW independently before the concat, scalenet.py:169-175).
    """
    n_towers, inp_conv = 3, 3
    params: Dict[str, Any] = {}
    for t in range(n_towers):
        tower: Dict[str, Any] = {}
        for j in range(inp_conv):
            w, b = layers[t * inp_conv + j]
            tower[f"ConvPool_{j}"] = {
                "Conv_0": {"kernel": _conv_kernel(w), "bias": np.asarray(b)}
            }
        params[f"_Tower_{t}"] = tower

    dense_nums = [
        i for i in sorted(layers) if i >= n_towers * inp_conv and layers[i]
    ]
    head: Dict[str, Any] = {}
    for i, num in enumerate(dense_nums):
        w, b = layers[num]
        w = np.asarray(w)
        if i == 0:
            blocks = []
            s = 0
            for chw in tower_out_chw:
                n = int(np.prod(chw))
                blocks.append(_flatten_perm(w[s : s + n], chw))
                s += n
            w = np.concatenate(blocks, axis=0)
        head[f"Dense_{i}"] = {"kernel": w, "bias": np.asarray(b)}
    params["MLPHead_0"] = head
    return {"params": params}


def resnet_params_from_reference(
    layers: Dict[int, List[np.ndarray]],
    cfg=None,
    eps_ref: float = 1e-4,
    eps_flax: float = 1e-5,
    input_hw: int = 128,
) -> Dict[str, Any]:
    """Map a ResNet-47 pickle onto models/resnet.ResNet's variables.

    Reference emission order (resnet.py:196-347 + res_block:349-414):
    stem ConvPool, then per bottleneck block 3x(BN, Nonlinearity, Conv)
    [+ the 1x1 projection shortcut conv appended last in projection
    blocks], final BN + Nonlinearity, then the Hidden/Dropout head.
    Nonlinearity/Dropout layers carry no params (empty '-values').

    BatchNorm pickles store [beta, gamma] + nontrained [mean, inv_std]
    where inv_std = 1/sqrt(var + eps_ref) (batchnormlayer.py:141-155,
    eps_ref=1e-4); flax normalizes by sqrt(var' + eps_flax), so
    var' = inv_std^-2 - eps_flax reproduces the reference normalization
    exactly.

    Returns {'params': ..., 'batch_stats': ...}.
    """
    from deepprior_tpu.models.resnet import ResNetConfig

    if cfg is None:
        cfg = ResNetConfig()

    nums = sorted(layers)
    pos = 0

    def take():
        nonlocal pos
        while not layers[nums[pos]]:  # skip Nonlinearity/Dropout layers
            pos += 1
        vals = layers[nums[pos]]
        pos += 1
        return vals

    def conv_entry():
        w, b = take()
        return {"kernel": _conv_kernel(np.asarray(w)), "bias": np.asarray(b)}

    def bn_entry():
        beta, gamma, mean, inv_std = take()
        var = 1.0 / np.square(np.asarray(inv_std)) - eps_flax
        return (
            {"scale": np.asarray(gamma), "bias": np.asarray(beta)},
            {"mean": np.asarray(mean), "var": var.astype(np.float32)},
        )

    params: Dict[str, Any] = {"Conv_0": conv_entry()}
    stats: Dict[str, Any] = {}

    in_ch = cfg.stages[0]
    bidx = 0
    for width in cfg.stages[1:]:
        for _ in range(cfg.blocks_per_stage):
            identity = in_ch == width
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for j in range(3):
                bn_p, bn_s = bn_entry()
                bp[f"BatchNorm_{j}"] = bn_p
                bs[f"BatchNorm_{j}"] = bn_s
                bp[f"Conv_{j}"] = conv_entry()
            if not identity:
                bp["Conv_3"] = conv_entry()  # projection shortcut
            params[f"_Bottleneck_{bidx}"] = bp
            stats[f"_Bottleneck_{bidx}"] = bs
            in_ch = width
            bidx += 1

    bn_p, bn_s = bn_entry()
    params["BatchNorm_0"] = bn_p
    stats["BatchNorm_0"] = bn_s

    # head: Dense rows of the first FC permute from NCHW- to NHWC-flatten.
    # Spatial size: stem maxpool halves once; each stage whose first block
    # takes the projection path halves again (identity blocks ignore the
    # stride — the reference quirk reproduced in models/resnet.py)
    n_proj = 0
    ch = cfg.stages[0]
    for width in cfg.stages[1:]:
        if ch != width:
            n_proj += 1
        ch = width
    hw = input_hw // 2 // (2**n_proj)
    di = 0
    chw = (cfg.stages[-1], hw, hw)
    while pos < len(nums):
        # remaining parameterized layers are the Hidden ones
        try:
            w, b = take()
        except IndexError:
            break
        w = np.asarray(w)
        if di == 0:
            w = _flatten_perm(w, chw)
        params[f"Dense_{di}"] = {"kernel": w, "bias": np.asarray(b)}
        di += 1

    return {"params": params, "batch_stats": stats}


def reference_pickle_from_params(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse mapping (our PoseRegNet params -> reference pickle layout),
    used by the round-trip tests and to export weights reference-side."""
    params = variables["params"]
    state: Dict[str, Any] = {"class": "PoseRegNet", "network": "PoseRegNet"}
    num = 0
    for i in range(3):
        kern = np.asarray(params[f"ConvPool_{i}"]["Conv_0"]["kernel"])
        w = kern.transpose(3, 2, 0, 1)[:, :, ::-1, ::-1]
        b = np.asarray(params[f"ConvPool_{i}"]["Conv_0"]["bias"])
        state[f"{num}-values"] = [np.ascontiguousarray(w), b]
        num += 1
    head = params["MLPHead_0"]
    dense_keys = sorted(head, key=lambda s: int(s.split("_")[1]))
    for i, k in enumerate(dense_keys):
        w = np.asarray(head[k]["kernel"])
        if i == 0:
            chw = (8, 11, 11)
            c, h, wd = chw
            w = (
                w.reshape(h, wd, c, -1)
                .transpose(2, 0, 1, 3)
                .reshape(c * h * wd, -1)
            )
        state[f"{num}-values"] = [np.ascontiguousarray(w), np.asarray(head[k]["bias"])]
        num += 1
        if i < len(dense_keys) - 1 and i < 2:
            state[f"{num}-values"] = []  # dropout layer: no params
            num += 1
    return state


def model_from_reference_pickle(path: str, family: str, dtype=None,
                                packed_conv: bool = False,
                                out_is_embedding=None):
    """One-call load of a reference-trained net: pickle -> (model,
    variables, needs_prior).

    Infers the head configuration from the pickle's dense stack instead
    of making the caller reconstruct the reference `*Params`:

    * 4 denses (1024, 1024, E, J*3) — the ``network_prior.pkl`` form the
      mains save (PCA decode appended as a linear layer,
      main_nyu_posereg_embedding.py:148-158) or head types 11/1/4 with
      decode: ``embedding=E``, ``num_joints=J``; needs_prior=False.
    * 3 denses ending in a J*3 dim: plain type-0 regression;
      needs_prior=False.
    * 3 denses ending in 30 (or any non-multiple of 3): the net emits
      the PCA embedding — needs_prior=True, and the caller must decode
      through the matching `prior.PCAPrior` (no reference dataset has 10
      joints, so 30 is unambiguous).

    A 3-dense stack ending in another multiple of 3 is AMBIGUOUS from the
    pickle alone (42 = 14 joints x 3 = NYU direct regression, but also a
    valid non-default PCA size): the heuristic assumes direct regression
    and warns; pass ``out_is_embedding=True``/``False`` to decide
    explicitly for nets trained with a non-default ``nDims``.

    family: "poseregnet" | "resnet" (ScaleNet CoM refiners go through
    ops.refine_cnn instead).  dropout layers carry no pickle params and
    are inference-off, so the returned config sets dropout=False.
    """
    import jax.numpy as jnp

    dt = dtype if dtype is not None else jnp.float32
    layers = load_reference_pickle(path)
    if family == "resnet":
        from deepprior_tpu.models import ResNet, ResNetConfig

        variables = resnet_params_from_reference(layers)
        head = variables["params"]
    elif family == "poseregnet":
        from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig

        variables = poseregnet_params_from_reference(layers)
        head = variables["params"]["MLPHead_0"]
    else:
        raise ValueError(f"unknown family {family!r}")

    sizes = []
    while f"Dense_{len(sizes)}" in head:
        sizes.append(int(head[f"Dense_{len(sizes)}"]["bias"].shape[0]))
    out = sizes[-1]
    embedding = sizes[2] if len(sizes) >= 4 else None
    if embedding is not None:  # decode layer appended: output is mm pose
        needs_prior = False
    elif out_is_embedding is not None:
        needs_prior = bool(out_is_embedding)
        if not needs_prior and out % 3 != 0:
            # direct regression decodes as (J, 3); a non-multiple-of-3
            # head cannot be one — fail at the override site instead of
            # surfacing later as a confusing reshape error
            raise ValueError(
                f"out_is_embedding=False is impossible: the net ends in "
                f"a {out}-dim dense, and direct regression needs a "
                f"multiple-of-3 output"
            )
    else:
        needs_prior = out % 3 != 0 or out == 30
        if not needs_prior and out != 30:
            print(
                f"WARNING: {path} ends in a bare {out}-dim dense; "
                f"treating it as direct {out // 3}-joint regression. If "
                "this net was trained with a non-default PCA size "
                f"(nDims={out}), pass out_is_embedding=True and decode "
                "through its PCAPrior."
            )
    num_joints, n_dims = (1, out) if needs_prior else (out // 3, 3)

    if family == "resnet":
        cfg = ResNetConfig(num_joints=num_joints, n_dims=n_dims,
                           embedding=embedding, dropout=False, dtype=dt,
                           packed_conv=packed_conv)
        model = ResNet(cfg)
    else:
        cfg = PoseRegNetConfig(num_joints=num_joints, n_dims=n_dims,
                               embedding=embedding, dropout=False, dtype=dt,
                               packed_conv=packed_conv)
        model = PoseRegNet(cfg)
    return model, variables, needs_prior
