"""Device mesh construction and sharding rules.

Mesh axes:
  dp — data parallel: the batch axis shards here; gradients psum over it
  tp — tensor parallel: the 1024-wide FC layers shard here (the conv trunks
       are tiny — parameters replicate; the FC head is where the weights
       are: e.g. ResNet's 16384x1024 FC1 is 97% of its parameter count)

The FC sharding follows the Megatron pattern: alternating column-parallel
(kernel P(None, 'tp'), bias P('tp')) and row-parallel (kernel P('tp', None),
bias replicated) Dense layers, so consecutive layers need only one
reduce-scatter/all-reduce pair, inserted automatically by GSPMD.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    devices=None,
    slices: int = 1,
    sp: int = 1,
) -> Mesh:
    """Build a ('dp', 'tp') mesh — with sp > 1 a ('dp', 'sp', 'tp') mesh,
    and with slices > 1 a ('dcn', ...) prefix.

    Multi-slice pods connect slices over DCN (slow) while chips within a
    slice ride ICI (fast).  The 'dcn' axis is outermost, so jax.devices()'
    slice-major ordering maps slices onto it; batches shard over
    ('dcn', 'dp') jointly and XLA decomposes the gradient all-reduce into
    an ICI reduce-scatter within each slice plus one small DCN all-reduce
    across slices (the scaling-book recipe).  tp stays strictly inside a
    slice — its per-layer collectives must never cross DCN.

    'sp' spatially partitions the crop height: activations shard over H
    and GSPMD inserts the conv/pool halo exchanges (one kernel-radius row
    band per neighbor per conv — nearest-neighbor ppermutes on ICI).  It
    sits between dp and tp so its halo partners are ICI neighbors and it
    never crosses DCN.  Use when per-chip activation memory binds (large
    inputs / deep trunks), not for speed at this model's 128x128 crops.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % slices == 0, f"{n} devices not divisible by slices={slices}"
    per_slice = n // slices
    if dp is None:
        assert per_slice % (tp * sp) == 0, \
            f"{per_slice} devices/slice not divisible by sp*tp={sp * tp}"
        dp = per_slice // (tp * sp)
    assert slices * dp * sp * tp == n, \
        f"slices*dp*sp*tp={slices * dp * sp * tp} != {n} devices"
    dims = [("dcn", slices), ("dp", dp), ("sp", sp), ("tp", tp)]
    keep = [(name, size) for name, size in dims
            if size > 1 or name in ("dp", "tp")]
    arr = np.asarray(devices).reshape([s for _, s in keep])
    return Mesh(arr, axis_names=tuple(name for name, _ in keep))


def batch_axes(mesh: Mesh) -> Tuple[str, ...]:
    """The mesh axes the batch/data N dimension shards over."""
    return ("dcn", "dp") if "dcn" in mesh.axis_names else ("dp",)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axes (dcn+dp)."""
    return NamedSharding(mesh, P(*((batch_axes(mesh),) + (None,) * (ndim - 1))))


def _is_dense_module(mod: Dict[str, Any]) -> bool:
    return (
        isinstance(mod, dict)
        and "kernel" in mod
        and getattr(mod["kernel"], "ndim", 0) == 2
    )


def param_shardings(
    params: Any, mesh: Mesh, tp_axis: str = "tp", min_width: int = 512
) -> Any:
    """Sharding pytree for model params: TP-shard wide Dense stacks, keep
    everything else replicated.

    Within each parent module, Dense submodules are visited in name order and
    alternate column-/row-parallel while their widths divide the tp axis.
    """
    tp = mesh.shape[tp_axis]

    def assign(tree, out):
        # walk dict modules; detect runs of Dense children
        if not isinstance(tree, dict):
            return
        dense_children = sorted(
            [k for k in tree if _is_dense_module(tree[k])],
            key=lambda s: [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)],
        )
        col_next = True
        for k in dense_children:
            kern = tree[k]["kernel"]
            din, dout = kern.shape
            spec_k, spec_b = P(), P()
            if tp > 1:
                if col_next and dout >= min_width and dout % tp == 0:
                    spec_k, spec_b = P(None, tp_axis), P(tp_axis)
                    col_next = False
                elif not col_next and din >= min_width and din % tp == 0:
                    spec_k, spec_b = P(tp_axis, None), P()
                    col_next = True
            out[k] = {
                "kernel": NamedSharding(mesh, spec_k),
                **(
                    {"bias": NamedSharding(mesh, spec_b)} if "bias" in tree[k] else {}
                ),
            }
        for k, v in tree.items():
            if k in out:
                continue
            if isinstance(v, dict):
                out[k] = {}
                assign(v, out[k])
            else:
                out[k] = NamedSharding(mesh, P())

    out: Dict[str, Any] = {}
    assign(params, out)
    return out


def tree_shardings_like(tree: Any, leaf_sharding: NamedSharding) -> Any:
    return jax.tree.map(lambda _: leaf_sharding, tree)
