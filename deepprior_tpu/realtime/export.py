"""Frozen serving artifacts: the fused pipeline as one portable program.

The reference ships serving as Python source + a weights pickle and pays
a per-process graph build before the first frame (realtimehandposepipeline
initNets + Theano compile).  Here the whole fused pipeline — clamp, crop,
normalize, regress, PCA decode, denormalize — is already ONE jitted
program (realtime/fused.py), so it can be frozen into a single immutable
artifact and served with zero framework Python:

- `export_serving` captures the pipeline via `jax.export` as serialized
  StableHLO with the trained weights baked in as constants — for the
  current backend by default, or multiple platforms on request (the
  Pallas crop limits that; see the function docstring).  The loaded
  callable needs no model class, camera table, or prior — all geometry
  and weights live inside the program.
- `precompile_serving` goes one step further for same-topology restarts:
  it serializes the COMPILED executable (jax.experimental
  .serialize_executable), so a restarted server skips tracing and
  compilation entirely.  Compiled artifacts are device/topology-pinned;
  the StableHLO artifact is the portable one.  Measured on the real TPU
  (prof_artifact_tpu.py): both kinds bit-exact, deserialize 0.7 s — but
  through THIS sandbox's axon tunnel the first execution of a
  deserialized executable pays a ~3 min remote load, so the restart win
  is only realizable on directly-attached devices (environment, not
  framework: the tunnel re-stages the executable server-side).

Artifact layout: MAGIC | meta-length (8 LE) | meta JSON | payload.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

MAGIC = b"DPTPUX1\x00"


def _write(path: str, meta: Dict[str, Any], payload: bytes) -> None:
    blob = json.dumps(meta, sort_keys=True).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(len(blob).to_bytes(8, "little"))
        f.write(blob)
        f.write(payload)
    os.replace(tmp, path)


def _read(path: str) -> Tuple[Dict[str, Any], bytes]:
    with open(path, "rb") as f:
        if f.read(len(MAGIC)) != MAGIC:
            raise ValueError(f"{path} is not a deepprior_tpu serving artifact")
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        return meta, f.read()


def export_serving(
    est,
    variables,
    batch: int,
    hw: Tuple[int, int],
    path: str,
    platforms: Tuple[str, ...] | None = None,
) -> Dict[str, Any]:
    """Freeze `est._pipeline` (fixed constructor config, weights baked in)
    for a static (batch, H, W) into a portable StableHLO artifact.

    est: a realtime.fused.FusedEstimator; variables: its trained weights.
    platforms defaults to the current backend.  Cross-platform export
    (e.g. ("cpu", "tpu")) works ONLY when the estimator avoids the Pallas
    crop (crop_method='onehot') — a Mosaic kernel has no cpu lowering, so
    multi-platform lowering of a pallas pipeline raises.  A TPU-only
    export of the Pallas pipeline serializes fine (measured bit-exact on
    device, prof_artifact_tpu.py).
    Returns the artifact meta (also stored in the file)."""
    from jax import export as jexport

    if platforms is None:
        platforms = (jax.default_backend(),)

    variables = jax.device_get(variables)  # bake host copies as constants

    def frozen(depth, com):
        return est._pipeline(variables, depth, com)

    depth = jax.ShapeDtypeStruct((batch,) + tuple(hw), jnp.float32)
    com = jax.ShapeDtypeStruct((batch, 3), jnp.float32)
    exp = jexport.export(jax.jit(frozen), platforms=list(platforms))(
        depth, com
    )
    meta = {
        "kind": "stablehlo",
        "batch": batch,
        "hw": list(hw),
        "platforms": list(platforms),
        "dsize": list(est.dsize),
        "cube": list(np_list(est.cube)),
        "num_outputs": 3,  # (joints3d_mm, com3d, crops)
        "jax_version": jax.__version__,
    }
    _write(path, meta, exp.serialize())
    return meta


def np_list(x):
    import numpy as np

    return [float(v) for v in np.asarray(x).reshape(-1)]


def load_serving(path: str):
    """Load an artifact written by export_serving.

    Returns (fn, meta): fn(depth (B, H, W) f32 raw mm, com (B, 3) image
    coords) -> (joints3d_mm, com3d, crops) — a jitted callable, no
    framework objects required."""
    from jax import export as jexport

    meta, payload = _read(path)
    if meta.get("kind") != "stablehlo":
        raise ValueError(
            f"{path} is a {meta.get('kind')} artifact; load_serving reads "
            "stablehlo artifacts (use load_precompiled for compiled ones)"
        )
    exp = jexport.deserialize(payload)
    fn = jax.jit(exp.call)
    return fn, meta


def precompile_serving(
    est, variables, batch: int, hw: Tuple[int, int], path: str
) -> Dict[str, Any]:
    """Serialize the COMPILED fused executable for same-topology restarts
    (zero retrace + zero compile on load; NOT portable across device
    topologies — ship the stablehlo artifact for that)."""
    from jax.experimental import serialize_executable as se

    variables = jax.device_get(variables)

    def frozen(depth, com):
        return est._pipeline(variables, depth, com)

    # pin to ONE explicit device: in multi-device processes an unplaced
    # lowering can bake a multi-shard device assignment into the
    # executable, which then rejects ordinary single-device inputs after
    # deserialization
    dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    depth = jax.ShapeDtypeStruct((batch,) + tuple(hw), jnp.float32,
                                 sharding=dev)
    com = jax.ShapeDtypeStruct((batch, 3), jnp.float32, sharding=dev)
    # compile FRESH, bypassing the persistent compilation cache: a cache
    # hit can return an executable compiled on a DIFFERENT host (this
    # sandbox migrates machines between sessions), whose recorded target
    # features fail deserialize_and_load's host check — the loaded
    # program then dies at execution ("Buffer Definition Event ... not
    # found").  A compiled artifact is host/topology-pinned by contract,
    # so it must be built by THIS machine's compiler.
    prev_cache = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        compiled = jax.jit(frozen).lower(depth, com).compile()
    finally:
        jax.config.update("jax_enable_compilation_cache", prev_cache)
    payload, in_tree, out_tree = se.serialize(compiled)
    meta = {
        "kind": "compiled",
        "batch": batch,
        "hw": list(hw),
        "backend": jax.default_backend(),
        "dsize": list(est.dsize),
        "cube": list(np_list(est.cube)),
        "jax_version": jax.__version__,
    }
    _write(path, meta, payload)
    # pytree defs for deserialize_and_load are reconstructed at load time
    # from the known (depth, com) -> 3-tuple calling convention
    return meta


def load_precompiled(path: str):
    """Load a compiled artifact (precompile_serving) on the SAME backend/
    topology.  Returns (fn, meta)."""
    from jax.experimental import serialize_executable as se

    meta, payload = _read(path)
    if meta.get("kind") != "compiled":
        raise ValueError(
            f"{path} is a {meta.get('kind')} artifact; load_precompiled "
            "reads compiled artifacts (use load_serving for stablehlo)"
        )
    if meta.get("backend") != jax.default_backend():
        raise ValueError(
            f"compiled for backend {meta.get('backend')!r}, running on "
            f"{jax.default_backend()!r} — re-export or use the stablehlo "
            "artifact"
        )
    in_tree = jax.tree.structure(
        ((jnp.zeros(()), jnp.zeros(())), {})
    )  # ((depth, com), {}) calling convention
    out_tree = jax.tree.structure((0, 0, 0))
    dev = jax.devices()[0]
    # executable was compiled single-device (precompile_serving pins it);
    # without execution_devices the loader binds ALL local devices and the
    # loaded program then demands num_devices input shards
    loaded = se.deserialize_and_load(
        payload, in_tree, out_tree, execution_devices=[dev]
    )

    def fn(depth, com):
        # the executable was compiled for device 0 (see precompile_serving)
        return loaded(
            jax.device_put(jnp.asarray(depth, jnp.float32), dev),
            jax.device_put(jnp.asarray(com, jnp.float32), dev),
        )

    return fn, meta


def load_artifact(path: str):
    """Load either artifact kind by its stored meta."""
    meta, _ = _read(path)
    if meta.get("kind") == "compiled":
        return load_precompiled(path)
    return load_serving(path)


class ArtifactEstimator:
    """Serving shim around a loaded artifact with the micro-batcher's
    holds-its-own-weights calling convention (realtime/batcher.py's
    `variables=None` mode, like parallel/serve.ShardedEstimator):
    `est(depth, com) -> (joints3d_mm, com3d, crops)`.

    The artifact's config is frozen (constructor cube, no per-request
    mirror) and its batch is the compiled shape — pass `max_batch=
    est.batch` and `frame_shape=est.hw` to MicroBatchServer."""

    def __init__(self, path: str):
        self._fn, self.meta = load_artifact(path)
        self.batch = int(self.meta["batch"])
        self.hw = tuple(self.meta["hw"])
        import numpy as np

        self.cube = np.asarray(self.meta["cube"], np.float32)

    def __call__(self, depth, com):
        return self._fn(
            jnp.asarray(depth, jnp.float32), jnp.asarray(com, jnp.float32)
        )
