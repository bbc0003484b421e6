"""Distributed trainer: data-parallel batches + tensor-parallel FC layers.

The capability upgrade over the reference (SURVEY.md §2.8): the jitted
epoch from train/trainer.py runs unchanged under GSPMD — parameters are
placed per parallel.mesh.param_shardings (wide Dense layers TP-sharded,
everything else replicated), every gathered batch tensor is constrained to
shard over 'dp', and XLA inserts the gradient psum over ICI automatically.

Works identically on a real multi-chip mesh and on the CPU-simulated mesh
used by tests (XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepprior_tpu.camera import Camera
from deepprior_tpu.parallel.mesh import param_shardings, replicated
from deepprior_tpu.prior import PCAPrior
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer, TrainState


class DistributedTrainer(Trainer):
    def __init__(
        self,
        model,
        cfg: TrainConfig,
        camera: Camera,
        mesh: Mesh,
        prior: Optional[PCAPrior] = None,
    ):
        super().__init__(model, cfg, camera, prior=prior)
        self.mesh = mesh
        from deepprior_tpu.parallel.mesh import batch_axes

        self._batch_axes = batch_axes(mesh)
        n_data = 1
        for ax in self._batch_axes:
            n_data *= mesh.shape[ax]
        if cfg.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by "
                f"data-parallel size {n_data} ({'x'.join(self._batch_axes)})"
            )

        sp = mesh.shape.get("sp", 1)

        def constrain(x):
            rest = [None] * (x.ndim - 1)
            # spatial partitioning: crop images (B, H, W) additionally
            # shard H over 'sp'; GSPMD inserts the conv/pool halo
            # exchanges.  The >=32 floor keeps small per-sample tensors
            # (labels (B,J,3), transforms (B,3,3)) off the spatial axis —
            # sharding 14 joints 2-ways buys nothing and costs collectives.
            if sp > 1 and x.ndim >= 3 and x.shape[1] >= 32 \
                    and x.shape[1] % sp == 0:
                rest[0] = "sp"
            spec = P(*((self._batch_axes,) + tuple(rest)))
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        self.shard_batch = constrain

    def init_state(self, example_crops) -> TrainState:
        state = super().init_state(example_crops)
        shardings = param_shardings(state.params, self.mesh)
        params = jax.device_put(jax.device_get(state.params), shardings)
        batch_stats = jax.device_put(
            jax.device_get(state.batch_stats), replicated(self.mesh)
        )
        # optimizer moments are zeros_like(params): they inherit the sharding
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )

    def load_train_state(self, path: str, state: TrainState):
        """Resume on the mesh: the base restore lands host arrays on one
        device, which would leave the FC weights un-sharded — GSPMD then
        computes the matmul reductions in a different order than the
        tp-sharded run that wrote the snapshot, so the resumed run would
        drift numerically.  Re-place every restored leaf with exactly the
        shardings init_state uses (params Megatron-sharded, BN stats
        replicated, optimizer moments inheriting the param shardings).

        Sharded (orbax) snapshots need almost none of this: the restore
        target is the live mesh-placed state, so every mesh-sharded leaf
        lands directly on its device placement (checkpoint_sharded.py).
        Only the optimizer's bookkeeping scalars (e.g. ADAM's count) need
        touching: tx.init creates them UNcommitted on one device — fine as
        jit inputs — but the restore commits that single-device placement,
        which then clashes with the mesh-placed params; replicate them."""
        from deepprior_tpu.train.checkpoint_sharded import (
            is_sharded_checkpoint,
        )

        if is_sharded_checkpoint(path):
            state, next_epoch = super().load_train_state(path, state)
            rep = replicated(self.mesh)
            opt_state = jax.tree.map(
                lambda x: x
                if isinstance(getattr(x, "sharding", None), NamedSharding)
                else jax.device_put(x, rep),
                state.opt_state,
            )
            return state.replace(opt_state=opt_state), next_epoch
        state, next_epoch = super().load_train_state(path, state)
        shardings = param_shardings(state.params, self.mesh)
        params = jax.device_put(jax.device_get(state.params), shardings)
        batch_stats = jax.device_put(
            jax.device_get(state.batch_stats), replicated(self.mesh)
        )
        placed_zero = self.tx.init(params)  # correctly-sharded structure
        rep = replicated(self.mesh)
        opt_state = jax.tree.map(
            # moments (zeros_like the mesh-placed params) carry a mesh
            # NamedSharding; bookkeeping scalars (e.g. ADAM's count) are
            # created fresh on one device — replicate those instead of
            # committing them off-mesh
            lambda restored, placed: jax.device_put(
                jax.device_get(restored),
                placed.sharding
                if isinstance(placed.sharding, NamedSharding)
                else rep,
            ),
            state.opt_state,
            placed_zero,
        )
        return (
            TrainState(
                params=params,
                batch_stats=batch_stats,
                opt_state=opt_state,
                step=state.step,
            ),
            next_epoch,
        )

    def stream_put(self, batch: dict) -> dict:
        """Stage one (batch, ...) host batch sharded over the mesh's data
        axes — the per-batch variant for chunked_epochs-style iterators
        (fit_streamed itself stages macro chunks via stream_put_chunk
        below): the batch lands split across the dcn/dp devices, and the
        step's with_sharding_constraint is then a no-op instead of a
        reshard."""
        out = {}
        for k, v in batch.items():
            spec = P(*((self._batch_axes,) + (None,) * (v.ndim - 1)))
            out[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
        return out

    def stream_put_chunk(self, chunk: dict) -> dict:
        """Stage one (k, batch, ...) macro chunk with the BATCH axis (1)
        sharded over the data axes; the scan axis (0) stays unsharded so
        each scanned minibatch is already dp-split on device."""
        out = {}
        for k, v in chunk.items():
            spec = P(*((None, self._batch_axes) + (None,) * (v.ndim - 2)))
            out[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
        return out

    def place_data(self, data: TrainData, shard: bool = False) -> TrainData:
        """Place the training tensors on the mesh.

        shard=False (default): replicate — fastest gathers, per-chip HBM is
        the dataset cap.  shard=True: split the N axis over 'dp', so
        dataset capacity scales with the number of chips (SURVEY §2.8
        "per-host data sharding").  The trainer's per-step gather uses
        GLOBAL indices either way, so the sharded run computes exactly the
        same batches (XLA inserts the cross-shard collective gather); the
        loss trace is identical to the replicated run's.

        When N is not divisible by dp the arrays are padded with wrap-around
        repeats of the first samples — the reference pads short macro
        batches with repeated samples the same way (alignData,
        nettrainer.py:365-413).  Padded rows join the shuffle pool, slightly
        oversampling those frames (same effect as the reference's
        pad_random).
        """
        import numpy as np

        if not shard:
            return TrainData(
                *(jax.device_put(x, replicated(self.mesh)) for x in data)
            )
        n_data = 1
        for ax in self._batch_axes:
            n_data *= self.mesh.shape[ax]
        n = data.crops.shape[0]
        pad = (-n) % n_data

        def place(x):
            x = np.asarray(x)
            if pad:
                x = np.concatenate([x, x[:pad]], axis=0)
            spec = P(*((self._batch_axes,) + (None,) * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return TrainData(*(place(x) for x in data))
