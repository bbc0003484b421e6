"""Online serving front-end: transparent micro-batching over the fused
estimator.

The reference serves one frame at a time from the consumer process
(reference realtimehandposepipeline.py:176-219) and pads batched
inference up to the compiled batch size by repeating the last sample
(reference netbase.py:287-307).  A TPU chip at batch 1 leaves ~99% of its
throughput idle (docs/RESULTS.md: 0.02-0.06 ms/frame device time at
batch 1 vs 227k fps at batch 512), so the TPU-native online-serving shape
is a micro-batcher: concurrent callers submit single frames and get
Futures; a collector thread groups up to ``max_batch`` requests (waiting
at most ``max_wait_ms`` after the first arrival), pads the tail to the
compiled batch size by repeating the last request (static shapes -> ONE
cached XLA program, the reference's own tail-pad rule), runs the fused
pipeline once, and resolves every caller's Future from a single host
fetch.

Latency/throughput trade: a lone request pays ``max_wait_ms`` extra
latency; under load the batch fills before the deadline and per-frame
cost approaches the batched-throughput numbers.  This is the same
continuous-batching pattern production TPU serving stacks use; scale-out
across chips composes via parallel/serve.py::ShardedEstimator.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from deepprior_tpu.realtime.fused import FusedEstimator


@dataclass
class _Request:
    depth: np.ndarray  # (H, W) raw mm
    com: np.ndarray  # (3,) image coords
    cube: Optional[np.ndarray]  # (3,) mm or None -> estimator default
    mirror: bool
    future: Future


class MicroBatchServer:
    """Groups concurrent single-frame requests into one device batch.

    ``submit`` is thread-safe and returns a ``concurrent.futures.Future``
    resolving to the (J, 3) joints in mm.  All requests of a batch run as
    one fused program at the fixed ``max_batch`` shape; per-request
    ``cube``/``mirror`` ride the pipeline's traced per-sample config
    (realtime/fused.py::_pipeline_cfg), so mixed-config batches still
    compile once.
    """

    def __init__(
        self,
        est: FusedEstimator,
        variables: Any,
        max_batch: int = 64,
        max_wait_ms: float = 2.0,
        frame_shape: Optional[tuple] = None,
    ):
        """``est`` is a FusedEstimator with ``variables`` its pytree — or,
        for multi-chip online serving, a parallel/serve.py
        ShardedEstimator (which holds its placed variables itself) with
        ``variables=None``.  In the sharded case ``max_batch`` must be a
        multiple of the mesh's data-axis size (the fixed compiled batch
        makes that invariant hold for any traffic), and per-request
        cube/mirror are unsupported (ShardedEstimator partitions the
        fixed-config pipeline).

        ``frame_shape`` pins the accepted (H, W); by default it is taken
        from the estimator's camera resolution, so a stray first request
        with a wrong-but-valid shape can never lock the server to it (it
        fails its own caller with a 4xx-class ValueError instead)."""
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.est = est
        self.variables = variables
        self._sharded = variables is None
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._running = True
        if frame_shape is None:
            cam = getattr(est, "camera", None)
            if cam is None:  # ShardedEstimator wraps the FusedEstimator
                cam = getattr(getattr(est, "est", None), "camera", None)
            if cam is not None:
                frame_shape = (int(cam.height), int(cam.width))
        # pinned (H, W); None only when the estimator carries no camera,
        # in which case the shape commits on the first SUCCESSFUL batch
        # (never on a mere submit, which could poison the server lifetime)
        self._frame_shape: Optional[tuple] = (
            tuple(frame_shape) if frame_shape is not None else None
        )
        self._tentative_shape: Optional[tuple] = None
        # orders submit's {check _running, enqueue} against close's
        # {clear _running, enqueue sentinel}: without it a submit racing
        # close can enqueue AFTER the collector drained past the
        # sentinel, and that Future would never resolve
        self._submit_lock = threading.Lock()
        # observability (SURVEY §5 surface): request/batch counts expose
        # the realized occupancy = frames / (batches * max_batch)
        self.stats = {"frames": 0, "batches": 0, "errors": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def submit(
        self,
        depth: np.ndarray,
        com: np.ndarray,
        cube: Optional[np.ndarray] = None,
        mirror: bool = False,
    ) -> Future:
        """Enqueue one frame; returns a Future of the (J, 3) mm joints."""
        if not self._running:
            raise RuntimeError("server is closed")
        if self._sharded and (cube is not None or mirror):
            raise ValueError(
                "per-request cube/mirror need a single-device "
                "FusedEstimator (the sharded pipeline is fixed-config)"
            )
        d = np.asarray(depth, np.float32)
        c = np.asarray(com, np.float32)
        if d.ndim != 2 or c.shape != (3,):
            raise ValueError(
                f"bad request shapes: depth {d.shape} (want (H, W)), "
                f"com {c.shape} (want (3,))"
            )
        fut: Future = Future()
        req = _Request(
            depth=d,
            com=c,
            cube=None if cube is None else np.asarray(cube, np.float32),
            mirror=bool(mirror),
            future=fut,
        )
        with self._submit_lock:
            if not self._running:
                raise RuntimeError("server is closed")
            # all requests of a batch np.stack together (and share ONE
            # compiled program), so the frame resolution is a server-wide
            # invariant: rejecting a stray resolution HERE fails only
            # that caller instead of erroring every future co-batched
            # with it.  The pin comes from the estimator's camera (or an
            # explicit frame_shape) at construction; in the cameraless
            # fallback it only commits after a batch SUCCEEDS, so a bad
            # early request cannot poison the server lifetime.
            pin = self._frame_shape or self._tentative_shape
            if pin is None:
                self._tentative_shape = d.shape
            elif d.shape != pin:
                raise ValueError(
                    f"frame shape {d.shape} does not match this server's "
                    f"{pin}"
                )
            self._q.put(req)
        return fut

    def close(self):
        """Drain outstanding requests, then stop the collector thread."""
        with self._submit_lock:
            if not self._running:
                return
            self._running = False
            self._q.put(None)  # wake the collector
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------
    def _collect(self):
        """Block for the first request, then gather until the batch is
        full or ``max_wait_ms`` passed.  Returns (requests, stop)."""
        items = []
        stop = False
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return items, stop
        if first is None:
            return items, True
        items.append(first)
        deadline = time.monotonic() + self.max_wait_s
        while len(items) < self.max_batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except queue.Empty:
                break
            if nxt is None:
                stop = True
                break
            items.append(nxt)
        return items, stop

    def _loop(self):
        while True:
            items, stop = self._collect()
            # group by frame shape: submit() pins one resolution, but in
            # the cameraless fallback a FAILED batch clears the tentative
            # pin while same-shape requests may still be queued — a new
            # submit can then re-pin a different shape, and one mixed
            # np.stack batch would fail every co-batched caller.  Running
            # one batch per shape group keeps failures to their own shape.
            groups: dict = {}
            for r in items:
                groups.setdefault(r.depth.shape, []).append(r)
            for shape, grp in groups.items():
                try:
                    self._run_batch(grp)
                    if self._frame_shape is None:
                        # cameraless fallback: the shape is proven good
                        with self._submit_lock:
                            self._frame_shape = shape
                            self._tentative_shape = None
                except Exception as e:  # resolve callers, keep serving
                    self.stats["errors"] += 1
                    if self._frame_shape is None:
                        # never commit a shape that failed: let the next
                        # caller re-propose one
                        with self._submit_lock:
                            self._tentative_shape = None
                    for r in grp:
                        if not r.future.done():
                            r.future.set_exception(e)
            if stop:
                # drain anything enqueued after the close() sentinel
                while True:
                    try:
                        r = self._q.get_nowait()
                    except queue.Empty:
                        return
                    if r is not None:
                        r.future.set_exception(
                            RuntimeError("server closed")
                        )

    def _run_batch(self, items):
        import jax.numpy as jnp

        n = len(items)
        pad = self.max_batch - n
        # tail-pad by repeating the last request (netbase.py:290-296
        # semantics); padded rows are computed and discarded
        depth = np.stack(
            [r.depth for r in items] + [items[-1].depth] * pad
        )
        com = np.stack([r.com for r in items] + [items[-1].com] * pad)
        if self._sharded:  # ShardedEstimator shards + holds variables
            joints, _, _ = self.est(depth, com)
            self._resolve(items, np.asarray(joints))
            return
        default_cube = np.asarray(self.est.cube, np.float32)
        any_cube = any(r.cube is not None for r in items)
        any_mirror = any(r.mirror for r in items)
        if any_cube or any_mirror:
            cube = np.stack(
                [
                    default_cube if r.cube is None else r.cube
                    for r in items
                ]
                + [default_cube] * pad
            )
            mirror = np.asarray(
                [r.mirror for r in items] + [False] * pad, bool
            )
            joints, _, _ = self.est(
                self.variables,
                jnp.asarray(depth),
                jnp.asarray(com),
                cube=cube,
                mirror=mirror,
            )
        else:
            joints, _, _ = self.est(
                self.variables, jnp.asarray(depth), jnp.asarray(com)
            )
        # one host fetch resolves the whole batch (the only reliable
        # completion barrier through remote PJRT backends, CLAUDE.md)
        self._resolve(items, np.asarray(joints))

    def _resolve(self, items, joints_np):
        self.stats["frames"] += len(items)
        self.stats["batches"] += 1
        for i, r in enumerate(items):
            r.future.set_result(joints_np[i])

    # ------------------------------------------------------------------
    def occupancy(self) -> float:
        """Realized mean batch fill fraction (1.0 = every batch full)."""
        b = self.stats["batches"]
        if not b:
            return 0.0
        return self.stats["frames"] / (b * self.max_batch)
