"""Multi-host initialization for pod-scale training.

The reference has no distributed backend at all (SURVEY.md §2.8); this is
the thin entry point the TPU framework uses on multi-host pods: call
`initialize()` once per host process before any jax computation, then
build a global ('dp', 'tp') mesh over all devices.  On a single host both
are no-ops/equivalent to parallel.mesh.make_mesh.

Untestable in this single-host image; kept minimal and side-effect-free
until called.
"""

from __future__ import annotations

from typing import Optional

import jax

from deepprior_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize with env-based autodetection.

    On TPU pods the arguments autodetect from the runtime environment;
    pass them explicitly for other launchers.
    """
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(tp: int = 1, slices: int = 1):
    """('dp', 'tp') — or ('dcn', 'dp', 'tp') — mesh over every device of
    every host.

    Inside a host, 'tp' maps to intra-host/ICI-adjacent devices (fast
    collectives).  On a multi-slice pod pass slices=n_slices: the batch
    shards over ('dcn', 'dp') and XLA splits the gradient all-reduce into
    an in-slice ICI phase plus one cross-slice DCN phase; 'tp' never
    crosses DCN.
    """
    return make_mesh(devices=jax.devices(), tp=tp, slices=slices)


def process_local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-indexed batch this host should feed.

    Hosts feed only their local shard of the dp axis; with GSPMD the
    per-host arrays combine into the global sharded batch.
    """
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
