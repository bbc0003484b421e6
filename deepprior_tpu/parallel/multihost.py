"""Multi-host initialization for pod-scale training.

The reference has no distributed backend at all (SURVEY.md §2.8); this is
the thin entry point the TPU framework uses on multi-host pods: call
`initialize()` once per host process before any jax computation, then
build a global ('dp', 'tp') mesh over all devices.  On a single host both
are no-ops/equivalent to parallel.mesh.make_mesh.

Executed for real by tests/test_multihost.py: two jax.distributed CPU
processes (4 virtual devices each) build the global mesh, feed their
process-local batch slices, and run a sharded step.
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
    # do NOT probe jax.process_count() here: it initializes the XLA
    # backend, after which jax.distributed.initialize refuses to run (bug
    # caught by tests/test_multihost.py).  The distributed client handle
    # is the side-effect-free "already initialized" signal.
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return
    except ImportError:  # private module moved; fall through to the call
        pass
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
    count = jax.process_count()
    if global_batch % count:
        # silent truncation would make the hosts jointly feed fewer rows
        # than the global shape expects (shape-mismatch at assembly, or a
        # dropped tail sample every step)
        raise ValueError(
            f"global_batch {global_batch} not divisible by "
            f"process_count {count}"
        )
    per = global_batch // count
    start = per * jax.process_index()
    return slice(start, start + per)
