"""TPU probe: is the per-sample crop cost the STRIDED band DMA?

The production band (304, 512) out of a (480, 640) frame is column-sliced:
304 separate 2 KB row descriptors per sample.  A full-width band
(304, 640) is CONTIGUOUS in HBM (one 778 KB descriptor) at +25% selection
MACs (absorbed by the col-first contraction order).  Full-frame blocks
(480, 640) are also contiguous and need no fits-fallback at all.

Variants (all bit-exact vs the default, asserted):
  a) per-sample win (304, 512)  — production default (strided)
  b) per-sample win (304, 640)  — contiguous band
  c) per-sample win (480, 640)  — contiguous full frame, no cond
  d) blocked k=32 win (304, 640) — contiguous manual DMA
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_frame
from deepprior_tpu.ops.pallas_crop import band_rows_for, pallas_normalized_crop

cam = NYU_CAMERA
B = 512
rng = np.random.default_rng(23455)
fr = [make_frame(cam, rng, num_joints=14) for _ in range(16)]
dpt_u = np.stack([f.extraData["dpt_full"] for f in fr])
com_u = np.stack([f.com for f in fr])
reps = B // 16
tile = jax.jit(lambda d, c: (jnp.tile(d, (reps, 1, 1)), jnp.tile(c, (reps, 1))))
dpt, com = tile(jnp.asarray(dpt_u), jnp.asarray(com_u))
cube = (250.0, 250.0, 250.0)
rows = band_rows_for(cam.fy, cube[2], 500.0)
print(f"B={B}, win_rows={rows}", flush=True)

tiny = jnp.zeros((8, 8))
bump = jax.jit(lambda a: a + 1.0)
np.asarray(bump(tiny))
rtt = min(
    (lambda t: (np.asarray(bump(tiny)), time.perf_counter() - t)[1])(
        time.perf_counter()
    )
    for _ in range(3)
)
print(f"rtt {rtt*1e3:.1f} ms", flush=True)


def crop(**kw):
    return pallas_normalized_crop(
        dpt, com, cube, cam.fx, cam.fy, fuse_clamp=True, **kw
    )[0]


variants = {
    "a per-sample (304,512) strided": lambda: crop(win_rows=rows),
    "b per-sample (304,640) contig": lambda: crop(win_rows=rows, win_cols=640),
    "c per-sample (480,640) fullfrm": lambda: crop(win_rows=480, win_cols=640),
    "d blocked k=32 (304,640) contig": lambda: crop(
        win_rows=rows, win_cols=640, block_k=32
    ),
}
ref = None
for name, fn in variants.items():
    got = np.asarray(fn())  # warm / compile (+ full fetch once)
    if ref is None:
        ref = got
    else:
        assert (got == ref).all(), f"{name} not bit-exact"
        print(f"{name}: bitexact", flush=True)

for rep in range(3):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        for _ in range(30):
            out = fn()
        np.asarray(out[-1])
        dt = (time.perf_counter() - t0 - rtt) / 30
        print(
            f"rep{rep} {name}: {dt*1e3:.3f} ms/batch, "
            f"{dt/B*1e6:.3f} us/sample",
            flush=True,
        )
