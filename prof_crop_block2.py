"""Rerun probe: per-sample win304 vs blocked k=8 win304, warm cache.

The first prof_crop_block run read 88 ms/batch for the per-sample win304
baseline — inconsistent with bench (231k fps with this exact config
inside FusedEstimator).  Rerun both warm, interleaved, 3 repetitions.
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

variants = {
    "per-sample win304": lambda: pallas_normalized_crop(
        dpt, com, cube, cam.fx, cam.fy, fuse_clamp=True, win_rows=rows
    )[0],
    "blocked k=8 win304": lambda: pallas_normalized_crop(
        dpt, com, cube, cam.fx, cam.fy, fuse_clamp=True, win_rows=rows,
        block_k=8,
    )[0],
    "blocked k=32 win304": lambda: pallas_normalized_crop(
        dpt, com, cube, cam.fx, cam.fy, fuse_clamp=True, win_rows=rows,
        block_k=32,
    )[0],
}
for name, fn in variants.items():
    np.asarray(fn()[-1])  # warm / compile

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
