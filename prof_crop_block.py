"""TPU probe: per-sample pipelined crop kernel vs the K-blocked manual-DMA
variant (_blocked_crop_kernel), bench configuration (B=512, NYU frames,
win_rows=304, fuse_clamp).  Also isolates the col-first selection change.

Timing: host-fetch barrier (block_until_ready does not block through the
axon tunnel), tail-fetch drains the queue, rtt subtracted.
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
rtts = []
for _ in range(3):
    t = time.perf_counter(); np.asarray(bump(tiny))
    rtts.append(time.perf_counter() - t)
rtt = min(rtts)
print(f"rtt {rtt*1e3:.1f} ms", flush=True)


def timeit(name, fn, ref=None, iters=30):
    out = fn()
    got = np.asarray(out)
    if ref is not None:
        exact = (got == ref).all()
        print(f"  {name}: bitexact={bool(exact)}", flush=True)
        assert exact, name
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out[-1])
    dt = (time.perf_counter() - t0 - rtt) / iters
    print(f"  {name}: {dt*1e3:.3f} ms/batch, {dt/B*1e6:.3f} us/sample",
          flush=True)
    return got, dt


# baseline: current per-sample pipeline (col-first refactor included)
ref, t0 = timeit(
    "per-sample (win304, clamp-fused)",
    lambda: pallas_normalized_crop(dpt, com, cube, cam.fx, cam.fy,
                                   fuse_clamp=True, win_rows=rows)[0],
)

for k in (2, 4, 8, 16):
    timeit(
        f"blocked k={k}",
        lambda k=k: pallas_normalized_crop(dpt, com, cube, cam.fx, cam.fy,
                                           fuse_clamp=True, win_rows=rows,
                                           block_k=k)[0],
        ref=ref,
    )

# default window (384 rows) comparison
ref384, _ = timeit(
    "per-sample (win384)",
    lambda: pallas_normalized_crop(dpt, com, cube, cam.fx, cam.fy,
                                   fuse_clamp=True)[0],
)
timeit(
    "blocked k=8 (win384)",
    lambda: pallas_normalized_crop(dpt, com, cube, cam.fx, cam.fy,
                                   fuse_clamp=True, block_k=8)[0],
    ref=ref384,
)
