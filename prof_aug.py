"""Micro-decompose augment_batch: warp kernel vs geometry/elementwise."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.ops.augment import augment_batch, NV_VAL
from deepprior_tpu.ops.crop import warp_patch
from deepprior_tpu.ops.pallas_warp import pallas_warp_patch

cam = NYU_CAMERA
B, H, W = 128, 128, 128
rng = np.random.default_rng(0)
crops = jnp.asarray(rng.random((B, H, W)).astype(np.float32) * 2 - 1)
gt3d = jnp.asarray(rng.random((B, 14, 3)).astype(np.float32) * 100)
com = jnp.asarray(np.stack([rng.uniform(200, 400, B), rng.uniform(150, 300, B),
                            rng.uniform(600, 900, B)], 1).astype(np.float32))
cube = jnp.asarray(np.full((B, 3), 300.0, np.float32))
m = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3)) * 1.0
a = jnp.asarray(
    np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
    + rng.normal(0, 0.01, (B, 3, 3)).astype(np.float32))
key = jax.random.key(0)
np.asarray(crops[0, 0, :1])


def timeit(name, fn, *args, iters=50):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter(); np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    el = (time.perf_counter() - t0 - rtt) / iters
    print(f"{name:34s}: {el*1000:7.3f} ms  ({el/B*1e6:6.2f} us/sample)",
          flush=True)
    return el


f_full = jax.jit(lambda k: augment_batch(
    k, crops, gt3d, com, cube, m, cam, aug_modes=("com", "rot", "none")))
timeit("augment_batch (pallas warp)", f_full, key)

f_gw = jax.jit(lambda k: augment_batch(
    k, crops, gt3d, com, cube, m, cam, aug_modes=("com", "rot", "none"),
    use_pallas=False))
timeit("augment_batch (gather warp)", f_gw, key)

f_pw = jax.jit(lambda x, aa: pallas_warp_patch(x, aa, border=0.0, nv_val=NV_VAL))
timeit("pallas_warp_patch alone", f_pw, crops, a)

f_w = jax.jit(lambda x, aa: warp_patch(x, aa, border=0.0, nv_val=NV_VAL))
timeit("gather warp_patch alone", f_w, crops, a)

# elementwise-only proxy: the unnorm/renorm passes
def elem(x):
    img = x * 150.0 + com[:, 2][:, None, None]
    pm = jnp.max(img, axis=(1, 2))
    d = jnp.where(img == pm[:, None, None], 1.0, img)
    d = jnp.clip(jnp.where(d == 0.0, 1.0, d), -1.0, 2000.0)
    return d / 150.0
timeit("elementwise unnorm+renorm proxy", jax.jit(elem), crops)

# batch scaling of the pallas warp
for b2 in (512, 1024):
    crops2 = jnp.tile(crops, (b2 // B, 1, 1))
    a2 = jnp.tile(a, (b2 // B, 1, 1))
    np.asarray(crops2[0, 0, :1])
    f2 = jax.jit(lambda x, aa: pallas_warp_patch(x, aa, border=0.0,
                                                 nv_val=NV_VAL))
    e = timeit(f"pallas_warp alone B={b2}", f2, crops2, a2)
