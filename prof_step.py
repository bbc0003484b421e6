"""Decompose the training step cost: gather+augment vs fwd/bwd vs optimizer.

Times epoch-scan variants (full, no-aug, aug-only, fwdbwd-only) with the
host-fetch barrier (CLAUDE.md: block_until_ready does not block here).
"""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import fit_pose_prior
from deepprior_tpu.ops.augment import augment_batch
from deepprior_tpu.train.trainer import Trainer, TrainConfig, TrainData

cam = NYU_CAMERA
rng = np.random.default_rng(1)
seq = make_sequence(cam, 4096, num_joints=14, seed=1)
data = TrainData.from_sequence(seq)
prior = fit_pose_prior(cam, rng, data.gt3d_crop, data.com, data.cube,
                       n_components=30, num_poses=20000,
                       aug_modes=("com", "rot", "none"))
N = data.crops.shape[0]
B = 128
steps = N // B
print(f"{N} frames, {steps} steps/epoch, batch {B}", flush=True)

model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30,
                                    dtype=jnp.bfloat16, packed_conv=True))


def put(d):
    def p(a, n=256):
        a = np.asarray(a)
        if a.ndim == 0 or a.shape[0] != N:
            return jnp.asarray(a)
        parts = [jnp.asarray(a[i:i + n]) for i in range(0, a.shape[0], n)]
        return jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]
    return jax.tree.map(p, d)


d = put(data)
np.asarray(jax.tree.leaves(d)[0].ravel()[:1])
key = jax.random.key(0)
idxs = jnp.arange(steps * B, dtype=jnp.int32).reshape(steps, B)
lr = jnp.float32(1e-3)


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1].ravel()[:1])
    t0 = time.perf_counter(); np.asarray(jax.tree.leaves(out)[-1].ravel()[:1])
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1].ravel()[:1])
    el = (time.perf_counter() - t0 - rtt) / iters
    print(f"{name:28s}: epoch {el*1000:7.1f} ms, {el/steps*1000:7.3f} ms/step, "
          f"{N/el:8.0f} frames/s", flush=True)
    return el


# 1) full step (baseline)
cfg = TrainConfig(batch_size=B, n_epochs=1, aug_modes=("com", "rot", "none"))
tr = Trainer(model, cfg, cam, prior=prior)
ep = tr._build_epoch_fn()

def mk_epoch_runner(ep_fn):
    holder = {"state": tr.init_state(np.asarray(data.crops[:B]))}
    def run():
        holder["state"], costs = ep_fn(holder["state"], key, idxs, d, lr)
        return costs
    return run

full = timeit("full (aug+fwdbwd+opt)", mk_epoch_runner(ep))

# 2) no augmentation
cfg0 = TrainConfig(batch_size=B, n_epochs=1, aug_modes=())
tr0 = Trainer(model, cfg0, cam, prior=prior)
tr0.prior = prior
ep0 = tr0._build_epoch_fn()
noaug = timeit("no-aug (fwdbwd+opt)", mk_epoch_runner(ep0))

# 3) augment-only scan (gather + augment + targets, no model)
def aug_only_epoch(key, idxs, data):
    def body(carry, idx):
        key, acc = carry
        key, aug_key = jax.random.split(key)
        crops = jnp.take(data.crops, idx, axis=0)
        gt3d = jnp.take(data.gt3d_crop, idx, axis=0)
        com = jnp.take(data.com, idx, axis=0)
        cube = jnp.take(data.cube, idx, axis=0)
        m = jnp.take(data.m, idx, axis=0)
        crops, labels_norm, com, cube, m = augment_batch(
            aug_key, crops, gt3d, com, cube, m, cam,
            aug_modes=("com", "rot", "none"))
        y = tr._targets(labels_norm)
        acc = acc + jnp.sum(crops[:, ::37, ::37]) + jnp.sum(y[:, :2])
        return (key, acc), acc
    (_, acc), accs = jax.lax.scan(body, (key, jnp.float32(0)), idxs)
    return accs

aug_fn = jax.jit(aug_only_epoch)
augonly = timeit("aug-only (gather+warp+tgt)", lambda: aug_fn(key, idxs, d))

# 4) gather-only scan
def gather_only_epoch(key, idxs, data):
    def body(carry, idx):
        acc = carry
        crops = jnp.take(data.crops, idx, axis=0)
        gt3d = jnp.take(data.gt3d_crop, idx, axis=0)
        acc = acc + jnp.sum(crops[:, ::37, ::37]) + jnp.sum(gt3d[:, :1])
        return acc, acc
    acc, accs = jax.lax.scan(body, jnp.float32(0), idxs)
    return accs

g_fn = jax.jit(gather_only_epoch)
gonly = timeit("gather-only", lambda: g_fn(key, idxs, d))

print(f"\nimplied fwdbwd+opt ~ {noaug/steps*1000:.3f} ms/step; "
      f"aug-machinery ~ {(full-noaug)/steps*1000:.3f} ms/step; "
      f"aug-only measured {augonly/steps*1000:.3f} ms/step "
      f"(gather {gonly/steps*1000:.3f})", flush=True)
