"""A/B probe: fused unnorm+warp+renorm augmentation kernel vs the r4
unfused pipeline, measured INSIDE the real jitted train scan (VERDICT r4
item 3 — a measured number, not analogy).

Variants, all timed with the host-fetch barrier (CLAUDE.md:
block_until_ready does not block through the axon tunnel) and interleaved
A/B/A/B to cancel tunnel drift:

  A) full step, aug_fuse_norm=False  (r4 pipeline: XLA unnormalize ->
     pallas warp -> XLA threshold+renormalize; 4 HBM passes over the
     patch batch)
  B) full step, aug_fuse_norm=True   (pallas_warp_norm: one kernel pass)
  C) no-aug step (fwd/bwd+ADAM floor, context)
  D) aug-only scans of both variants (isolates the machinery)

Run on the real TPU: python prof_aug_ab.py [batch] [n_frames]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.ops.augment import augment_batch
from deepprior_tpu.prior import fit_pose_prior
from deepprior_tpu.train.trainer import Trainer, TrainConfig, TrainData

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

print(f"backend: {jax.default_backend()}", flush=True)
cam = NYU_CAMERA
rng = np.random.default_rng(1)
seq = make_sequence(cam, N, num_joints=14, seed=1)
data = TrainData.from_sequence(seq)
prior = fit_pose_prior(cam, rng, data.gt3d_crop, data.com, data.cube,
                       n_components=30, num_poses=20000,
                       aug_modes=("com", "rot", "none"))
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


def make_runner(fuse):
    cfg = TrainConfig(batch_size=B, n_epochs=1,
                      aug_modes=("com", "rot", "none") if fuse is not None
                      else (),
                      aug_fuse_norm=bool(fuse) if fuse is not None else None)
    tr = Trainer(model, cfg, cam, prior=prior)
    ep = tr._build_epoch_fn()
    holder = {"state": tr.init_state(np.asarray(data.crops[:B]))}

    def run():
        holder["state"], costs = ep(holder["state"], key, idxs, d, lr)
        return costs
    return run, tr


run_a, tr_a = make_runner(False)   # unfused (r4)
run_b, tr_b = make_runner(True)    # fused kernel
run_c, _ = make_runner(None)       # no aug


def aug_only(fuse):
    def epoch(key, idxs, data):
        def body(carry, idx):
            k, acc = carry
            k, ak = jax.random.split(k)
            batch = {n: jnp.take(getattr(data, n), idx, axis=0)
                     for n in ("crops", "gt3d_crop", "com", "cube", "m")}
            crops, labels_norm, com, cube, m = augment_batch(
                ak, batch["crops"], batch["gt3d_crop"], batch["com"],
                batch["cube"], batch["m"], cam,
                aug_modes=("com", "rot", "none"), fuse_norm=fuse)
            y = tr_a._targets(labels_norm)
            acc = acc + jnp.sum(crops[:, ::37, ::37]) + jnp.sum(y[:, :2])
            return (k, acc), acc
        (_, acc), accs = jax.lax.scan(body, (key, jnp.float32(0)), idxs)
        return accs
    f = jax.jit(epoch)
    return lambda: f(key, idxs, d)


aug_a = aug_only(False)
aug_b = aug_only(True)


def fetch(out):
    np.asarray(jax.tree.leaves(out)[-1].ravel()[:1])


def warm(name, fn):
    t0 = time.perf_counter()
    fetch(fn())
    print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)


for name, fn in (("A unfused", run_a), ("B fused", run_b),
                 ("C no-aug", run_c), ("D aug-only unfused", aug_a),
                 ("E aug-only fused", aug_b)):
    warm(name, fn)

# interleaved timed reps
REPS = 8
res = {k: [] for k in "ABCDE"}
fns = {"A": run_a, "B": run_b, "C": run_c, "D": aug_a, "E": aug_b}
# fetch round-trip estimate
out = run_a(); fetch(out)
t0 = time.perf_counter(); fetch(out)
rtt = time.perf_counter() - t0
for r in range(REPS):
    for k in "ABCDE":
        t0 = time.perf_counter()
        fetch(fns[k]())
        res[k].append(time.perf_counter() - t0 - rtt)
    print(f"rep {r}: " + " ".join(
        f"{k}={res[k][-1] * 1000:.1f}ms" for k in "ABCDE"), flush=True)

print()
med = {k: float(np.median(v)) for k, v in res.items()}
for k, label in (("A", "full step unfused (r4)"),
                 ("B", "full step FUSED"),
                 ("C", "no-aug (fwd/bwd+ADAM)"),
                 ("D", "aug-only unfused"),
                 ("E", "aug-only fused")):
    el = med[k]
    print(f"{label:26s}: epoch {el * 1000:7.1f} ms, "
          f"{el / steps * 1000:7.3f} ms/step, {N / el:8.0f} frames/s",
          flush=True)
print(f"\nfused step speedup: {med['A'] / med['B']:.3f}x; "
      f"aug machinery: unfused {(med['A'] - med['C']) / steps * 1000:.3f} "
      f"-> fused {(med['B'] - med['C']) / steps * 1000:.3f} ms/step; "
      f"aug-only {med['D'] / steps * 1000:.3f} -> "
      f"{med['E'] / steps * 1000:.3f} ms/step", flush=True)
