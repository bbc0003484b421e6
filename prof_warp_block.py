"""A/B probe: K-samples-per-grid-step warp kernel (block_k) vs the
per-sample default, measured INSIDE the real jitted train scan.

Why this probe exists despite the r4 crop block_k wash: the crop's
K-blocked variant still issued K separate band DMAs (each sample's band
starts at a different frame offset), so blocking only amortized grid-step
orchestration — measured as not the bottleneck.  Warp patches are
batch-CONTIGUOUS: a (K, H, W) block is ONE HBM->VMEM descriptor, so
block_k here amortizes the per-DMA fixed cost the crop probe could not
touch.  The warp runs at ~3 us/sample = ~3% of HBM peak (64 KB/sample),
i.e. almost purely fixed-cost-bound — exactly the regime where fewer,
bigger DMAs should win.

Variants, host-fetch barrier, interleaved reps (CLAUDE.md timing rules):
  A) full step, block_k=None   (per-sample kernel, r5 default)
  B) full step, block_k=4
  C) full step, block_k=8
  D) full step, block_k=16
  E) no-aug step (fwd/bwd+ADAM floor, context)
  F/G) aug-only scans of A and C (isolates the machinery)

Run on the real TPU: python prof_warp_block.py [batch] [n_frames]
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


def make_runner(block_k, aug=True):
    cfg = TrainConfig(batch_size=B, n_epochs=1,
                      aug_modes=("com", "rot", "none") if aug else (),
                      aug_block_k=block_k)
    tr = Trainer(model, cfg, cam, prior=prior)
    ep = tr._build_epoch_fn()
    holder = {"state": tr.init_state(np.asarray(data.crops[:B]))}

    def run():
        holder["state"], costs = ep(holder["state"], key, idxs, d, jnp.float32(1e-3))
        return costs
    return run, tr


run_a, tr_a = make_runner(None)
run_b, _ = make_runner(4)
run_c, _ = make_runner(8)
run_d, _ = make_runner(16)
run_e, _ = make_runner(None, aug=False)


def aug_only(block_k):
    def epoch(key, idxs, data):
        def body(carry, idx):
            k, acc = carry
            k, ak = jax.random.split(k)
            batch = {n: jnp.take(getattr(data, n), idx, axis=0)
                     for n in ("crops", "gt3d_crop", "com", "cube", "m")}
            crops, labels_norm, com, cube, m = augment_batch(
                ak, batch["crops"], batch["gt3d_crop"], batch["com"],
                batch["cube"], batch["m"], cam,
                aug_modes=("com", "rot", "none"), block_k=block_k)
            y = tr_a._targets(labels_norm)
            acc = acc + jnp.sum(crops[:, ::37, ::37]) + jnp.sum(y[:, :2])
            return (k, acc), acc
        (_, acc), accs = jax.lax.scan(body, (key, jnp.float32(0)), idxs)
        return accs
    f = jax.jit(epoch)
    return lambda: f(key, idxs, d)


aug_f = aug_only(None)
aug_g = aug_only(8)


def fetch(out):
    np.asarray(jax.tree.leaves(out)[-1].ravel()[:1])


def warm(name, fn):
    t0 = time.perf_counter()
    fetch(fn())
    print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)


KEYS = "ABCDEFG"
fns = {"A": run_a, "B": run_b, "C": run_c, "D": run_d, "E": run_e,
       "F": aug_f, "G": aug_g}
labels = {"A": "full step block_k=None", "B": "full step block_k=4",
          "C": "full step block_k=8", "D": "full step block_k=16",
          "E": "no-aug (fwd/bwd+ADAM)", "F": "aug-only block_k=None",
          "G": "aug-only block_k=8"}
for k in KEYS:
    warm(labels[k], fns[k])

REPS = 8
res = {k: [] for k in KEYS}
out = run_a(); fetch(out)
t0 = time.perf_counter(); fetch(out)
rtt = time.perf_counter() - t0
for r in range(REPS):
    for k in KEYS:
        t0 = time.perf_counter()
        fetch(fns[k]())
        res[k].append(time.perf_counter() - t0 - rtt)
    print(f"rep {r}: " + " ".join(
        f"{k}={res[k][-1] * 1000:.1f}ms" for k in KEYS), flush=True)

print()
med = {k: float(np.median(v)) for k, v in res.items()}
for k in KEYS:
    el = med[k]
    print(f"{labels[k]:26s}: epoch {el * 1000:7.1f} ms, "
          f"{el / steps * 1000:7.3f} ms/step, {N / el:8.0f} frames/s",
          flush=True)
best_k, best = min(((k, med[k]) for k in "BCD"), key=lambda t: t[1])
print(f"\nbest blocked: {labels[best_k]} -> {med['A'] / best:.3f}x vs "
      f"per-sample; aug machinery: {(med['A'] - med['E']) / steps * 1000:.3f}"
      f" -> {(best - med['E']) / steps * 1000:.3f} ms/step; aug-only "
      f"{med['F'] / steps * 1000:.3f} -> {med['G'] / steps * 1000:.3f} "
      f"ms/step", flush=True)
