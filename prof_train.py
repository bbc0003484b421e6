import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.ops.augment import augment_batch
from deepprior_tpu.prior import fit_pose_prior
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer

cam = NYU_CAMERA
seq = make_sequence(cam, 128, num_joints=14, seed=3)
base = TrainData.from_sequence(seq)
reps = 8192 // 128
data = TrainData(*(np.tile(a, (reps,)+(1,)*(a.ndim-1)) for a in base))
B = 128

crops = jnp.asarray(data.crops[:B]); gt3d = jnp.asarray(data.gt3d_crop[:B])
com = jnp.asarray(data.com[:B]); cube = jnp.asarray(data.cube[:B]); m = jnp.asarray(data.m[:B])

def timeit(name, fn, *args, iters=20):
    t0=time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    print(f"{name}: first {time.perf_counter()-t0:.1f}s", flush=True)
    t0=time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms", flush=True)
    return out

aug_p = jax.jit(lambda k: augment_batch(k, crops, gt3d, com, cube, m, cam, aug_modes=("com","rot","none"), use_pallas=True)[0])
out_p = timeit("augment_pallas", aug_p, jax.random.key(0))
aug_g = jax.jit(lambda k: augment_batch(k, crops, gt3d, com, cube, m, cam, aug_modes=("com","rot","none"), use_pallas=False)[0])
out_g = timeit("augment_gather", aug_g, jax.random.key(0))
print("pallas vs gather:", float(jnp.mean(jnp.abs(out_p-out_g) > 1e-5)), flush=True)

# full training epoch timing (8192 frames, pallas warp auto on TPU)
rng = np.random.default_rng(23455)
prior = fit_pose_prior(cam, rng, base.gt3d_crop, base.com, base.cube, 30, num_poses=20000)
model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
cfg = TrainConfig(batch_size=128, learning_rate=0.001, n_epochs=4, aug_modes=("com","rot","none"))
trainer = Trainer(model, cfg, cam, prior=prior)
state = trainer.init_state(data.crops[:128])
t0=time.time()
state, hist = trainer.fit(state, data, n_epochs=4)
dt = time.time()-t0
steps = len(hist["train_cost"])
print(f"{steps} steps in {dt:.1f}s -> {steps*128/dt:.0f} frames/s (incl. compile)", flush=True)
