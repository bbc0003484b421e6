import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.geometry import rotation_matrix_2d
from deepprior_tpu.ops.crop import warp_patch
from deepprior_tpu.ops.pallas_warp import pallas_warp_patch
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import fit_pose_prior
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer

rng = np.random.default_rng(0)
patches = rng.uniform(400., 900., (4,128,128)).astype(np.float32)
angs = [0.0, 33.0, -117.0, 90.0]
ms = np.stack([np.asarray(rotation_matrix_2d(np.array([64.,64.]), a)) for a in angs]).astype(np.float32)
g = np.asarray(jax.jit(warp_patch)(patches, ms))
p = np.asarray(pallas_warp_patch(patches, jnp.asarray(ms)))
print("warp gather vs pallas mismatch:", (g != p).mean(), flush=True)

cam = NYU_CAMERA
seq = make_sequence(cam, 128, num_joints=14, seed=3)
base = TrainData.from_sequence(seq)
reps = 8192 // 128
data = TrainData(*(np.tile(a, (reps,)+(1,)*(a.ndim-1)) for a in base))
rngn = np.random.default_rng(23455)
prior = fit_pose_prior(cam, rngn, base.gt3d_crop, base.com, base.cube, 30, num_poses=20000)
model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
cfg = TrainConfig(batch_size=128, learning_rate=0.001, n_epochs=10, aug_modes=("com","rot","none"))
trainer = Trainer(model, cfg, cam, prior=prior)
state = trainer.init_state(data.crops[:128])
t0=time.time()
state, hist = trainer.fit(state, data, n_epochs=1)   # compile epoch
t_compile = time.time()-t0
t0=time.time()
state, hist = trainer.fit(state, data, n_epochs=9)   # steady state (re-used jit)
dt = time.time()-t0
steps = 9 * (8192 // 128)
print(f"compile+first epoch: {t_compile:.1f}s", flush=True)
print(f"steady: {steps} steps in {dt:.1f}s -> {steps/dt:.2f} steps/s, {steps*128/dt:.0f} frames/s", flush=True)
