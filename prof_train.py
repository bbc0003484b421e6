"""Isolate steady-state train-step time (scan inside one epoch call)."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import fit_pose_prior
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer

cam = NYU_CAMERA
seq = make_sequence(cam, 8192, num_joints=14, seed=3)
data = TrainData.from_sequence(seq)
rng = np.random.default_rng(23455)
prior = fit_pose_prior(cam, rng, data.gt3d_crop, data.com, data.cube, 30, num_poses=20000)
model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
cfg = TrainConfig(batch_size=128, learning_rate=0.001, n_epochs=1, aug_modes=("com","rot","none"))
trainer = Trainer(model, cfg, cam, prior=prior)
state = trainer.init_state(data.crops[:128])
data_dev = jax.tree.map(jnp.asarray, data)
fn = trainer._build_epoch_fn()
steps = 8192 // 128
idxs = jnp.asarray(np.random.default_rng(0).permutation(8192)[: steps*128].reshape(steps, 128))
key = jax.random.key(0)
state, costs = fn(state, key, idxs, data_dev, 0.001)  # compile
jax.block_until_ready(costs)
t0 = time.perf_counter()
for _ in range(5):
    state, costs = fn(state, key, idxs, data_dev, 0.001)
jax.block_until_ready(costs)
dt = (time.perf_counter() - t0) / 5
print(f"epoch of {steps} steps: {dt*1000:.1f} ms -> {dt/steps*1000:.2f} ms/step, "
      f"{steps*128/dt:.0f} frames/s", flush=True)
