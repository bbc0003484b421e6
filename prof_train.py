"""Training-throughput probe on TPU: flagship config over synthetic data."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import fit_pose_prior
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer

cam = NYU_CAMERA
seq = make_sequence(cam, 128, num_joints=14, seed=3)
base = TrainData.from_sequence(seq)
# tile to a realistic dataset size on device: 72k frames like NYU train
reps = 72960 // 128
data = TrainData(
    np.tile(base.crops, (reps, 1, 1)),
    np.tile(base.gt3d_crop, (reps, 1, 1)),
    np.tile(base.com, (reps, 1)),
    np.tile(base.cube, (reps, 1)),
    np.tile(base.m, (reps, 1, 1)),
)
print("dataset:", data.crops.shape, data.crops.nbytes/1e9, "GB")
rng = np.random.default_rng(23455)
prior = fit_pose_prior(cam, rng, base.gt3d_crop, base.com, base.cube, 30, num_poses=20000)
model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
cfg = TrainConfig(batch_size=128, learning_rate=0.001, n_epochs=3,
                  aug_modes=("com", "rot", "none"))
trainer = Trainer(model, cfg, cam, prior=prior)
state = trainer.init_state(data.crops[:128])
t0 = time.time()
state, hist = trainer.fit(state, data, n_epochs=3)
dt = time.time() - t0
steps = len(hist["train_cost"])
print(f"{steps} steps in {dt:.1f}s -> {steps/dt:.1f} steps/s, "
      f"{steps*128/dt:.0f} frames/s, {dt/3:.1f}s/epoch (72.9k frames)")
