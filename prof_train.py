"""Large synthetic accuracy run: 12k kinematic hands, 100 epochs."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import fit_pose_prior
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer

cam = NYU_CAMERA
t0=time.time()
train_seq = make_sequence(cam, 49152, num_joints=14, seed=1)
test_seq = make_sequence(cam, 512, num_joints=14, seed=99)
print(f"synth gen {time.time()-t0:.0f}s", flush=True)
data = TrainData.from_sequence(train_seq)
test = TrainData.from_sequence(test_seq)
rng = np.random.default_rng(23455)
prior = fit_pose_prior(cam, rng, data.gt3d_crop, data.com, data.cube, 30, num_poses=1000000)
model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
cfg = TrainConfig(batch_size=128, learning_rate=0.001, n_epochs=100,
                  aug_modes=("com","rot","none"), eval_every=10)
trainer = Trainer(model, cfg, cam, prior=prior)
state = trainer.init_state(data.crops[:128])
t0=time.time()
state, hist = trainer.fit(state, data, val_data=test)
print(f"train {time.time()-t0:.0f}s", flush=True)
print("TEST:", trainer.evaluate(state, test), flush=True)
