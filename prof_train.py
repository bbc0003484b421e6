"""ScaleNet com_refine accuracy probe: CoM error before/after CNN refinement."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import ScaleNet, ScaleNetConfig
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer

cam = NYU_CAMERA
t0=time.time()
train_seq = make_sequence(cam, 8192, num_joints=14, seed=5, docom=True)
test_seq = make_sequence(cam, 512, num_joints=14, seed=77, docom=True)
print(f"gen {time.time()-t0:.0f}s", flush=True)

def refine_data(seq):
    d = TrainData.from_sequence(seq)
    return d._replace(gt3d_crop=np.asarray(d.gt3d_crop)[:, 0:1, :])  # palm joint offset

data = refine_data(train_seq)
test = refine_data(test_seq)
model = ScaleNet(ScaleNetConfig(num_joints=1, n_dims=3))
cfg = TrainConfig(batch_size=64, learning_rate=0.0005, n_epochs=60,
                  aug_modes=("com","rot","none"), eval_every=10)
trainer = Trainer(model, cfg, cam, prior=None)
state = trainer.init_state(data.crops[:64])
t0=time.time()
state, hist = trainer.fit(state, data, val_data=test)
print(f"train {time.time()-t0:.0f}s", flush=True)
pred = trainer.predict(state, np.asarray(test.crops))  # (N,3) normalized offsets
cube_z = np.asarray(test.cube)[:, 2][:, None]
offset_mm = pred * (cube_z / 2.0)
gt_mm = np.asarray(test.gt3d_crop)[:, 0, :]
before = np.linalg.norm(gt_mm, axis=1).mean()
after = np.linalg.norm(gt_mm - offset_mm, axis=1).mean()
print(f"CoM error raw {before:.2f}mm -> CNN-refined {after:.2f}mm", flush=True)
