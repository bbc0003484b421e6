"""ResNet-47 on TPU: fused inference fps + batch-1 latency + train step."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence, make_frame
from deepprior_tpu.models import ResNet, ResNetConfig
from deepprior_tpu.prior import PCAPrior, fit_pose_prior
from deepprior_tpu.realtime.fused import FusedEstimator
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer

cam = NYU_CAMERA
rng = np.random.default_rng(0)
frames = [make_frame(cam, rng) for _ in range(8)]
depth8 = np.stack([f.extraData["dpt_full"] for f in frames]).astype(np.float32)
com8 = np.stack([f.com for f in frames]).astype(np.float32)

model = ResNet(ResNetConfig(num_joints=1, n_dims=30, dtype=jnp.bfloat16))
variables = model.init(jax.random.key(0), jnp.zeros((1,128,128,1)))
prior = PCAPrior(rng.standard_normal((30,42)).astype(np.float32)*0.05, np.zeros(42, np.float32))
est = FusedEstimator(model, cam, prior=prior)

B = 512
tile = jax.jit(lambda d, c: (jnp.tile(d, (B//8,1,1)), jnp.tile(c, (B//8,1))))
dd, cc = tile(jnp.asarray(depth8), jnp.asarray(com8))
t0=time.perf_counter(); out = est(variables, dd, cc); jax.block_until_ready(out)
print(f"resnet fused compile+first {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
for _ in range(10): out = est(variables, dd, cc)
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/10
print(f"resnet fused: {dt*1000:.2f} ms/{B}-batch -> {B/dt:.0f} fps", flush=True)

# batch-1 latency (realtime)
d1, c1 = jnp.asarray(depth8[:1]), jnp.asarray(com8[:1])
out = est(variables, d1, c1); jax.block_until_ready(out)
t0=time.perf_counter()
for _ in range(50): out = est(variables, d1, c1)
jax.block_until_ready(out)
print(f"resnet batch-1: {(time.perf_counter()-t0)/50*1000:.2f} ms/frame", flush=True)

# ResNet training step (BN + dropout, f32)
seq = make_sequence(cam, 128, num_joints=14, seed=3)
data = TrainData.from_sequence(seq)
reps = 2048 // 128
data = TrainData(*(np.tile(a, (reps,)+(1,)*(a.ndim-1)) for a in data))
rngn = np.random.default_rng(23455)
prior2 = fit_pose_prior(cam, rngn, data.gt3d_crop[:128], data.com[:128], data.cube[:128], 30, num_poses=10000)
m2 = ResNet(ResNetConfig(num_joints=1, n_dims=30, dropout=True))
cfg = TrainConfig(batch_size=64, learning_rate=0.001, n_epochs=3, aug_modes=("com","rot","none"),
                  model_has_dropout=True)
tr = Trainer(m2, cfg, cam, prior=prior2)
state = tr.init_state(data.crops[:64])
t0=time.time(); state, hist = tr.fit(state, data, n_epochs=1)
print(f"resnet train compile+epoch1: {time.time()-t0:.1f}s", flush=True)
t0=time.time(); state, hist = tr.fit(state, data, n_epochs=2)
steps = 2*(2048//64)
print(f"resnet train steady: {steps*64/(time.time()-t0):.0f} frames/s", flush=True)
