import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import fit_pose_prior
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
print(f"{N} frames, {steps} steps/epoch", flush=True)

import itertools
for packed, dt in ((True, jnp.float32), (True, jnp.bfloat16)):
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30, dtype=dt,
                                        packed_conv=packed))
    cfg = TrainConfig(batch_size=B, n_epochs=1,
                      aug_modes=("com", "rot", "none"))
    tr = Trainer(model, cfg, cam, prior=prior)
    state = tr.init_state(np.asarray(data.crops[:B]))
    def put_chunked(a, n=256):
        a = np.asarray(a)
        if a.ndim == 0 or a.shape[0] != N:
            return jnp.asarray(a)
        parts = [jnp.asarray(a[i:i + n]) for i in range(0, a.shape[0], n)]
        return jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]

    d = jax.tree.map(put_chunked, data)
    np.asarray(jax.tree.leaves(d)[0].ravel()[:1])
    ep = tr._build_epoch_fn()
    key = jax.random.key(0)
    idxs = jnp.arange(steps * B, dtype=jnp.int32).reshape(steps, B)
    lr = jnp.float32(1e-3)
    state, costs = ep(state, key, idxs, d, lr)
    np.asarray(costs[-1:])
    t0 = time.perf_counter(); np.asarray(costs[-1:]); rtt = time.perf_counter() - t0
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, costs = ep(state, key, idxs, d, lr)
    np.asarray(costs[-1:])
    el = (time.perf_counter() - t0 - rtt) / iters
    print(f"packed={packed} dtype={jnp.dtype(dt).name if hasattr(dt, 'dtype') or True else dt}: "
          f"epoch {el*1000:.1f} ms, {el/steps*1000:.3f} ms/step, "
          f"{N/el:.0f} frames/s", flush=True)
