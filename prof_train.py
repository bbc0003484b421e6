import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.ops.augment import augment_batch
from deepprior_tpu.train.trainer import TrainData

cam = NYU_CAMERA
seq = make_sequence(cam, 128, num_joints=14, seed=3)
base = TrainData.from_sequence(seq)
reps = 2048 // 128
data = TrainData(*(jnp.asarray(np.tile(a, (reps,)+(1,)*(a.ndim-1))) for a in base))
B = 128
idx = jnp.arange(B)

def timeit(name, fn, *args, iters=20):
    t0=time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    print(f"{name}: first {time.perf_counter()-t0:.1f}s", flush=True)
    t0=time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms", flush=True)
    return out

take = jax.jit(lambda i: tuple(jnp.take(a, i, axis=0) for a in data))
batch = timeit("take_batch", take, idx)
crops, gt3d, com, cube, m = batch

aug = jax.jit(lambda k: augment_batch(k, crops, gt3d, com, cube, m, cam, aug_modes=("com","rot","none"))[0])
timeit("augment(inv3x3)", aug, jax.random.key(0))

model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
variables = model.init(jax.random.key(0), jnp.zeros((1,128,128,1)))
y = jnp.zeros((B,30))
@jax.jit
def fwd(v, x):
    return model.apply({"params": v["params"]}, x[...,None], train=False)
timeit("fwd_only", fwd, variables, crops)
@jax.jit
def fwdbwd(v, x, y):
    def loss(p):
        out = model.apply({"params": p}, x[...,None], train=True, rngs={"dropout": jax.random.key(0)})
        return jnp.mean(jnp.sum((out-y)**2, 1))
    return jax.value_and_grad(loss)(v["params"])
timeit("fwd+bwd", fwdbwd, variables, crops, y)
