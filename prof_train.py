"""Realtime pipeline fps on TPU: host detect + fused device estimate."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import PCAPrior
from deepprior_tpu.realtime.camera import SyntheticDevice
from deepprior_tpu.realtime.fused import FusedEstimator
from deepprior_tpu.realtime.pipeline import RealtimeHandposePipeline

cam = NYU_CAMERA
model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
variables = model.init(jax.random.key(0), jnp.zeros((1,128,128,1)))
rng = np.random.default_rng(0)
prior = PCAPrior(rng.standard_normal((30,42)).astype(np.float32)*0.05, np.zeros(42, np.float32))
est = FusedEstimator(model, cam, prior=prior)
pipe = RealtimeHandposePipeline(est, variables, {"fx": cam.fx, "fy": cam.fy, "cube": (250.,250.,250.)})
dev = SyntheticDevice(cam, seed=0)
res = pipe.process_video(dev, max_frames=60)
print(f"single-loop: {len(res)} frames, fps {res[-1]['fps']:.1f}, "
      f"detect {pipe.times['detect']*1000:.1f}ms pose {pipe.times['pose']*1000:.1f}ms", flush=True)
pipe.tracking = True
res = pipe.process_video(dev, max_frames=60)
print(f"tracking: fps {res[-1]['fps']:.1f}, detect {pipe.times['detect']*1000:.1f}ms "
      f"pose {pipe.times['pose']*1000:.1f}ms", flush=True)
res = pipe.process_video_threaded(dev, max_frames=60)
print(f"threaded: {len(res)} results, fps {res[-1]['fps']:.1f}", flush=True)
