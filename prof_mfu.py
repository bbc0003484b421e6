"""MFU accounting probe (runs fully on CPU — no TPU claim).

Counts the executed flops of (a) the fused crop+regress serving pipeline
and (b) the flagship training step via XLA's own HLO cost analysis, adds
the Pallas crop's analytic selection-matmul flops where the kernel is
opaque to the analysis, and divides by the v5e bf16 peak (197 TFLOP/s) at
the step times measured on the real chip (docs/RESULTS.md).

The flop COUNTS are platform-independent (same HLO graph); only the
measured seconds come from the TPU runs, so this probe is safe to run
while a TPU job holds the chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.models import (
    PoseRegNet, PoseRegNetConfig, ResNet, ResNetConfig,
)
from deepprior_tpu.prior import PCAPrior, fit_pose_prior
from deepprior_tpu.realtime.fused import FusedEstimator
from deepprior_tpu.train.trainer import Trainer, TrainConfig, TrainData
from deepprior_tpu.ops.pallas_crop import band_rows_for, window_dims
from deepprior_tpu.utils.flops import (
    crop_selection_flops, mfu_pct, xla_flops,
)

PEAK_V5E = 197.0  # bf16 TFLOP/s per chip
cam = NYU_CAMERA
rng = np.random.default_rng(1)


def report(name, flops, measured_ms, batch):
    m = mfu_pct(flops, measured_ms / 1e3, PEAK_V5E)
    print(f"{name}: {flops/1e9:.3f} GF/call ({flops/batch/1e6:.1f} MF/frame)"
          f" @ {measured_ms:.3f} ms measured -> {m:.2f}% MFU of v5e peak",
          flush=True)


# --- (a) fused serving pipeline, bench default config -------------------
B = 512
prior = PCAPrior(
    components=rng.standard_normal((30, 42)).astype(np.float32) * 0.05,
    mean=np.zeros(42, np.float32),
)
for model_name, mk, ms in (
    ("poseregnet", PoseRegNet(PoseRegNetConfig(
        num_joints=1, n_dims=30, dtype=jnp.bfloat16, packed_conv=True)),
     2.25),   # measured ms/512 (BENCH_r03: 227.9k fps)
    ("resnet", ResNet(ResNetConfig(
        num_joints=1, n_dims=30, dtype=jnp.bfloat16, packed_conv=True)),
     5.90),   # measured ms/512 (86.8k fps)
):
    variables = mk.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    # crop_method='onehot' on CPU: the XLA one-hot path's flops are an
    # upper bound stand-in for nothing — we EXCLUDE it by lowering the
    # model-only tail, then add the Pallas kernel's analytic count
    est = FusedEstimator(mk, cam, prior=prior, refine_iters=0,
                         crop_method="onehot")

    def model_tail(v, crops):
        out = mk.apply(v, crops[..., None], train=False)
        out = jnp.matmul(out, prior.components,
                         precision=jax.lax.Precision.HIGHEST) + prior.mean
        return out

    tail = xla_flops(model_tail, variables, jnp.zeros((B, 128, 128)))
    rows = band_rows_for(cam.fy, 250.0, 500.0)
    win = window_dims(480, 640, rows)
    crop = crop_selection_flops(B, *win)
    print(f"  [{model_name}] model+decode {tail/1e9:.3f} GF, "
          f"pallas crop (win {win}) {crop/1e9:.3f} GF", flush=True)
    report(f"fused {model_name} B={B}", tail + crop, ms, B)

# batch-1 pure-device serving floors (measured 20 us / 60 us)
for model_name, mk, us in (
    ("poseregnet", PoseRegNet(PoseRegNetConfig(
        num_joints=1, n_dims=30, dtype=jnp.bfloat16, packed_conv=True)),
     20.0),
    ("resnet", ResNet(ResNetConfig(
        num_joints=1, n_dims=30, dtype=jnp.bfloat16, packed_conv=True)),
     60.0),
):
    variables = mk.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))

    def model_tail1(v, crops):
        out = mk.apply(v, crops[..., None], train=False)
        return jnp.matmul(out, prior.components,
                          precision=jax.lax.Precision.HIGHEST) + prior.mean

    tail = xla_flops(model_tail1, variables, jnp.zeros((1, 128, 128)))
    crop = crop_selection_flops(1, *window_dims(480, 640, None))
    report(f"batch-1 {model_name}", tail + crop, us / 1e3, 1)

# --- (b) flagship training step, batch 128 -------------------------------
seq = make_sequence(cam, 256, num_joints=14, seed=1)
data = TrainData.from_sequence(seq)
tprior = fit_pose_prior(cam, rng, data.gt3d_crop, data.com, data.cube,
                        n_components=30, num_poses=2000,
                        aug_modes=("com", "rot", "none"))
Bt = 128
model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30,
                                    packed_conv=True))
cfg = TrainConfig(batch_size=Bt, n_epochs=1, aug_modes=("com", "rot", "none"))
tr = Trainer(model, cfg, cam, prior=tprior)
state = tr.init_state(np.asarray(data.crops[:Bt]))
step = tr._build_step_fn()
batch = {
    "crops": jnp.asarray(data.crops[:Bt]),
    "gt3d_crop": jnp.asarray(data.gt3d_crop[:Bt]),
    "com": jnp.asarray(data.com[:Bt]),
    "cube": jnp.asarray(data.cube[:Bt]),
    "m": jnp.asarray(data.m[:Bt]),
}
f = xla_flops(step, state, batch, jax.random.key(0), jnp.float32(1e-3))
# measured 2.560 ms/step with packed_conv (docs/RESULTS.md round 3)
report("train step poseregnet B=128 (f32)", f, 2.560, Bt)
