"""Generate demo artifacts: skeleton overlays + evaluation plots."""
import os
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_sequence
from deepprior_tpu.eval import NYUHandposeEvaluation
from deepprior_tpu.eval.plots import plot_result_3d
from deepprior_tpu.geometry import transform_points_2d_np

out = "docs/artifacts"
cam = NYU_CAMERA
seq = make_sequence(cam, 64, num_joints=14, seed=42, keep_full=True)
gt = np.stack([f.gt3Dorig for f in seq.data])
rng = np.random.default_rng(0)
pred = gt + rng.normal(0, 6.0, gt.shape)   # a plausible "8mm-ish" predictor
hpe = NYUHandposeEvaluation(gt, pred)
hpe.subfolder = out
files = hpe.plotEvaluation("demo", methodName="deepprior_tpu",
                           baseline=[("worse baseline", NYUHandposeEvaluation(gt, gt + rng.normal(0, 14.0, gt.shape)))])
print(files)
f = seq.data[0]
pred_crop = transform_points_2d_np(cam.three_d_to_img_np(pred[0]), f.T)
p = hpe.plotResult(f.dpt, f.gtcrop, pred_crop, name="demo_overlay")
print(p)
pcl = cam.depth_to_pcl(f.extraData["dpt_full"])
# recentre pcl on the hand for the 3D render
p3 = plot_result_3d(hpe, gt[0], pcl, name="demo")
print(p3)
print("mean err of demo predictor:", hpe.getMeanError())
