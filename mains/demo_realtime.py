"""Realtime pipeline demo (reference src/test_realtimepipeline.py): drives
the fused estimator from a camera device (synthetic, file-replay, or the
native capture shim) and reports fps.

Run: python mains/demo_realtime.py --frames 100
     python mains/demo_realtime.py --device capture --frames 100
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# pins jax_platforms to $JAX_PLATFORMS (the sitecustomize-registered axon
# backend ignores the env var alone) and enables the compilation cache
import common  # noqa: F401,E402

if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--device", default="synthetic",
                   choices=["synthetic", "capture"],
                   help="camera source")
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--threaded", action="store_true")
    p.add_argument("--checkpoint", default=None,
                   help="trained network_prior.ckpt (random weights if absent)")
    p.add_argument("--ref-pickle", default=None,
                   help="a reference-trained .pkl[.gz] net (e.g. the "
                        "network_prior.pkl a reference main saved): loads "
                        "directly via utils.refweights, head config "
                        "inferred from the pickle")
    p.add_argument("--model", default="poseregnet",
                   choices=["poseregnet", "resnet"],
                   help="resnet mirrors the reference realtime demo "
                        "(test_realtimepipeline.py: ResNet type 1)")
    p.add_argument("--save-view", default=None,
                   help="save the final annotated frame (front view + "
                        "status bar | rotated side view) as a PNG")
    p.add_argument("--comref", action="store_true",
                   help="enable ScaleNet CNN CoM refinement in the detect "
                        "path (the reference's comrefNet)")
    p.add_argument("--comref-pickle", default=None,
                   help="reference-trained ScaleNet comrefNet .pkl[.gz] "
                        "(implies --comref; random weights otherwise)")
    args = p.parse_args()

    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.realtime.camera import CaptureDevice, SyntheticDevice
    from deepprior_tpu.realtime.fused import FusedEstimator
    from deepprior_tpu.realtime.pipeline import RealtimeHandposePipeline

    cam = NYU_CAMERA
    # shared checkpoint/ref-pickle/random-prior resolution (common.py keeps
    # the tree layout in one place for every serving entry point)
    model, variables, prior = common.load_serving_net(
        args.model, ref_pickle=args.ref_pickle, checkpoint=args.checkpoint
    )

    if args.device == "capture":
        lib = os.path.join(os.path.dirname(__file__), "..", "deepprior_tpu",
                           "cpp", "libcapture.so")
        device = CaptureDevice(lib, mode="synthetic", fps=60.0)
        # the shim's camera differs from NYU; run with its intrinsics
        # (reference cameradevice.py getDepthIntrinsics surface)
        device.start()
        try:
            cam = device.getDepthIntrinsics()
        finally:
            device.stop()  # process_video restarts the device itself
    else:
        device = SyntheticDevice(cam, seed=0)

    est = FusedEstimator(model, cam, prior=prior)
    com_refiner = None
    if args.comref or args.comref_pickle:
        from deepprior_tpu.models import ScaleNet, ScaleNetConfig
        from deepprior_tpu.ops.refine_cnn import CNNComRefiner

        refine_model = ScaleNet(ScaleNetConfig(num_joints=1, n_dims=3))
        if args.comref_pickle:
            # the reference demo loads a trained comrefNet pickle
            # (test_realtimepipeline.py:71-77)
            from deepprior_tpu.utils.refweights import (
                load_reference_pickle,
                scalenet_params_from_reference,
            )

            refine_vars = scalenet_params_from_reference(
                load_reference_pickle(args.comref_pickle)
            )
        else:
            import jax
            import jax.numpy as jnp

            refine_vars = refine_model.init(
                jax.random.key(1), jnp.zeros((1, 128, 128, 1))
            )
        com_refiner = CNNComRefiner(refine_model, refine_vars, cam)
    pipe = RealtimeHandposePipeline(
        est, variables,
        {"fx": cam.fx, "fy": cam.fy, "cube": (250.0, 250.0, 250.0)},
        com_refiner=com_refiner,
    )

    runner = pipe.process_video_threaded if args.threaded else pipe.process_video
    results = runner(device, max_frames=args.frames)
    if results:
        print(f"processed {len(results)} frames, fps={results[-1]['fps']:.1f} "
              f"(detect {pipe.times['detect'] * 1000:.1f}ms, "
              f"pose {pipe.times['pose'] * 1000:.1f}ms)")
        last = results[-1]
        if "frame" not in last:  # threaded results carry no frame; refetch
            ok, f = device.getDepth() if hasattr(device, "getDepth") else (False, None)
            if ok:
                last = dict(last, frame=f)
        if "frame" in last and args.save_view:
            # the reference shows front view + status bar and the rotated
            # side view (realtimehandposepipeline.py:372-492)
            front = pipe.add_status_bar(pipe.show(last))
            side = pipe.show_side(last)
            canvas = np.zeros(
                (max(front.shape[0], side.shape[0]),
                 front.shape[1] + side.shape[1], 3), np.uint8)
            canvas[: front.shape[0], : front.shape[1]] = front
            canvas[: side.shape[0], front.shape[1]:] = side
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.imsave(args.save_view, canvas)
            print(f"saved view to {args.save_view}")
    else:
        print("no frames processed")
