"""TPU probe: frozen serving artifacts on the real device.

Phase 'export' (first process): build the TPU estimator (Pallas crop),
export both artifact kinds, report whether jax.export can serialize the
Mosaic custom call, and time a reference first-frame-from-cold (jit
compile path) for comparison.

Phase 'load' (second process, fresh): load the compiled artifact and time
load + first frame — the restart-latency claim (zero retrace/compile).

Run:  python prof_artifact_tpu.py export && python prof_artifact_tpu.py load
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

ART_C = "/tmp/art_tpu_compiled.dpx"
ART_S = "/tmp/art_tpu_stablehlo.dpx"
B = 64


def inputs():
    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.data.synthetic import make_frame

    rng = np.random.default_rng(5)
    fr = [make_frame(NYU_CAMERA, rng, num_joints=14) for _ in range(8)]
    depth = np.tile(
        np.stack([f.extraData["dpt_full"] for f in fr]), (B // 8, 1, 1)
    ).astype(np.float32)
    com = np.tile(np.stack([f.com for f in fr]), (B // 8, 1)).astype(
        np.float32
    )
    return depth, com


def build():
    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.realtime.fused import FusedEstimator

    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    est = FusedEstimator(model, NYU_CAMERA)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1)), train=False
    )
    return est, variables


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "export"
    print(f"backend: {jax.default_backend()}", flush=True)
    depth, com = inputs()

    if phase == "export":
        from deepprior_tpu.realtime import export as xp

        est, variables = build()
        print(f"crop_method: {est.crop_method}", flush=True)
        ref = None
        t0 = time.perf_counter()
        ref = np.asarray(
            est(variables, jnp.asarray(depth), jnp.asarray(com))[0]
        )
        print(f"live pipeline first frame (jit+compile): "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        np.save("/tmp/art_tpu_ref.npy", ref)

        for plats in (("cpu", "tpu"), ("tpu",)):
            try:
                t0 = time.perf_counter()
                xp.export_serving(
                    est, variables, B, depth.shape[1:], ART_S,
                    platforms=plats,
                )
                print(f"stablehlo export {plats} ok "
                      f"({time.perf_counter()-t0:.1f}s)", flush=True)
                fn, _ = xp.load_serving(ART_S)
                got = np.asarray(fn(depth, com)[0])
                print(f"stablehlo artifact {plats} bitexact: "
                      f"{(got == ref).all()}", flush=True)
            except Exception as e:
                print(f"stablehlo export {plats} FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)

        try:
            t0 = time.perf_counter()
            xp.precompile_serving(est, variables, B, depth.shape[1:], ART_C)
            print(f"compiled export ok ({time.perf_counter()-t0:.1f}s)",
                  flush=True)
        except Exception as e:
            print(f"compiled export FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
        return

    # phase == "load": fresh process, compiled artifact restart latency
    from deepprior_tpu.realtime.export import load_precompiled

    ref = np.load("/tmp/art_tpu_ref.npy")
    t0 = time.perf_counter()
    fn, meta = load_precompiled(ART_C)
    t_load = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = np.asarray(fn(depth, com)[0])
    t_first = time.perf_counter() - t0
    print(f"compiled artifact: load {t_load:.2f}s, first frame "
          f"{t_first:.2f}s, bitexact: {(got == ref).all()}", flush=True)


if __name__ == "__main__":
    main()
