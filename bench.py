"""Benchmark: fused crop+regress inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "fused_crop_regress_fps", "value": N, "unit": "fps",
   "vs_baseline": N / 30.0}

Baseline: the reference's realtime pipeline claims > 30 fps on a 2017 GPU
(BASELINE.md; reference realtimehandposepipeline.py:459-462 measures fps at
runtime).  The rebuild target is > 10,000 fps/chip for the fused
crop+regress path (BASELINE.json north star).

The benchmark replays synthetic NYU-sized depth frames (640x480) through
the full fused program: clamp -> cube crop+normalize -> PoseRegNet(30-D
embedding, bf16 compute) -> PCA decode -> denormalize to mm joints.
"""

import json
import time

import numpy as np


def main():
    import os

    import jax

    # honor JAX_PLATFORMS even where a sitecustomize force-registers another
    # backend (the env var alone does not stick; the config API does)
    _plat = os.environ.get("JAX_PLATFORMS")
    if _plat:
        jax.config.update("jax_platforms", _plat)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.data.synthetic import make_frame
    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.prior import PCAPrior
    from deepprior_tpu.realtime.fused import FusedEstimator

    import os

    cam = NYU_CAMERA
    # 512 outperforms 1024 on v5e for this pipeline (measured: 182.6k vs
    # 176.3k fps — the smaller live set keeps the crop windows and conv
    # activations resident); it is also the largest batch whose fresh
    # remote-compile is reliable through this sandbox's axon tunnel
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    n_unique = min(16, batch)
    # BENCH_MODEL=resnet benches the paper's big model instead
    model_name = os.environ.get("BENCH_MODEL", "poseregnet")

    rng = np.random.default_rng(23455)
    frames = [make_frame(cam, rng, num_joints=14) for _ in range(n_unique)]
    depth_u = np.stack([f.extraData["dpt_full"] for f in frames])
    com_u = np.stack([f.com for f in frames])
    reps = batch // n_unique

    # BENCH_PACKED=0 disables the MXU lane-packed conv+pool formulation
    # (models/layers._PackedConvPool — same parameters/arithmetic)
    packed = os.environ.get("BENCH_PACKED", "1") != "0"
    if model_name == "resnet":
        from deepprior_tpu.models import ResNet, ResNetConfig

        model = ResNet(
            ResNetConfig(
                num_joints=1, n_dims=30, dtype=jnp.bfloat16,
                packed_conv=packed,
            )
        )
    else:
        model = PoseRegNet(
            PoseRegNetConfig(
                num_joints=1, n_dims=30, dtype=jnp.bfloat16,
                packed_conv=packed,
            )
        )
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    prior = PCAPrior(
        components=rng.standard_normal((30, 42)).astype(np.float32) * 0.05,
        mean=np.zeros(42, np.float32),
    )
    # the synthetic generator's documented working envelope (hands at
    # z >= 500 mm, data/synthetic.py com_depth_range) lets the Pallas crop
    # use a 304-row banded window instead of 384 (ops.pallas_crop.
    # band_rows_for; out-of-envelope samples would full-frame-fallback)
    min_depth = float(os.environ.get("BENCH_MIN_DEPTH", "500"))
    est = FusedEstimator(model, cam, prior=prior, refine_iters=0,
                         crop_method=os.environ.get("BENCH_CROP", "auto"),
                         min_depth_mm=min_depth or None)

    # ship only the unique frames; tile to the full batch on device
    tile = jax.jit(
        lambda d, c: (jnp.tile(d, (reps, 1, 1)), jnp.tile(c, (reps, 1)))
    )
    depth_d, com_d = tile(jnp.asarray(depth_u), jnp.asarray(com_u))

    # NOTE on timing: on some remote PJRT backends (the axon tunnel)
    # block_until_ready returns before execution finishes; a host fetch of
    # (a slice of) the result is the only reliable completion barrier.
    # Executions are enqueued in order per device, so fetching the last
    # iteration's output forces the whole timed sequence.
    def force(x):
        return np.asarray(x[-1])

    # BENCH_MODE=batch1: realtime serving latency probe.  Reports BOTH the
    # dispatch-inclusive per-call latency (what a host-driven serving loop
    # sees) and the pure device floor (the pipeline looped inside one
    # fori_loop — zero per-call dispatch), decomposing where the time goes.
    if os.environ.get("BENCH_MODE") == "batch1":
        from deepprior_tpu.utils.profiling import (
            device_loop_latency,
            time_batched_inference,
        )

        depth1 = jnp.asarray(depth_u[:1])
        com1 = jnp.asarray(com_u[:1])
        joints, _, _ = est(variables, depth1, com1)
        force(joints)

        call_ms = time_batched_inference(
            lambda d, c: est(variables, d, c)[0], (depth1, com1), iters=50
        )

        # loop-carried drift (x * 1e-32 is numerically zero but not
        # algebraically removable) serializes iterations and defeats
        # loop-invariant hoisting of the pipeline body
        def step(c, v, d, cm):
            j, _, _ = est._pipeline(v, d, cm + c)
            return j[0, 0] * 1e-32

        dev_ms = device_loop_latency(
            step, jnp.zeros(3), iters=200, args=(variables, depth1, com1)
        )
        print(
            json.dumps(
                {
                    "metric": "batch1_serving_ms",
                    "value": round(dev_ms, 4),
                    "unit": "ms/frame (pure device)",
                    "vs_baseline": round((1000.0 / 30.0) / max(dev_ms, 1e-9), 1),
                    "dispatch_inclusive_ms": round(call_ms, 4),
                    "model": model_name,
                }
            )
        )
        return

    # warmup / compile
    joints, _, _ = est(variables, depth_d, com_d)
    force(joints)

    # BENCH_CHECK=1: on-device parity across every crop path (the CPU-mesh
    # tests cover interpret mode; this asserts real Mosaic/XLA lowering)
    if os.environ.get("BENCH_CHECK"):
        from deepprior_tpu.ops.crop import clamp_depth, crop3d
        from deepprior_tpu.ops.pallas_crop import pallas_normalized_crop
        from deepprior_tpu.ops.crop import normalize_crop

        cube = (250.0, 250.0, 250.0)
        dpt_c, _, _ = jax.jit(clamp_depth)(jnp.asarray(depth_u))
        com_j = jnp.asarray(com_u)

        def crop_with(method, use_bilinear=False):
            fn = jax.jit(
                lambda d, c: crop3d(
                    d, c, cube, cam.fx, cam.fy,
                    use_bilinear=use_bilinear, method=method,
                )[0]
            )
            return np.asarray(fn(dpt_c, com_j))

        gather = crop_with("gather")
        onehot = crop_with("onehot")
        assert (gather == onehot).all(), "gather vs onehot mismatch on device"

        pallas_msg = "pallas skipped (non-TPU)"
        if jax.devices()[0].platform == "tpu":
            pallas_norm = np.asarray(
                pallas_normalized_crop(dpt_c, com_j, cube, cam.fx, cam.fy)[0]
            )
            onehot_norm = np.asarray(
                jax.jit(
                    lambda d, c: normalize_crop(
                        crop3d(d, c, cube, cam.fx, cam.fy, method="onehot")[0],
                        c[:, 2], cube[2],
                    )
                )(dpt_c, com_j)
            )
            assert (pallas_norm == onehot_norm).all(), \
                "pallas vs onehot mismatch on device"
            pallas_msg = "pallas==onehot bit-exact"

            # the narrowed dataset-geometry window (bench default path)
            # must stay bit-exact under real Mosaic lowering too
            from deepprior_tpu.ops.pallas_crop import band_rows_for

            rows = band_rows_for(cam.fy, cube[2], 500.0)
            p_win = np.asarray(
                pallas_normalized_crop(
                    dpt_c, com_j, cube, cam.fx, cam.fy, win_rows=rows
                )[0]
            )
            assert (p_win == onehot_norm).all(), \
                f"pallas win_rows={rows} mismatch on device"
            pallas_msg += f", win{rows} bit-exact"

            # ICVL-sized frames take the 160-row banded window; must stay
            # bit-exact vs the XLA one-hot path on device
            from deepprior_tpu.camera import ICVL_CAMERA
            from deepprior_tpu.data.synthetic import make_frame as _mf

            rng_i = np.random.default_rng(77)
            fr_i = [_mf(ICVL_CAMERA, rng_i) for _ in range(8)]
            dpt_i, _, _ = jax.jit(clamp_depth)(
                jnp.asarray(np.stack([f.extraData["dpt_full"] for f in fr_i]))
            )
            com_i = jnp.asarray(np.stack([f.com for f in fr_i]))
            p_icvl = np.asarray(
                pallas_normalized_crop(
                    dpt_i, com_i, cube, ICVL_CAMERA.fx, ICVL_CAMERA.fy
                )[0]
            )
            o_icvl = np.asarray(
                jax.jit(
                    lambda d, c: normalize_crop(
                        crop3d(d, c, cube, ICVL_CAMERA.fx, ICVL_CAMERA.fy,
                               method="onehot")[0],
                        c[:, 2], cube[2],
                    )
                )(dpt_i, com_i)
            )
            assert (p_icvl == o_icvl).all(), "pallas ICVL mismatch on device"

            # in-kernel bilinear vs the XLA two-tap MXU path
            p_bi = np.asarray(
                pallas_normalized_crop(
                    dpt_c, com_j, cube, cam.fx, cam.fy, use_bilinear=True
                )[0]
            )
            o_bi = np.asarray(
                jax.jit(
                    lambda d, c: normalize_crop(
                        crop3d(d, c, cube, cam.fx, cam.fy, method="onehot",
                               use_bilinear=True)[0],
                        c[:, 2], cube[2],
                    )
                )(dpt_c, com_j)
            )
            bi_pal = np.abs(p_bi - o_bi).max()
            assert bi_pal < 1e-3, f"pallas bilinear vs onehot: max {bi_pal}"
            pallas_msg += f", ICVL banded bit-exact, bilinear max|d|={bi_pal:.1e}"

        bi_gather = crop_with("gather", use_bilinear=True)
        bi_onehot = crop_with("onehot", use_bilinear=True)
        bi_err = np.abs(bi_gather - bi_onehot).max()
        assert bi_err < 2e-2, f"bilinear gather vs onehot: max {bi_err}"

        # host-oracle leg: REAL device lowering vs the numpy reference twin
        # (data/detector_np.py) — nearest must be bit-exact.  linear is
        # cv2-exact mod blend ulps on CPU XLA (tests assert rtol 3e-7 /
        # atol 1e-3), but the TPU backend's reciprocal-multiply division
        # can move a half-pixel tap coordinate 1 ulp and flip a floor at
        # tap boundaries, shifting single taps by one source pixel —
        # measured <=0.016 mm on <1% of pixels (r5 BENCH_CHECK runs).
        # Budget 0.05 mm: ~7x below cv2's OWN INTER_LINEAR fixed-point
        # weight quantization (1/2048 -> up to ~0.35 mm across a 700 mm
        # depth edge), so the device path is well inside the reference's
        # intrinsic resize noise.  Documented in docs/PARITY.md §2.2.
        from deepprior_tpu.data.detector_np import HandCropper

        lin_err = 0.0
        for i in range(min(4, gather.shape[0])):
            hc = HandCropper(depth_u[i], cam)
            ref_crop, _, _ = hc.crop_area_3d(com=com_u[i], size=cube)
            assert (gather[i] == ref_crop).all(), \
                f"frame {i}: device nearest crop != host oracle"
            hc_l = HandCropper(depth_u[i], cam, resize_method="linear")
            ref_lin, _, _ = hc_l.crop_area_3d(com=com_u[i], size=cube)
            d = np.abs(bi_gather[i] - ref_lin)
            assert d.max() < 5e-2, (
                f"frame {i}: device linear crop vs cv2 oracle max "
                f"{d.max():.2e} mm exceeds the tap-boundary budget"
            )
            lin_err = max(lin_err, float(d.max()))

        print(
            f"BENCH_CHECK ok: gather==onehot bit-exact, {pallas_msg}, "
            f"bilinear max|diff|={bi_err:.2e} mm, "
            f"host-oracle nearest bit-exact / linear max|d|={lin_err:.1e} "
            f"on {jax.devices()[0].platform}"
        )

    # measure the tunnel's fetch round-trip so it can be subtracted from the
    # timed sequence (executions enqueue in order; one tail fetch drains all)
    tiny = jnp.zeros((8, 8))
    bump = jax.jit(lambda a: a + 1.0)
    np.asarray(bump(tiny))
    rtts = []
    for _ in range(3):
        t = time.perf_counter()
        np.asarray(bump(tiny))
        rtts.append(time.perf_counter() - t)
    rtt = min(rtts)

    iters = int(os.environ.get("BENCH_ITERS", "50"))
    t0 = time.perf_counter()
    for _ in range(iters):
        joints, _, _ = est(variables, depth_d, com_d)
    force(joints)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)

    fps = batch * iters / dt

    # MFU normalization: XLA's own cost analysis counts the model/XLA
    # flops of the compiled pipeline; the Pallas crop is an opaque custom
    # call to it, so its selection matmuls are added analytically
    # (utils/flops.py mirrors the kernel's dot shapes).  Omitted silently
    # if the backend exposes no cost analysis.
    extra = {}
    try:
        from deepprior_tpu.ops.pallas_crop import window_dims
        from deepprior_tpu.utils.flops import (
            crop_selection_flops, mfu_pct, peak_tflops, xla_flops,
        )

        xf = xla_flops(est._fn, variables, depth_d, com_d)
        if xf is not None:
            if est.crop_method == "pallas":
                hk = depth_d.shape[1] + (-depth_d.shape[1]) % 8
                wk = depth_d.shape[2] + (-depth_d.shape[2]) % 128
                xf += crop_selection_flops(
                    batch, *window_dims(hk, wk, est.win_rows),
                    # dsize is (width, height) — crop3d unpacks dw, dh
                    dh=est.dsize[1], dw=est.dsize[0],
                    # resize=None is the legacy spelling of 'nearest'
                    bilinear=(est.resize not in (None, "nearest")),
                )
            extra["flops_per_frame"] = round(xf / batch)
            peak = peak_tflops()
            m = mfu_pct(xf * iters, dt, peak)
            if m is not None:
                extra["mfu_pct"] = round(m, 2)
                extra["peak_tflops"] = peak
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "fused_crop_regress_fps",
                "value": round(fps, 1),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 2),
                **extra,
            }
        )
    )


def _run_with_deadline(deadline_s: float, max_attempts: int = 3) -> int:
    """Run main() in a child process with a wall-clock deadline.

    The axon tunnel's device-claim leg can wedge indefinitely (observed:
    jax.devices() blocked >30 min when a prior client's grant was lost);
    a bench that hangs forever is worse for the driver than one that
    fails loudly.  Fork keeps the parent free of any JAX/PJRT state so
    it can always enforce the deadline.

    The claim failure is also TRANSIENT (observed: 'Unable to initialize
    backend axon: UNAVAILABLE' after ~20 min, then a clean claim on the
    next attempt), so a failed child is retried — in a FRESH fork, since
    PJRT state is process-wide — while deadline budget remains."""
    import os
    import signal
    import sys
    import time

    end = time.time() + deadline_s
    for attempt in range(1, max_attempts + 1):
        pid = os.fork()
        if pid == 0:  # child: the real benchmark
            main()
            os._exit(0)
        code = None
        while time.time() < end:
            done, status = os.waitpid(pid, os.WNOHANG)
            if done:
                code = os.waitstatus_to_exitcode(status)
                break
            time.sleep(1.0)
        if code is None:  # deadline hit while the child was still running
            print(
                f"bench: no result within {deadline_s:.0f}s "
                "(device claim or compile wedged); killing child",
                flush=True, file=sys.stderr,
            )
            os.kill(pid, signal.SIGKILL)
            os.waitpid(pid, 0)
            return 1
        if code == 0:
            return 0
        left = end - time.time()
        if attempt == max_attempts or left < 120:
            return code
        print(
            f"bench: attempt {attempt} failed (exit {code}); retrying "
            f"in 60s ({left:.0f}s of deadline left)",
            flush=True, file=sys.stderr,
        )
        time.sleep(min(60.0, max(0.0, left - 60.0)))
    return 1


if __name__ == "__main__":
    import os as _os
    import sys as _sys

    _deadline = float(_os.environ.get("BENCH_DEADLINE_S", "2700"))
    _attempts = int(_os.environ.get("BENCH_MAX_ATTEMPTS", "3"))
    if _deadline > 0:
        _sys.exit(_run_with_deadline(_deadline, max_attempts=_attempts))
    main()
