"""Realtime pipeline tests: devices, fused estimator, producer/consumer."""

import os
import struct

import numpy as np
import pytest

from deepprior_tpu.camera import NYU_CAMERA, Camera
from deepprior_tpu.data.synthetic import make_frame
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import PCAPrior
from deepprior_tpu.realtime.camera import CaptureDevice, FileDevice, SyntheticDevice
from deepprior_tpu.realtime.fused import FusedEstimator
from deepprior_tpu.realtime.pipeline import (
    STATE_INIT,
    STATE_RUN,
    HAND_LEFT,
    HAND_RIGHT,
    RealtimeHandposePipeline,
)

CPP_LIB = os.path.join(
    os.path.dirname(__file__), "..", "deepprior_tpu", "cpp", "libcapture.so"
)


@pytest.fixture(scope="module")
def estimator_setup():
    import jax
    import jax.numpy as jnp

    cam = NYU_CAMERA
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    rng = np.random.default_rng(0)
    prior = PCAPrior(
        components=rng.standard_normal((30, 42)).astype(np.float32) * 0.05,
        mean=np.zeros(42, np.float32),
    )
    est = FusedEstimator(model, cam, prior=prior)
    return cam, est, variables


def test_file_device_replay():
    cam = NYU_CAMERA
    frames = np.random.default_rng(0).uniform(0, 100, (3, 8, 8)).astype(np.float32)
    dev = FileDevice(frames, cam, loop=False)
    dev.start()
    for i in range(3):
        ok, f = dev.getDepth()
        assert ok
        np.testing.assert_array_equal(f, frames[i])
    ok, _ = dev.getDepth()
    assert not ok
    dev.stop()
    # looping variant wraps around
    dev = FileDevice(frames, cam, loop=True)
    dev.start()
    for _ in range(7):
        ok, _ = dev.getDepth()
        assert ok


def test_synthetic_device():
    dev = SyntheticDevice(NYU_CAMERA, seed=1)
    dev.start()
    ok, f = dev.getDepth()
    assert ok and f.shape == (480, 640)
    assert (f > 0).sum() > 100  # a hand is visible
    dev.stop()
    assert dev.getDepthIntrinsics().fx == NYU_CAMERA.fx


def test_fused_estimator_shapes(estimator_setup):
    cam, est, variables = estimator_setup
    rng = np.random.default_rng(4)
    f = make_frame(cam, rng)
    joints, com3d, crops = est(
        variables, f.extraData["dpt_full"][None], f.com[None]
    )
    assert joints.shape == (1, 14, 3)
    assert crops.shape == (1, 128, 128)
    # joints land near the hand in 3D (decoded around the CoM)
    com3d = np.asarray(com3d)[0]
    assert np.linalg.norm(np.asarray(joints)[0] - com3d, axis=1).max() < 300.0


def test_pipeline_single_frame(estimator_setup):
    cam, est, variables = estimator_setup
    rng = np.random.default_rng(5)
    f = make_frame(cam, rng)
    pipe = RealtimeHandposePipeline(
        est, variables, {"fx": cam.fx, "fy": cam.fy, "cube": (250.0, 250.0, 250.0)}
    )
    out = pipe.process_frame(f.extraData["dpt_full"])
    assert out is not None
    assert out["joints3d"].shape == (14, 3)
    assert np.linalg.norm(out["com"][:2] - f.com[:2]) < 80.0


def test_pipeline_threaded(estimator_setup):
    cam, est, variables = estimator_setup
    rng = np.random.default_rng(6)
    frames = [make_frame(cam, rng).extraData["dpt_full"] for _ in range(4)]
    dev = FileDevice(frames, cam, loop=True)
    pipe = RealtimeHandposePipeline(
        est, variables, {"fx": cam.fx, "fy": cam.fy, "cube": (250.0, 250.0, 250.0)}
    )
    results = pipe.process_video_threaded(dev, max_frames=6)
    assert len(results) >= 1
    assert all(r["joints3d"].shape == (14, 3) for r in results)


def test_pipeline_keys_and_state(estimator_setup):
    cam, est, variables = estimator_setup
    pipe = RealtimeHandposePipeline(
        est, variables, {"fx": cam.fx, "fy": cam.fy, "cube": (250.0, 250.0, 250.0)}
    )
    assert pipe.hand == HAND_LEFT  # reference default: left = unmirrored
    assert pipe.process_key("h")
    assert pipe.hand == HAND_RIGHT
    cube0 = pipe.config["cube"][0]
    pipe.process_key("+")
    assert pipe.config["cube"][0] == cube0 + 10.0
    pipe.process_key("t")
    assert pipe.tracking
    pipe.process_key("i")
    assert pipe.state == STATE_INIT
    assert not pipe.process_key("q")


def test_pipeline_init_calibration(estimator_setup):
    cam, est, variables = estimator_setup
    rng = np.random.default_rng(7)
    f = make_frame(cam, rng)
    pipe = RealtimeHandposePipeline(
        est, variables, {"fx": cam.fx, "fy": cam.fy, "cube": (250.0, 250.0, 250.0)}
    )
    pipe.state = STATE_INIT
    pipe.num_init_frames = 3
    for _ in range(3):
        pipe.detect(f.extraData["dpt_full"])
    assert pipe.state == STATE_RUN
    assert pipe.config["cube"][0] != 250.0  # calibrated from content


def test_show_overlay(estimator_setup):
    cam, est, variables = estimator_setup
    rng = np.random.default_rng(8)
    f = make_frame(cam, rng)
    pipe = RealtimeHandposePipeline(
        est, variables, {"fx": cam.fx, "fy": cam.fy, "cube": (250.0, 250.0, 250.0)}
    )
    out = pipe.process_frame(f.extraData["dpt_full"])
    img = pipe.show(out)
    assert img.shape == (480, 640, 3) and img.dtype == np.uint8
    assert (img[..., 1] == 255).any()  # skeleton drawn


def test_device_detect_matches_host_path(estimator_setup):
    """The default jitted device detection must agree with the host numpy
    oracle path on the same frames (same slice-scan + min-area semantics)."""
    cam, est, variables = estimator_setup
    rng = np.random.default_rng(12)
    f = make_frame(cam, rng)
    cfg = {"fx": cam.fx, "fy": cam.fy, "cube": (250.0, 250.0, 250.0)}
    pipe_dev = RealtimeHandposePipeline(est, variables, cfg, use_device_detect=True)
    pipe_host = RealtimeHandposePipeline(est, variables, cfg, use_device_detect=False)
    com_d, _ = pipe_dev.detect(f.extraData["dpt_full"])
    com_h, _ = pipe_host.detect(f.extraData["dpt_full"])
    np.testing.assert_allclose(com_d, com_h, rtol=1e-3, atol=0.5)
    # tracking path too
    pipe_dev.tracking = pipe_host.tracking = True
    com_d2, _ = pipe_dev.detect(f.extraData["dpt_full"])
    com_h2, _ = pipe_host.detect(f.extraData["dpt_full"])
    np.testing.assert_allclose(com_d2, com_h2, rtol=1e-3, atol=0.5)


def test_status_bar_and_side_view(estimator_setup):
    """Display parity: 20-px status bar with FPS/hand/cube/mode text and
    state light; 90-degree rotated side view
    (realtimehandposepipeline.py:372-492)."""
    cam, est, variables = estimator_setup
    rng = np.random.default_rng(13)
    f = make_frame(cam, rng)
    pipe = RealtimeHandposePipeline(
        est, variables, {"fx": cam.fx, "fy": cam.fy, "cube": (250.0, 250.0, 250.0)}
    )
    out = pipe.process_frame(f.extraData["dpt_full"])
    img = pipe.show(out)
    with_bar = pipe.add_status_bar(img)
    assert with_bar.shape == (500, 640, 3)
    np.testing.assert_array_equal(with_bar[20:], img)
    bar = with_bar[:20]
    # state light: IDLE -> red disc in the top-left corner
    assert (bar[:, :14] == [255, 0, 0]).all(axis=-1).any()
    # text stamped (black pixels present in the bar)
    assert (bar == 0).all(axis=-1).any()
    pipe.state = STATE_RUN
    bar_run = pipe.add_status_bar(img)[:20]
    assert (bar_run[:, :14] == [0, 255, 0]).all(axis=-1).any()

    side = pipe.show_side(out)
    assert side.shape == (480, 640, 3)
    assert (side > 0).any()  # skeleton drawn into the blank canvas
    # side view differs from the front overlay (rotated 90 degrees)
    assert not np.array_equal(side, pipe.show(out))


# ----------------------------------------------------------------------
@pytest.mark.skipif(not os.path.exists(CPP_LIB), reason="capture shim not built")
class TestCaptureShim:
    def test_synthetic_capture(self):
        import time

        dev = CaptureDevice(CPP_LIB, mode="synthetic", fps=200.0)
        dev.start()
        time.sleep(0.1)
        ok, frame = dev.getDepth()
        assert ok and frame.shape == (240, 320)
        assert (frame > 0).sum() > 50
        n1 = dev.getLastDepthNum()
        time.sleep(0.05)
        assert dev.getLastDepthNum() > n1  # frames advancing
        cam = dev.getDepthIntrinsics()
        assert cam.fx > 0
        accel = dev.getAcceleration()
        assert accel.shape == (3,)
        dev.stop()

    def test_start_blocks_until_first_frame(self):
        """start() must not return before the worker publishes its first
        frame: getDepth() immediately after start() used to race the first
        render and report a dead stream (process_video then exited with 0
        frames). Low fps makes the pre-fix race window ~1 s wide."""
        dev = CaptureDevice(CPP_LIB, mode="synthetic", fps=1.0)
        dev.start()
        try:
            assert dev.getLastDepthNum() > 0
            ok, frame = dev.getDepth()
            assert ok and frame.shape == (240, 320)
        finally:
            dev.stop()

    def test_colour_uv_sync_surface(self):
        """Colour/vertex/UV/sync surface (reference depthsense.cxx:53-85,
        203-223): geometric consistency between the streams."""
        import time

        # 1 fps: the first frame publishes immediately, the next a second
        # later, so every read below sees the same stable front buffer
        dev = CaptureDevice(CPP_LIB, mode="synthetic", fps=1.0)
        dev.start()
        time.sleep(0.2)
        ok, depth = dev.getDepth()
        assert ok
        ok, rgb = dev.getRGB()
        assert ok and rgb.shape == (480, 640, 3) and rgb.dtype == np.uint8
        assert dev.getLastColorNum() > 0

        ok, vfp = dev.getVertices(fp=True)
        assert ok and vfp.shape == (240, 320, 3)
        ok, v16 = dev.getVertices()
        assert ok and v16.dtype == np.int16
        # back-projection identity on valid pixels of vfp itself:
        # X = (u-ux)*d/fx, and vertex z equals the depth map
        cam = dev.getDepthIntrinsics()
        np.testing.assert_allclose(vfp[..., 2], depth, atol=1e-4)
        valid = vfp[..., 2] > 0
        assert valid.sum() > 50
        uu = np.broadcast_to(np.arange(320, dtype=np.float32), (240, 320))
        expect_x = (uu - cam.ux) * vfp[..., 2] / cam.fx
        np.testing.assert_allclose(vfp[..., 0][valid], expect_x[valid],
                                   rtol=1e-5, atol=1e-3)

        ok, uv = dev.getUVMap()
        assert ok and uv.shape == (240, 320, 2)
        dvalid = vfp[..., 2] > 0
        # invalid depth pixels carry the (-1, -1) sentinel
        assert (uv[~dvalid] == -1.0).all()

        ok, sync = dev.getSyncMap()
        assert ok and sync.shape == (240, 320, 3)
        # remapped colours at hand pixels are the splatted skin tone
        # (sample pixels well inside the blob: erode validity by 2 px)
        from scipy.ndimage import binary_erosion

        core = binary_erosion(dvalid, iterations=2)
        if core.sum():
            skin = (sync[core] == [210, 160, 120]).all(axis=-1)
            assert skin.mean() > 0.9
        # background is black (no UV hit or invalid depth)
        assert (sync[~dvalid] == 0).all()

        ccam = dev.getColorIntrinsics()
        assert ccam.fx > 0 and ccam.width == 640
        E = dev.getExtrinsics()
        assert E.shape == (3, 4)
        np.testing.assert_allclose(E[:, :3], np.eye(3))
        dev.stop()

    def test_no_torn_reads_under_fast_writes(self, tmp_path):
        """Seqlock tear check (advisor finding on the old double buffer):
        replay constant-valued frames at high fps; every snapshot must be
        uniform — a torn read would mix rows of two frames.  Big frames
        widen the writer's memcpy window; 10 kfps makes writes near
        back-to-back."""
        h, w = 240, 320
        frames = np.stack([
            np.full((h, w), 500.0, np.float32),
            np.full((h, w), 900.0, np.float32),
        ])
        path = tmp_path / "tear.bin"
        with open(path, "wb") as f:
            f.write(struct.pack("<3i", h, w, 2))
            frames.tofile(f)
        dev = CaptureDevice(CPP_LIB, mode="file", source=str(path),
                            fps=10000.0)
        dev.start()
        try:
            for _ in range(500):
                ok, frame = dev.getDepth()
                assert ok
                lo, hi = frame.min(), frame.max()
                assert lo == hi, f"torn frame: min {lo} != max {hi}"
                assert lo in (500.0, 900.0)
        finally:
            dev.stop()

    @pytest.mark.slow
    def test_demo_realtime_smoke(self, tmp_path):
        """mains/demo_realtime.py end-to-end on both device paths — the
        entry point regressed twice (platform pinning bypassed; capture
        device built after the estimator chose NYU intrinsics) without any
        test noticing."""
        import subprocess
        import sys

        repo = os.path.join(os.path.dirname(__file__), "..")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        for device in ("synthetic", "capture"):
            out = subprocess.run(
                [sys.executable, "mains/demo_realtime.py",
                 "--device", device, "--frames", "2"],
                cwd=repo, env=env, capture_output=True, text=True,
                timeout=600,
            )
            assert out.returncode == 0, (device, out.stderr[-3000:])
            assert "processed 2 frames" in out.stdout, (device, out.stdout)

    def test_file_capture(self, tmp_path):
        import time

        frames = np.random.default_rng(1).uniform(
            100, 900, (4, 16, 24)
        ).astype(np.float32)
        path = tmp_path / "frames.bin"
        with open(path, "wb") as f:
            f.write(struct.pack("<3i", 16, 24, 4))
            frames.tofile(f)
        dev = CaptureDevice(CPP_LIB, mode="file", source=str(path), fps=500.0)
        dev.start()
        time.sleep(0.05)
        ok, frame = dev.getDepth()
        assert ok and frame.shape == (16, 24)
        # the frame is one of the replayed ones
        match = min(np.abs(frames - frame[None]).max(axis=(1, 2)))
        assert match < 1e-5
        dev.stop()
