"""Realtime hand-pose pipeline: capture -> detect -> regress -> display.

Reference: src/util/realtimehandposepipeline.py:49-534.  The reference runs
producer (capture+detect) and consumer (CNN+display) as separate processes
over a Manager dict, compiling the nets twice.  Here the compute path is
the single fused XLA program (realtime/fused.FusedEstimator) compiled once;
the host side keeps the same state machine (IDLE/INIT/RUN), tracking
vs. detection modes, hand-size calibration, and threaded producer/consumer
split (threads, not processes — the device does the heavy work, the GIL is
irrelevant, and frame handoff is a lock-protected slot like the reference's
sync dict).
"""

from __future__ import annotations

import threading
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np

from deepprior_tpu.camera import Camera
from deepprior_tpu.data.detector_np import HandCropper
from deepprior_tpu.eval.datasets import evaluation_for
from deepprior_tpu.realtime.fused import FusedEstimator

STATE_IDLE = 0
STATE_INIT = 1
STATE_RUN = 2

HAND_LEFT = 0
HAND_RIGHT = 1


class RealtimeHandposePipeline:
    def __init__(
        self,
        estimator: FusedEstimator,
        variables,
        config: Dict[str, Any],
        camera: Optional[Camera] = None,
        verbose: bool = False,
        com_refiner=None,
        use_device_detect: bool = True,
    ):
        """config mirrors the reference dict: {'fx','fy','cube'
        [,'invX','invY','upsample','crop_joint_idx']}
        (test_realtimepipeline.py:65-67).

        com_refiner: optional ops.refine_cnn.CNNComRefiner — the CNN CoM
        refinement of the reference's track() path (handdetector.py:518-521).
        use_device_detect: run detection/tracking as jitted device programs
        (ops.com.detect slice-scan + refine_com_iterative) instead of the
        host numpy oracle — same semantics, no 10-30 ms host scipy pass.
        """
        self.estimator = estimator
        self.variables = variables
        self.config = dict(config)
        self.camera = camera or estimator.camera
        self.verbose = verbose
        self.com_refiner = com_refiner
        self.use_device_detect = use_device_detect
        self._dev_fns = None

        # state machine (realtimehandposepipeline.py:54-109)
        self.state = STATE_IDLE
        self.hand = HAND_LEFT  # reference default (realtimehandpose:96)
        self.tracking = False
        self.lastcom = np.zeros(3, np.float32)
        self.hand_sizes: list = []
        self.num_init_frames = 50
        self.stop_flag = threading.Event()

        # producer/consumer shared slot (the Manager-dict equivalent)
        self._lock = threading.Lock()
        self._slot: Optional[Dict[str, Any]] = None
        self._fid = 0

        # instrumentation (reference prints per-stage ms + running fps,
        # realtimehandposepipeline.py:160-166, 199-214, 447-462)
        self.times: Dict[str, float] = {"detect": 0.0, "pose": 0.0}
        self._fps_hist: list = []

    # ------------------------------------------------------------------
    def _device_detect_fns(self):
        """Lazily compile the device detection programs: full slice-scan
        detect, tracking refine, and (optional) CNN CoM refinement."""
        if self._dev_fns is None:
            import jax
            import jax.numpy as jnp

            from deepprior_tpu.ops.com import detect as dev_detect
            from deepprior_tpu.ops.com import refine_com_iterative
            from deepprior_tpu.ops.crop import clamp_depth

            cam = self.camera

            @jax.jit
            def full(frame, cube):
                return dev_detect(frame[None], cube, cam.fx, cam.fy)[0]

            @jax.jit
            def track(frame, com, cube):
                d, dmin, dmax = clamp_depth(frame[None])
                return refine_com_iterative(
                    d, com[None], cube, cam.fx, cam.fy, num_iter=3,
                    min_depth=dmin, max_depth=dmax,
                )[0]

            refiner = self.com_refiner
            if refiner is not None:

                @jax.jit
                def refine(frame, com, cube):
                    d, _, _ = clamp_depth(frame[None])
                    return refiner(d, com[None], cube)[0]

            else:
                refine = None
            self._dev_fns = (full, track, refine)
        return self._dev_fns

    def detect(self, frame: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Detection/tracking -> (com, cube).

        Mirrors realtimehandposepipeline.py:296-337: track around the last
        CoM when tracking is on, otherwise full detection; INIT state
        calibrates the cube from median hand size over 50 frames.  Runs as
        jitted device programs by default (use_device_detect); the host
        numpy oracle path is kept for environments without a device.
        """
        t0 = time.perf_counter()
        cube = tuple(self.config["cube"])
        if self.use_device_detect:
            import jax.numpy as jnp

            full, track, refine = self._device_detect_fns()
            fr = jnp.asarray(frame, jnp.float32)
            cb = jnp.asarray(cube, jnp.float32)
            if self.tracking and not np.allclose(self.lastcom, 0.0):
                com = np.asarray(track(fr, jnp.asarray(self.lastcom, jnp.float32), cb))
            else:
                com = np.asarray(full(fr, cb))
            if refine is not None and not np.allclose(com, 0.0):
                com = np.asarray(refine(fr, jnp.asarray(com, jnp.float32), cb))
        else:
            hc = HandCropper(frame, self.camera)
            if self.tracking and not np.allclose(self.lastcom, 0.0):
                com = hc.refine_com_iterative(self.lastcom, 3, cube)
            else:
                com = hc.detect(cube)
            if self.com_refiner is not None and not np.allclose(com, 0.0):
                com = np.asarray(
                    self.com_refiner(hc.dpt[None], com[None].astype(np.float32), cube)
                )[0]
        self.lastcom = com

        if self.state == STATE_INIT and not np.allclose(com, 0.0):
            hc = HandCropper(frame, self.camera)
            self.hand_sizes.append(hc.estimate_hand_size(com, cube))
            if len(self.hand_sizes) >= self.num_init_frames:
                med = tuple(np.median(np.asarray(self.hand_sizes), axis=0))
                self.config["cube"] = med
                self.hand_sizes = []
                self.state = STATE_RUN
        self.times["detect"] = time.perf_counter() - t0
        return com, cube

    # ------------------------------------------------------------------
    def estimate_pose(self, frame: np.ndarray, com: np.ndarray) -> np.ndarray:
        """Device-side: fused crop+regress+decode at batch 1
        (realtimehandposepipeline.py:339-370 estimatePose + denormalize).

        Reference conventions, reproduced exactly: the nets' canonical
        orientation is a LEFT hand, so RIGHT hands mirror the CROP before
        regression and flip the relative pose's x back afterwards
        (:346-351, 366-369); the com3d/denormalization always use the
        unmirrored detection; invX/invY flip the relative pose's y/x
        (the reference's swapped-index quirk, :353-363).  The LIVE config
        cube is passed per call, so INIT hand-size calibration and +/-
        resizing reach the crop and the denormalization scale (:330-336).
        All of it runs inside the one fused program (traced cube/mirror
        args — no recompile on calibration or the 'h' key)."""
        t0 = time.perf_counter()
        import jax.numpy as jnp

        joints, com3d, crops = self.estimator(
            self.variables,
            jnp.asarray(frame[None]),
            jnp.asarray(com[None]),
            cube=np.asarray(self.config["cube"], np.float32),
            mirror=np.asarray([self.hand == HAND_RIGHT]),
            invx=bool(self.config.get("invX", False)),
            invy=bool(self.config.get("invY", False)),
        )
        joints = np.asarray(joints)[0]
        self.times["pose"] = time.perf_counter() - t0
        return joints

    # ------------------------------------------------------------------
    def process_frame(self, frame: np.ndarray) -> Optional[Dict[str, Any]]:
        """Single-threaded variant of one producer+consumer iteration
        (processVideo, realtimehandposepipeline.py:262-294)."""
        com, cube = self.detect(frame)
        if np.allclose(com, 0.0):
            return None
        joints = self.estimate_pose(frame, com)
        self._fps_hist.append(time.perf_counter())
        self._fps_hist = self._fps_hist[-100:]
        return {
            "frame": frame,
            "com": com,
            "joints3d": joints,
            "cube": cube,
            "fps": self.fps(),
        }

    def fps(self) -> float:
        """100-frame running-average fps (realtimehandposepipeline.py:447-462)."""
        if len(self._fps_hist) < 2:
            return 0.0
        dt = self._fps_hist[-1] - self._fps_hist[0]
        return (len(self._fps_hist) - 1) / dt if dt > 0 else 0.0

    # ------------------------------------------------------------------
    def _producer(self, device, max_frames):
        n = 0
        while not self.stop_flag.is_set() and n < max_frames:
            ok, frame = device.getDepth()
            if not ok:
                time.sleep(0.005)  # camera retry (reference :156-159)
                continue
            com, cube = self.detect(frame)
            with self._lock:
                self._fid += 1
                self._slot = {"fid": self._fid, "frame": frame, "com": com,
                              "cube": cube}
            n += 1
        self.stop_flag.set()

    def _consumer(self, results, max_frames):
        seen = 0
        last_fid = -1
        while not self.stop_flag.is_set() or last_fid < self._fid:
            with self._lock:
                slot = self._slot
            if slot is None or slot["fid"] == last_fid:
                if self.stop_flag.is_set():
                    break
                time.sleep(0.001)
                continue
            last_fid = slot["fid"]
            if np.allclose(slot["com"], 0.0):
                continue
            joints = self.estimate_pose(slot["frame"], slot["com"])
            self._fps_hist.append(time.perf_counter())
            self._fps_hist = self._fps_hist[-100:]
            results.append({"fid": slot["fid"], "joints3d": joints,
                            "com": slot["com"], "fps": self.fps()})
            seen += 1
            if seen >= max_frames:
                break
        self.stop_flag.set()

    def process_video_threaded(self, device, max_frames: int = 100):
        """Producer/consumer threads over a shared slot
        (processVideoThreaded, realtimehandposepipeline.py:221-238).
        Returns the consumer's results list."""
        self.stop_flag.clear()
        results: list = []
        device.start()
        prod = threading.Thread(target=self._producer, args=(device, max_frames))
        cons = threading.Thread(target=self._consumer, args=(results, max_frames))
        prod.start()
        cons.start()
        prod.join()
        cons.join()
        device.stop()
        return results

    def process_video(self, device, max_frames: int = 100):
        """Single-loop variant (processVideo)."""
        device.start()
        results = []
        n = 0
        while n < max_frames:
            ok, frame = device.getDepth()
            if not ok:
                break
            out = self.process_frame(frame)
            if out is not None:
                results.append(out)
            n += 1
        device.stop()
        return results

    # ------------------------------------------------------------------
    def process_key(self, key: str) -> bool:
        """Keyboard control (processKey, realtimehandposepipeline.py:~490):
        q=quit, h=switch hand, +/-=cube size, r=reset, i=init-calibrate,
        t=toggle tracking.  Returns False to quit."""
        if key == "q":
            return False
        if key == "h":
            self.hand = HAND_LEFT if self.hand == HAND_RIGHT else HAND_RIGHT
        elif key == "+":
            self.config["cube"] = tuple(c + 10.0 for c in self.config["cube"])
        elif key == "-":
            self.config["cube"] = tuple(c - 10.0 for c in self.config["cube"])
        elif key == "r":
            self.reset()
        elif key == "i":
            self.state = STATE_INIT
            self.hand_sizes = []
        elif key == "t":
            self.tracking = not self.tracking
        return True

    def reset(self):
        self.state = STATE_IDLE
        self.lastcom = np.zeros(3, np.float32)
        self.tracking = False
        self.hand_sizes = []

    # ------------------------------------------------------------------
    @staticmethod
    def _draw_skeleton(img, uvd, connections, line_color=(0, 255, 0),
                       joint_color=(255, 0, 0)):
        h, w = img.shape[:2]
        for a, b in connections or []:
            pa, pb = uvd[a], uvd[b]
            n = int(max(abs(pb[0] - pa[0]), abs(pb[1] - pa[1])) + 1)
            us = np.linspace(pa[0], pb[0], n).astype(int)
            vs = np.linspace(pa[1], pb[1], n).astype(int)
            ok = (us >= 0) & (us < w) & (vs >= 0) & (vs < h)
            img[vs[ok], us[ok]] = line_color
        for u, v in uvd[:, :2]:
            ui, vi = int(u), int(v)
            if 0 <= ui < w and 0 <= vi < h:
                img[max(0, vi - 1) : vi + 2, max(0, ui - 1) : ui + 2] = joint_color
        return img

    def show(self, result: Dict[str, Any]) -> np.ndarray:
        """Render the skeleton overlay into an RGB array (the reference
        draws with cv2.imshow, realtimehandposepipeline.py:372-446; we
        return the image so callers choose the sink)."""
        frame = result["frame"]
        joints3d = result["joints3d"]
        uvd = self.camera.three_d_to_img_np(joints3d)
        ev_cls = evaluation_for(joints3d.shape[0])
        lo, hi = frame[frame > 0].min() if (frame > 0).any() else 0.0, max(
            frame.max(), 1.0
        )
        norm = np.clip((frame - lo) / max(hi - lo, 1e-6), 0, 1)
        img = np.stack([norm * 255] * 3, axis=-1).astype(np.uint8)
        self._draw_skeleton(img, uvd, ev_cls.joint_connections)
        # CoM marker (reference draws a green circle, :419-424)
        com = result.get("com")
        if com is not None:
            ui, vi = int(com[0]), int(com[1])
            h, w = frame.shape
            if 0 <= ui < w and 0 <= vi < h:
                img[max(0, vi - 2) : vi + 3, max(0, ui - 2) : ui + 3, 1] = 255
        return img

    def show_side(self, result: Dict[str, Any]) -> np.ndarray:
        """90-degree side view: the pose rotated by Euler (0, 90, 0) about
        a reference joint and re-projected into a blank canvas — the
        reference's `poseimg` (realtimehandposepipeline.py:426-446).

        The rotation center is config['crop_joint_idx'] when set (the
        reference uses importer.crop_joint_idx), else the pose CoM.
        """
        # numpy twin: an eager jnp op here would be a per-rendered-frame
        # accelerator round trip (camera.py host-twins note)
        from deepprior_tpu.geometry import rotate_points_3d_np

        frame = result["frame"]
        joints3d = np.asarray(result["joints3d"], np.float32)
        cj = self.config.get("crop_joint_idx")
        center = joints3d[int(cj)] if cj is not None else joints3d.mean(axis=0)
        rotated = np.asarray(
            rotate_points_3d_np(joints3d, center[None], 0.0, 90.0, 0.0),
            np.float32,
        )
        uvd = self.camera.three_d_to_img_np(rotated)
        ev_cls = evaluation_for(joints3d.shape[0])
        img = np.zeros((frame.shape[0], frame.shape[1], 3), np.uint8)
        self._draw_skeleton(img, uvd, ev_cls.joint_connections)
        return img

    def add_status_bar(self, img: np.ndarray) -> np.ndarray:
        """Prepend the reference's 20-px status bar (addStatusBar,
        realtimehandposepipeline.py:449-492): running FPS, hand side,
        hand-cube size, tracking/detection flag, detector mode, and a
        state light (IDLE red / INIT yellow / RUN green)."""
        from deepprior_tpu.utils.text import draw_text

        barsz = 20
        out = np.full((img.shape[0] + barsz, img.shape[1], 3), 255, np.uint8)
        out[barsz:] = img
        draw_text(out, f"FPS {self.fps():2.1f}", 20, 6)
        draw_text(out, "LEFT" if self.hand == HAND_LEFT else "RIGHT", 80, 6)
        draw_text(out, f"HC-{int(self.config['cube'][0])}", 130, 6)
        draw_text(out, "T" if self.tracking else "D", 200, 6)
        draw_text(out, "COM", 220, 6)
        col = {
            STATE_IDLE: (255, 0, 0),
            STATE_INIT: (255, 255, 0),
            STATE_RUN: (0, 255, 0),
        }.get(self.state, (255, 0, 0))
        yy, xx = np.mgrid[0:barsz, 0:14]
        disc = (yy - 9) ** 2 + (xx - 7) ** 2 <= 25
        out[0:barsz, 0:14][disc] = col
        return out
