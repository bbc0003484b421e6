"""Camera device abstraction for the realtime pipeline.

Mirrors the reference `CameraDevice` interface (reference
src/util/cameradevice.py:43-161: start/stop/getDepth/getRGB/
getDepthIntrinsics/...) with:

- `FileDevice`     — replays imported dataset frames / npz stacks
                     (cameradevice.py:348-457)
- `SyntheticDevice` — streams generated hand scenes (new: a deterministic
                     fixture for latency tests without data)
- `CaptureDevice`  — binds the native C++ capture shim (cpp/capture.cpp,
                     the lib_dscapture equivalent) via ctypes

The native shim uses the same double-buffered frame publication as the
reference's DepthSense module (initdepthsense.cxx:95-111 pointer swap), so
`getDepth` never observes a torn frame.
"""

from __future__ import annotations

import ctypes
import os
import time
from typing import Optional, Tuple

import numpy as np

from deepprior_tpu.camera import Camera, NYU_CAMERA


class CameraDevice:
    """Abstract device (reference cameradevice.py:43-161)."""

    def __init__(self, mirror: bool = False):
        self.mirror = mirror

    def start(self) -> None:
        raise NotImplementedError

    def stop(self) -> None:
        raise NotImplementedError

    def getDepth(self) -> Tuple[bool, Optional[np.ndarray]]:
        """Returns (ok, depth mm float32 (H, W))."""
        raise NotImplementedError

    def getRGB(self) -> Tuple[bool, Optional[np.ndarray]]:
        return False, None

    def getRGBD(self):
        ok_d, d = self.getDepth()
        ok_c, c = self.getRGB()
        return ok_d and ok_c, d, c

    def getDepthIntrinsics(self) -> Camera:
        raise NotImplementedError

    def getLastDepthNum(self) -> int:
        return -1


class FileDevice(CameraDevice):
    """Replays a list of depth frames through the device interface
    (reference FileDevice, cameradevice.py:348-457)."""

    def __init__(self, frames, camera: Camera, mirror: bool = False, loop=True):
        """frames: (N, H, W) array, a list of 2D arrays, or a .npz path
        with a 'depth' array."""
        super().__init__(mirror)
        if isinstance(frames, (str, os.PathLike)):
            frames = np.load(frames)["depth"]
        self.frames = [np.asarray(f, np.float32) for f in frames]
        self.camera = camera
        self.loop = loop
        self._i = 0
        self._running = False

    def start(self):
        self._running = True
        self._i = 0

    def stop(self):
        self._running = False

    def getDepth(self):
        if not self._running or not self.frames:
            return False, None
        if self._i >= len(self.frames):
            if not self.loop:
                return False, None
            self._i = 0
        frame = self.frames[self._i]
        self._i += 1
        if self.mirror:
            frame = frame[:, ::-1]
        return True, frame.copy()

    def getDepthIntrinsics(self):
        return self.camera

    def getLastDepthNum(self):
        return self._i - 1


class SyntheticDevice(CameraDevice):
    """Streams synthetic hand scenes with a slowly moving CoM."""

    def __init__(self, camera: Camera = NYU_CAMERA, seed: int = 0, mirror=False):
        super().__init__(mirror)
        self.camera = camera
        self.rng = np.random.default_rng(seed)
        self._t = 0
        self._running = False

    def start(self):
        self._running = True

    def stop(self):
        self._running = False

    def getDepth(self):
        from deepprior_tpu.data.synthetic import render_depth, synthetic_hand_pose

        if not self._running:
            return False, None
        cam = self.camera
        t = self._t
        self._t += 1
        com = np.array(
            [
                cam.ux + 60 * np.sin(t / 20.0),
                cam.uy + 40 * np.cos(t / 25.0),
                700.0 + 80 * np.sin(t / 30.0),
            ],
            np.float32,
        )
        pose = synthetic_hand_pose(self.rng, 14, spread_mm=60.0)
        # host twin: an eager jnp op here would be a per-frame device
        # round trip from a no-device latency fixture (camera.py twins)
        dpt = render_depth(cam, cam.img_to_3d_np(com), pose)
        if self.mirror:
            dpt = dpt[:, ::-1]
        return True, dpt

    def getDepthIntrinsics(self):
        return self.camera

    def getLastDepthNum(self):
        return self._t - 1


class CaptureDevice(CameraDevice):
    """Native capture shim (cpp/capture.cpp) via ctypes — the lib_dscapture
    equivalent (reference depthsense.cxx:203-223 module surface)."""

    def __init__(self, lib_path: Optional[str] = None, mode: str = "synthetic",
                 source: str = "", fps: float = 30.0, mirror: bool = False):
        super().__init__(mirror)
        if lib_path is None:
            lib_path = os.path.join(
                os.path.dirname(__file__), "..", "cpp", "libcapture.so"
            )
        self.lib = ctypes.CDLL(os.path.abspath(lib_path))
        self.lib.ds_start.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double]
        self.lib.ds_start.restype = ctypes.c_int
        self.lib.ds_stop.restype = None
        self.lib.ds_get_depth.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int
        ]
        self.lib.ds_get_depth.restype = ctypes.c_int
        self.lib.ds_depth_width.restype = ctypes.c_int
        self.lib.ds_depth_height.restype = ctypes.c_int
        self.lib.ds_frame_counter.restype = ctypes.c_longlong
        self.lib.ds_get_intrinsics.argtypes = [ctypes.POINTER(ctypes.c_float)]
        self.lib.ds_get_intrinsics.restype = None
        self.lib.ds_get_accel.argtypes = [ctypes.POINTER(ctypes.c_float)]
        self.lib.ds_get_accel.restype = None
        # colour / vertex / UV / sync surface (depthsense.cxx:203-223)
        self.lib.ds_colour_width.restype = ctypes.c_int
        self.lib.ds_colour_height.restype = ctypes.c_int
        self.lib.ds_colour_frame_counter.restype = ctypes.c_longlong
        self.lib.ds_get_colour.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int
        ]
        self.lib.ds_get_colour.restype = ctypes.c_int
        self.lib.ds_get_vertices.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int
        ]
        self.lib.ds_get_vertices.restype = ctypes.c_int
        self.lib.ds_get_vertices_fp.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int
        ]
        self.lib.ds_get_vertices_fp.restype = ctypes.c_int
        self.lib.ds_get_uv.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int
        ]
        self.lib.ds_get_uv.restype = ctypes.c_int
        self.lib.ds_get_sync.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int
        ]
        self.lib.ds_get_sync.restype = ctypes.c_int
        self.lib.ds_get_color_intrinsics.argtypes = [
            ctypes.POINTER(ctypes.c_float)
        ]
        self.lib.ds_get_color_intrinsics.restype = None
        self.lib.ds_get_extrinsics.argtypes = [ctypes.POINTER(ctypes.c_float)]
        self.lib.ds_get_extrinsics.restype = None
        self.mode = mode
        self.source = source
        self.fps = fps
        self._shape = None

    def start(self):
        rc = self.lib.ds_start(
            self.mode.encode(), self.source.encode(), ctypes.c_double(self.fps)
        )
        if rc != 0:
            raise RuntimeError(f"capture shim failed to start (rc={rc})")
        self._shape = (self.lib.ds_depth_height(), self.lib.ds_depth_width())
        # block until the worker publishes its first frame (real-camera
        # start semantics): getDepth right after start() must not race the
        # first render and report a dead stream
        deadline = time.monotonic() + 5.0
        while (self.lib.ds_frame_counter() == 0
               and time.monotonic() < deadline):
            time.sleep(0.002)
        if self.lib.ds_frame_counter() == 0:
            raise RuntimeError("capture shim produced no frame within 5 s")

    def stop(self):
        self.lib.ds_stop()

    def getDepth(self):
        if self._shape is None:
            return False, None
        h, w = self._shape
        buf = np.empty((h, w), np.float32)
        ok = self.lib.ds_get_depth(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h * w
        )
        if not ok:
            return False, None
        if self.mirror:
            buf = buf[:, ::-1]
        return True, buf

    def getDepthIntrinsics(self):
        vals = (ctypes.c_float * 4)()
        self.lib.ds_get_intrinsics(vals)
        h, w = self._shape if self._shape else (240, 320)
        return Camera(fx=vals[0], fy=vals[1], ux=vals[2], uy=vals[3],
                      width=w, height=h)

    def getAcceleration(self):
        vals = (ctypes.c_float * 3)()
        self.lib.ds_get_accel(vals)
        return np.array(vals[:], np.float32)

    def getLastDepthNum(self):
        return int(self.lib.ds_frame_counter())

    # ---- colour / vertex / UV / sync surface (reference depthsense.cxx
    # getColourMap / getVertices(FP) / getUVMap / getSyncMap, :203-223) ----

    def getRGB(self):
        """(ok, (cH, cW, 3) uint8) from the colour stream."""
        h, w = self.lib.ds_colour_height(), self.lib.ds_colour_width()
        if h == 0 or w == 0:
            return False, None
        buf = np.empty((h, w, 3), np.uint8)
        ok = self.lib.ds_get_colour(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size
        )
        if not ok:
            return False, None
        if self.mirror:
            buf = buf[:, ::-1]
        return True, buf

    def getVertices(self, fp: bool = False):
        """(ok, (dH, dW, 3) vertex map in depth-camera mm); fp=False gives
        the reference's saturating int16 map, fp=True exact float32.

        mirror=True flips the pixel LAYOUT so the map stays per-pixel
        aligned with getDepth()/getSyncMap() (the reference never mirrors
        its raw maps because it never pairs them with mirrored frames);
        the metric x VALUES keep the physical camera's sign."""
        if self._shape is None:
            return False, None
        h, w = self._shape
        if fp:
            buf = np.empty((h, w, 3), np.float32)
            ok = self.lib.ds_get_vertices_fp(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.size
            )
        else:
            buf = np.empty((h, w, 3), np.int16)
            ok = self.lib.ds_get_vertices(
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), buf.size
            )
        if not ok:
            return False, None
        if self.mirror:
            buf = buf[:, ::-1]
        return True, buf

    def getUVMap(self):
        """(ok, (dH, dW, 2) normalized colour coords; invalid -> (-1,-1)).
        mirror flips the layout for depth-pixel alignment (see
        getVertices); the UV values still index the UNMIRRORED colour
        stream as delivered by the SDK."""
        if self._shape is None:
            return False, None
        h, w = self._shape
        buf = np.empty((h, w, 2), np.float32)
        ok = self.lib.ds_get_uv(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.size
        )
        if not ok:
            return False, None
        if self.mirror:
            buf = buf[:, ::-1]
        return True, buf

    def getSyncMap(self):
        """(ok, (dH, dW, 3) uint8 colour remapped onto depth pixels);
        mirrored with the depth frame (see getVertices)."""
        if self._shape is None:
            return False, None
        h, w = self._shape
        buf = np.empty((h, w, 3), np.uint8)
        ok = self.lib.ds_get_sync(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size
        )
        if not ok:
            return False, None
        if self.mirror:
            buf = buf[:, ::-1]
        return True, buf

    def getColorIntrinsics(self):
        vals = (ctypes.c_float * 4)()
        self.lib.ds_get_color_intrinsics(vals)
        return Camera(fx=vals[0], fy=vals[1], ux=vals[2], uy=vals[3],
                      width=self.lib.ds_colour_width(),
                      height=self.lib.ds_colour_height())

    def getExtrinsics(self):
        """Row-major (3, 4) [R|t]: colour-camera point = R @ X + t (mm)."""
        vals = (ctypes.c_float * 12)()
        self.lib.ds_get_extrinsics(vals)
        return np.array(vals[:], np.float32).reshape(3, 4)

    def getLastColorNum(self):
        return int(self.lib.ds_colour_frame_counter())
