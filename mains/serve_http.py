"""HTTP pose-estimation service over the micro-batching server.

New capability beyond the reference (whose only online surface is the
local realtime window, reference realtimehandposepipeline.py:176-219):
a production-style serving daemon.  Concurrent POSTs are transparently
micro-batched into single fused-pipeline executions on the accelerator
(deepprior_tpu/realtime/batcher.py).

API:
  GET  /healthz          -> {"ok": true, "stats": {...}, "occupancy": f}
  POST /predict          body: npz with
                           depth (H, W) float32 raw mm   [required]
                           com   (3,)  float32 image uvd [required]
                           cube  (3,)  float32 mm        [optional]
                           mirror ()   bool              [optional]
                         -> {"joints": [[x, y, z] mm, ...],
                             "batch": realized device batch when served}

Run:  python mains/serve_http.py --port 8000 --max-batch 64
Test: tests/test_serving.py drives it in-process on the CPU mesh.
"""

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import common  # noqa: F401,E402  (platform pinning + compile cache)


def build_server(args):
    """Model + estimator + micro-batcher from the parsed flags."""
    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.realtime.fused import FusedEstimator

    if getattr(args, "artifact", None):
        # frozen serving artifact (realtime/export.py): weights + geometry
        # baked into one program; no model class or camera table loads.
        # Config is fixed, so per-request cube/mirror are rejected (the
        # batcher's sharded-style calling convention) and the compiled
        # batch IS the micro-batch.
        from deepprior_tpu.realtime.export import ArtifactEstimator
        from deepprior_tpu.realtime.batcher import MicroBatchServer

        est = ArtifactEstimator(args.artifact)
        return MicroBatchServer(
            est, variables=None, max_batch=est.batch,
            max_wait_ms=args.max_wait_ms, frame_shape=est.hw,
        )
    model, variables, prior = common.load_serving_net(
        args.model, ref_pickle=getattr(args, "ref_pickle", None),
        checkpoint=args.checkpoint,
    )
    est = FusedEstimator(model, NYU_CAMERA, prior=prior)
    if getattr(args, "export_artifact", None):
        from deepprior_tpu.realtime import export as xp

        hw = (NYU_CAMERA.height, NYU_CAMERA.width)
        if args.artifact_kind == "compiled":
            meta = xp.precompile_serving(
                est, variables, args.max_batch, hw, args.export_artifact
            )
        else:
            meta = xp.export_serving(
                est, variables, args.max_batch, hw, args.export_artifact
            )
        print(f"exported {meta['kind']} artifact "
              f"(batch {meta['batch']}, hw {meta['hw']}) -> "
              f"{args.export_artifact}", flush=True)
        return None
    return _wrap_server(args, est, variables)


def _wrap_server(args, est, variables):
    """Micro-batcher around the estimator; --dp > 1 shards over a mesh."""
    from deepprior_tpu.realtime.batcher import MicroBatchServer

    if args.dp > 1:
        # multi-chip online serving: batch shards over the dp mesh axis
        # (max_batch stays the compiled shape, so it must be a multiple
        # of dp — the batcher always pads to it)
        from deepprior_tpu.parallel import make_mesh
        from deepprior_tpu.parallel.serve import ShardedEstimator

        if args.max_batch % args.dp:
            raise SystemExit(
                f"--max-batch {args.max_batch} must be a multiple of "
                f"--dp {args.dp}"
            )
        sharded = ShardedEstimator(est, make_mesh(dp=args.dp), variables)
        return MicroBatchServer(
            sharded, variables=None, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
        )
    return MicroBatchServer(
        est, variables, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
    )


def make_handler(server):
    class Handler(BaseHTTPRequestHandler):
        # silence per-request stderr lines (stats live in /healthz)
        def log_message(self, fmt, *a):
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True,
                    "stats": dict(server.stats),
                    "occupancy": server.occupancy(),
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                data = np.load(io.BytesIO(self.rfile.read(n)))
                depth = np.asarray(data["depth"], np.float32)
                com = np.asarray(data["com"], np.float32)
                if depth.ndim != 2 or com.shape != (3,):
                    raise ValueError(
                        f"bad shapes: depth {depth.shape}, com {com.shape}"
                    )
                cube = (
                    np.asarray(data["cube"], np.float32)
                    if "cube" in data else None
                )
                mirror = bool(data["mirror"]) if "mirror" in data else False
            except Exception as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                fut = server.submit(depth, com, cube=cube, mirror=mirror)
            except ValueError as e:
                # request invalid for this deployment (shape mismatch,
                # per-request cube/mirror on a sharded server): client
                # error, not a 5xx that pages on server health
                self._json(400, {"error": f"bad request: {e}"})
                return
            except RuntimeError as e:  # submit raced shutdown
                self._json(503, {"error": str(e)})
                return
            try:
                joints = fut.result(timeout=60.0)
            except Exception as e:
                self._json(500, {"error": str(e)})
                return
            self._json(200, {
                "joints": np.asarray(joints, np.float64).tolist(),
                "batch": server.max_batch,
            })

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--model", default="poseregnet",
                   choices=["poseregnet", "resnet"])
    p.add_argument("--checkpoint", default=None,
                   help="trained network_prior.ckpt (random weights if "
                        "absent)")
    p.add_argument("--ref-pickle", default=None,
                   help="serve a reference-trained .pkl[.gz] net directly "
                        "(utils.refweights; head config inferred)")
    p.add_argument("--max-batch", type=int, default=64)
    p.add_argument("--max-wait-ms", type=float, default=2.0)
    p.add_argument("--dp", type=int, default=1,
                   help="shard each batch over a dp-way device mesh "
                        "(parallel/serve.py::ShardedEstimator)")
    p.add_argument("--artifact", default=None,
                   help="serve from a frozen artifact (realtime/export.py:"
                        " weights + geometry baked into one program; no "
                        "model/checkpoint flags needed, fixed config)")
    p.add_argument("--export-artifact", default=None,
                   help="write a frozen serving artifact for the current "
                        "model/checkpoint at batch --max-batch, then exit")
    p.add_argument("--artifact-kind", default="stablehlo",
                   choices=["stablehlo", "compiled"],
                   help="stablehlo: portable serialized program (current "
                        "backend by default); compiled: same-topology "
                        "restart with zero retrace/compile")
    args = p.parse_args(argv)

    server = build_server(args)
    if server is None:  # --export-artifact wrote the artifact and exits
        return
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(max_batch {args.max_batch}, max_wait {args.max_wait_ms}ms)",
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.close()


if __name__ == "__main__":
    main()
