"""Online-serving tests: micro-batching collector + HTTP front-end."""

import io
import threading
import time

import numpy as np
import pytest

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_frame
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import PCAPrior
from deepprior_tpu.realtime.batcher import MicroBatchServer
from deepprior_tpu.realtime.fused import FusedEstimator


@pytest.fixture(scope="module")
def setup():
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
    rng = np.random.default_rng(7)
    frames = [make_frame(cam, rng, num_joints=14) for _ in range(13)]
    depth = np.stack([f.extraData["dpt_full"] for f in frames])
    com = np.stack([f.com for f in frames])
    return est, variables, depth, com


def _reference_joints(est, variables, depth, com, max_batch):
    """What the batcher must produce: the fused pipeline at the compiled
    max_batch shape, tail-padded by repeating the last sample."""
    import jax.numpy as jnp

    n = depth.shape[0]
    pad = max_batch - n
    dp = np.concatenate([depth, np.repeat(depth[-1:], pad, 0)])
    cp = np.concatenate([com, np.repeat(com[-1:], pad, 0)])
    joints, _, _ = est(variables, jnp.asarray(dp), jnp.asarray(cp))
    return np.asarray(joints)[:n]


def test_batcher_matches_direct_pipeline(setup):
    """Concurrent submissions return bit-identical joints to one padded
    fused-pipeline call at the same compiled batch shape."""
    est, variables, depth, com = setup
    want = _reference_joints(est, variables, depth, com, max_batch=16)
    with MicroBatchServer(est, variables, max_batch=16,
                          max_wait_ms=200.0) as srv:
        futs = [srv.submit(depth[i], com[i]) for i in range(13)]
        got = np.stack([f.result(timeout=120) for f in futs])
    np.testing.assert_array_equal(got, want)
    assert srv.stats["frames"] == 13
    # all 13 arrived within the 200 ms window -> one batch
    assert srv.stats["batches"] == 1
    assert 0.0 < srv.occupancy() <= 1.0


def test_batcher_single_request_tail_pad(setup):
    """A lone request is served (padded batch) once max_wait elapses."""
    est, variables, depth, com = setup
    want = _reference_joints(est, variables, depth[:1], com[:1],
                             max_batch=8)
    with MicroBatchServer(est, variables, max_batch=8,
                          max_wait_ms=1.0) as srv:
        got = srv.submit(depth[0], com[0]).result(timeout=120)
    np.testing.assert_array_equal(got[None], want)


def test_batcher_per_request_cube_and_mirror(setup):
    """Mixed per-request cube/mirror ride the traced per-sample config —
    results match direct calls with the same (B,) config arrays."""
    import jax.numpy as jnp

    est, variables, depth, com = setup
    n, mb = 4, 8
    cube = np.array([300.0, 300.0, 300.0], np.float32)
    dp = np.concatenate([depth[:n], np.repeat(depth[n - 1:n], mb - n, 0)])
    cp = np.concatenate([com[:n], np.repeat(com[n - 1:n], mb - n, 0)])
    cubes = np.tile(np.asarray(est.cube, np.float32), (mb, 1))
    cubes[1] = cube
    mirrors = np.zeros(mb, bool)
    mirrors[2] = True
    joints, _, _ = est(variables, jnp.asarray(dp), jnp.asarray(cp),
                       cube=cubes, mirror=mirrors)
    want = np.asarray(joints)[:n]

    with MicroBatchServer(est, variables, max_batch=mb,
                          max_wait_ms=200.0) as srv:
        futs = [
            srv.submit(depth[0], com[0]),
            srv.submit(depth[1], com[1], cube=cube),
            srv.submit(depth[2], com[2], mirror=True),
            srv.submit(depth[3], com[3]),
        ]
        got = np.stack([f.result(timeout=120) for f in futs])
    np.testing.assert_array_equal(got, want)


def test_batcher_error_isolation(setup):
    """A malformed request fails AT SUBMIT (its caller alone); requests
    co-batched with it are unaffected and the server keeps serving."""
    est, variables, depth, com = setup
    with MicroBatchServer(est, variables, max_batch=4,
                          max_wait_ms=1.0) as srv:
        # 1-D "frame": the pipeline requires (H, W) depth
        with pytest.raises(ValueError):
            srv.submit(np.zeros((9,), np.float32), com[0])
        ok = srv.submit(depth[0], com[0]).result(timeout=120)
        assert ok.shape == (14, 3)
        # a stray RESOLUTION is also rejected per-request: np.stack over a
        # mixed batch would otherwise fail every co-batched future
        with pytest.raises(ValueError):
            srv.submit(np.zeros((32, 48), np.float32), com[0])
        ok2 = srv.submit(depth[0], com[0]).result(timeout=120)
        assert ok2.shape == (14, 3)
        assert srv.stats["errors"] == 0  # no batch ever failed


def test_batcher_mixed_shape_groups_are_isolated(setup):
    """Requests of different frame shapes never share one np.stack batch:
    a stray shape that slips past submit (the cameraless re-pin window
    after a failed batch clears _tentative_shape while validated requests
    are still queued) settles in its OWN group instead of failing every
    co-batched caller."""
    from concurrent.futures import Future

    from deepprior_tpu.realtime.batcher import _Request

    est, variables, depth, com = setup
    with MicroBatchServer(est, variables, max_batch=8,
                          max_wait_ms=50.0) as srv:
        stray = _Request(depth=np.zeros((32, 48), np.float32),
                         com=np.asarray(com[0], np.float32), cube=None,
                         mirror=False, future=Future())
        f_ok = srv.submit(depth[0], com[0])
        srv._q.put(stray)  # bypasses submit validation, like the window
        ok = f_ok.result(timeout=120)
        assert ok.shape == (14, 3)  # the honest caller is unaffected
        stray.future.exception(timeout=120)  # settled (either outcome)


def test_batcher_close_rejects_new_work(setup):
    est, variables, depth, com = setup
    srv = MicroBatchServer(est, variables, max_batch=4, max_wait_ms=1.0)
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(depth[0], com[0])


def test_batcher_concurrent_threads(setup):
    """Many submitter threads: every caller gets its own frame's joints
    (no cross-request mixups), batching actually occurs."""
    est, variables, depth, com = setup
    # per-sample reference, each in its own padded batch of the same
    # compiled shape: asserts results are independent of which other
    # requests happened to share the device batch
    want = np.concatenate([
        _reference_joints(est, variables, depth[i:i + 1], com[i:i + 1],
                          max_batch=8)
        for i in range(13)
    ])
    results = {}
    with MicroBatchServer(est, variables, max_batch=8,
                          max_wait_ms=50.0) as srv:
        def worker(i):
            results[i] = srv.submit(depth[i], com[i]).result(timeout=120)

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(13)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        batches = srv.stats["batches"]
    for i in range(13):
        np.testing.assert_array_equal(results[i], want[i])
    assert batches < 13  # micro-batching happened


# ----------------------------------------------------------------------
def test_http_server_roundtrip(setup):
    """mains/serve_http.py in-process: /predict micro-batches concurrent
    POSTs; /healthz reports stats."""
    import http.client
    import json
    import sys
    from http.server import ThreadingHTTPServer

    sys.path.insert(0, "mains")
    from serve_http import make_handler

    est, variables, depth, com = setup
    want = _reference_joints(est, variables, depth[:4], com[:4],
                             max_batch=8)
    srv = MicroBatchServer(est, variables, max_batch=8, max_wait_ms=50.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def post(i):
            buf = io.BytesIO()
            np.savez(buf, depth=depth[i], com=com[i])
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            conn.request("POST", "/predict", body=buf.getvalue())
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()
            out = json.loads(resp.read())
            conn.close()
            return np.asarray(out["joints"], np.float32)

        results = {}
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(i, post(i))
            )
            for i in range(4)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for i in range(4):
            np.testing.assert_allclose(results[i], want[i], atol=1e-4)

        # healthz surface
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        health = json.loads(resp.read())
        conn.close()
        assert health["ok"] and health["stats"]["frames"] >= 4

        # malformed body -> 400, server stays up
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/predict", body=b"not an npz")
        assert conn.getresponse().status == 400
        conn.close()
    finally:
        httpd.shutdown()
        srv.close()


def test_batcher_over_sharded_estimator(setup):
    """Multi-chip online serving: the batcher drives a ShardedEstimator
    (8-device dp mesh); results match the single-device padded pipeline,
    and per-request config is rejected up front."""
    from deepprior_tpu.parallel import make_mesh
    from deepprior_tpu.parallel.serve import ShardedEstimator

    est, variables, depth, com = setup
    mesh = make_mesh(dp=8, tp=1)
    sharded = ShardedEstimator(est, mesh, variables)
    want = _reference_joints(est, variables, depth[:5], com[:5],
                             max_batch=8)
    with MicroBatchServer(sharded, variables=None, max_batch=8,
                          max_wait_ms=200.0) as srv:
        with pytest.raises(ValueError):
            srv.submit(depth[0], com[0], mirror=True)
        futs = [srv.submit(depth[i], com[i]) for i in range(5)]
        got = np.stack([f.result(timeout=120) for f in futs])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_build_server_from_reference_pickle(tmp_path):
    """serve_http --ref-pickle: a reference-trained network_prior pickle
    builds a serving stack whose output matches the source net's decode."""
    import os
    import pickle
    import sys

    import jax
    import jax.numpy as jnp

    from deepprior_tpu.utils.refweights import reference_pickle_from_params

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "mains"))
    import serve_http

    src = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3, embedding=30,
                                      dropout=False))
    variables = src.init(jax.random.key(9), jnp.zeros((1, 128, 128, 1)))
    path = str(tmp_path / "network_prior.pkl")
    with open(path, "wb") as fh:
        pickle.dump(reference_pickle_from_params(variables), fh, protocol=2)

    args = type("A", (), dict(model="poseregnet", checkpoint=None, dp=1,
                              ref_pickle=path, max_batch=4,
                              max_wait_ms=1.0))()
    srv = serve_http.build_server(args)
    try:
        fr = make_frame(NYU_CAMERA, np.random.default_rng(11), num_joints=14)
        joints = srv.submit(fr.extraData["dpt_full"], fr.com).result(
            timeout=120
        )
        assert joints.shape == (14, 3)
        assert np.isfinite(joints).all()
    finally:
        srv.close()


def test_batcher_pins_resolution_from_camera(setup):
    """A wrong-resolution FIRST request must fail its own caller only —
    never lock the server to a stray shape (ADVICE r3): the pin comes
    from the estimator's camera, not from whoever submits first."""
    est, variables, depth, com = setup
    with MicroBatchServer(est, variables, max_batch=8,
                          max_wait_ms=1.0) as srv:
        with pytest.raises(ValueError, match="does not match"):
            srv.submit(np.zeros((64, 64), np.float32), com[0])
        # a correct-resolution request afterwards is served normally
        got = srv.submit(depth[0], com[0]).result(timeout=120)
        assert got.shape[-1] == 3


@pytest.mark.parametrize("kind", ["stablehlo", "compiled"])
def test_artifact_roundtrip_matches_pipeline(setup, tmp_path, kind):
    """Frozen serving artifacts (realtime/export.py): both kinds reproduce
    the live fused pipeline bit-exactly, and the ArtifactEstimator rides
    the micro-batcher's holds-its-own-weights convention."""
    import jax.numpy as jnp

    from deepprior_tpu.realtime import export as xp
    from deepprior_tpu.realtime.export import ArtifactEstimator

    est, variables, depth, com = setup
    b = 8
    hw = depth.shape[1:]
    path = str(tmp_path / f"serve_{kind}.dpx")
    if kind == "compiled":
        meta = xp.precompile_serving(est, variables, b, hw, path)
    else:
        meta = xp.export_serving(
            est, variables, b, hw, path, platforms=("cpu",)
        )
    assert meta["batch"] == b and tuple(meta["hw"]) == tuple(hw)

    ref, _, _ = est(
        variables, jnp.asarray(depth[:b]), jnp.asarray(com[:b])
    )
    art = ArtifactEstimator(path)
    got, _, _ = art(depth[:b], com[:b])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # through the micro-batcher (frozen config: batch == compiled shape)
    with MicroBatchServer(
        art, variables=None, max_batch=art.batch, max_wait_ms=1.0,
        frame_shape=art.hw,
    ) as srv:
        futs = [srv.submit(depth[i], com[i]) for i in range(b)]
        for i, f in enumerate(futs):
            np.testing.assert_array_equal(
                f.result(timeout=60), np.asarray(ref)[i]
            )
        # frozen config rejects per-request cube loudly
        with pytest.raises(ValueError, match="fixed-config"):
            srv.submit(depth[0], com[0], cube=np.array([300.0] * 3))


def test_artifact_kind_mismatch_rejected(setup, tmp_path):
    """Loaders refuse the wrong artifact kind with a clear message."""
    from deepprior_tpu.realtime import export as xp

    est, variables, depth, com = setup
    path = str(tmp_path / "serve.dpx")
    xp.export_serving(
        est, variables, 4, depth.shape[1:], path, platforms=("cpu",)
    )
    with pytest.raises(ValueError, match="stablehlo artifact"):
        xp.load_precompiled(path)
    fn, meta = xp.load_artifact(path)  # auto-dispatch still loads it
    assert meta["kind"] == "stablehlo"
