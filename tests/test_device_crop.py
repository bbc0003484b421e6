"""Batched device-crop import path vs. the host path."""

import numpy as np
import pytest

from deepprior_tpu.camera import ICVL_CAMERA


@pytest.fixture(scope="module")
def icvl_tree(tmp_path_factory):
    import os

    from PIL import Image

    from deepprior_tpu.data.synthetic import render_depth, synthetic_hand

    root = tmp_path_factory.mktemp("icvl_dev")
    cam = ICVL_CAMERA
    rng = np.random.default_rng(7)
    os.makedirs(root / "Depth" / "s")
    lines = []
    for i in range(5):
        d = rng.uniform(450.0, 700.0)
        com = np.array([cam.ux, cam.uy, d], np.float32)
        com3d = np.asarray(cam.img_to_3d(com))
        pose, fill, radii = synthetic_hand(rng, 16, spread_mm=60.0)
        pts = np.concatenate([pose, fill])
        rr = np.concatenate([np.full(len(pose), 14.0, np.float32), radii])
        dpt = render_depth(cam, com3d, pts, rr)
        gtorig = np.asarray(cam.three_d_to_img(pose + com3d))
        rel = f"s/img_{i:04d}.png"
        Image.fromarray(dpt.astype(np.uint16)).save(root / "Depth" / rel)
        vals = " ".join(f"{v:.4f}" for v in gtorig.reshape(-1))
        lines.append(f"{rel} {vals}")
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    return str(root)


def test_device_crop_matches_host(icvl_tree):
    from deepprior_tpu.data.importers import ICVLImporter

    imp_h = ICVLImporter(icvl_tree, use_cache=False)
    imp_d = ICVLImporter(icvl_tree, use_cache=False)
    host = imp_h.loadSequence("train")
    dev = imp_d.loadSequence("train", device_crop=True)
    assert len(host.data) == len(dev.data)
    for fh, fd in zip(host.data, dev.data):
        # bit-parity of the fused crop with the host oracle (sub-0.5%
        # disagreement budget at bbox rounding edges)
        mismatched = np.mean(np.abs(fh.dpt - fd.dpt) > 0.5)
        assert mismatched < 0.005
        np.testing.assert_allclose(fd.T, fh.T, rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(fd.com, fh.com, atol=1e-2)
        np.testing.assert_allclose(fd.gt3Dcrop, fh.gt3Dcrop, atol=0.1)
        np.testing.assert_allclose(fd.gtcrop, fh.gtcrop, atol=0.05)


def test_device_crop_docom(icvl_tree):
    from deepprior_tpu.data.importers import ICVLImporter

    imp = ICVLImporter(icvl_tree, use_cache=False)
    seq = imp.loadSequence("train", device_crop=True, docom=True)
    assert len(seq.data) == 5
    for f in seq.data:
        # docom recenters: the CoM moves toward the depth mass, and the
        # crop stays centered on it
        assert f.dpt.shape == (128, 128)
        assert np.isfinite(f.com).all()


@pytest.mark.slow
def test_load_refine_net_lazy(icvl_tree, tmp_path):
    """Checkpoint-path refine-net loading (the reference's loadRefineNetLazy
    surface, importers.py:175-184) + comref device import."""
    import jax
    import jax.numpy as jnp

    from deepprior_tpu.data.importers import ICVLImporter
    from deepprior_tpu.models import ScaleNet, ScaleNetConfig
    from deepprior_tpu.ops.refine_cnn import CNNComRefiner
    from deepprior_tpu.train.checkpoint import save_checkpoint

    model = ScaleNet(ScaleNetConfig(num_joints=1, n_dims=3))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    path = str(tmp_path / "refine.ckpt")
    save_checkpoint(path, {"params": variables["params"], "batch_stats": {}})

    imp = ICVLImporter(icvl_tree, use_cache=False)
    refiner = imp.load_refine_net_lazy(path)
    assert isinstance(refiner, CNNComRefiner)
    seq = imp.loadSequence("train", device_crop=True, docom=True)
    assert len(seq.data) == 5

    # passing an existing refiner through is a no-op wrap
    assert imp.load_refine_net_lazy(refiner) is refiner
