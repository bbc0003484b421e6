"""Importer tests over synthetic dataset trees in the real file formats."""

import os
import struct

import numpy as np
import pytest
import scipy.io
from PIL import Image

from deepprior_tpu.camera import ICVL_CAMERA, MSRA15_CAMERA, NYU_CAMERA
from deepprior_tpu.data.dataset import NYUDataset
from deepprior_tpu.data.importers import ICVLImporter, MSRA15Importer, NYUImporter
from deepprior_tpu.data.synthetic import render_depth, synthetic_hand_pose
from deepprior_tpu.geometry import transform_points_2d


def _make_hand_scene(cam, rng, nj):
    d = rng.uniform(550.0, 750.0)
    com = np.array([cam.ux + rng.uniform(-40, 40), cam.uy + rng.uniform(-30, 30), d],
                   np.float32)
    com3d = np.asarray(cam.img_to_3d(com))
    pose = synthetic_hand_pose(rng, nj, spread_mm=60.0)
    dpt = render_depth(cam, com3d, pose)
    gt3d = pose + com3d
    gtorig = np.asarray(cam.three_d_to_img(gt3d))
    return dpt, gtorig, gt3d


# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def icvl_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("icvl")
    cam = ICVL_CAMERA
    rng = np.random.default_rng(1)
    os.makedirs(root / "Depth" / "seq1")
    lines = []
    truths = []
    for i in range(3):
        dpt, gtorig, gt3d = _make_hand_scene(cam, rng, 16)
        rel = f"seq1/image_{i:04d}.png"
        Image.fromarray(dpt.astype(np.uint16)).save(root / "Depth" / rel)
        vals = " ".join(f"{v:.4f}" for v in gtorig.reshape(-1))
        lines.append(f"{rel} {vals}")
        truths.append((gtorig, gt3d))
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    return str(root), truths


def test_icvl_import(icvl_tree, tmp_path):
    root, truths = icvl_tree
    imp = ICVLImporter(root, cache_dir=str(tmp_path / "cache"))
    seq = imp.loadSequence("train")
    assert len(seq.data) == 3
    assert seq.config["cube"] == (250, 250, 250)
    for frame, (gtorig, gt3d) in zip(seq.data, truths):
        assert frame.dpt.shape == (128, 128)
        # uint16 quantization of the PNG costs <1px / <2mm
        np.testing.assert_allclose(frame.gtorig, gtorig, atol=1.5)
        np.testing.assert_allclose(frame.gt3Dorig, gt3d, atol=3.0)
        # crop-transform invariant
        np.testing.assert_allclose(
            np.asarray(transform_points_2d(frame.gtorig, frame.T)),
            frame.gtcrop, atol=1e-2,
        )
        assert frame.side == "left"


def test_icvl_cache_roundtrip(icvl_tree, tmp_path):
    root, _ = icvl_tree
    cache = str(tmp_path / "cache")
    imp = ICVLImporter(root, cache_dir=cache)
    seq1 = imp.loadSequence("train")
    assert any(f.endswith(".npz") for f in os.listdir(cache))
    seq2 = imp.loadSequence("train")  # from cache
    np.testing.assert_array_equal(seq1.data[0].dpt, seq2.data[0].dpt)
    np.testing.assert_array_equal(seq1.data[2].gt3Dcrop, seq2.data[2].gt3Dcrop)


def test_icvl_nmax_and_shuffle(icvl_tree, tmp_path):
    root, _ = icvl_tree
    imp = ICVLImporter(root, use_cache=False)
    seq = imp.loadSequence("train", Nmax=2)
    assert len(seq.data) == 2
    rng = np.random.RandomState(0)
    seq = imp.loadSequence("train", shuffle=True, rng=rng)
    assert len(seq.data) == 3


def test_icvl_nmax_load_does_not_pollute_cache(icvl_tree, tmp_path):
    """A truncated (Nmax) cold load must NOT write the cache — the key
    does not encode Nmax, so a later full load would silently get the
    truncated sequence (a reference pickle-cache bug we do not keep)."""
    root, _ = icvl_tree
    cache = str(tmp_path / "cache")
    imp = ICVLImporter(root, cache_dir=cache)
    seq = imp.loadSequence("train", Nmax=2)
    assert len(seq.data) == 2
    assert not os.path.isdir(cache) or not os.listdir(cache)
    # full load now populates the cache with the COMPLETE sequence...
    assert len(imp.loadSequence("train").data) == 3
    assert any(f.endswith(".npz") for f in os.listdir(cache))
    # ...and cache hits truncate on read
    assert len(imp.loadSequence("train", Nmax=2).data) == 2
    assert len(imp.loadSequence("train").data) == 3


class _ShiftRefiner:
    """Stub CoM refiner: fixed (du, dv, 0) image-space shift, batched like
    CNNComRefiner (works on both numpy and jnp inputs)."""

    def __init__(self, du=3.0, dv=-2.0):
        self.delta = np.array([du, dv, 0.0], np.float32)

    def __call__(self, dpt, com, cube):
        return np.asarray(com, np.float32) + self.delta


def test_icvl_host_comref_matches_device_path(icvl_tree, tmp_path):
    """docom=True with an attached refine_net applies the refinement on
    the HOST crop path too (reference cropArea3D, handdetector.py:429-441)
    — the CoMs must match the batched device path, and differ from the
    unrefined 'com' mode."""
    root, _ = icvl_tree
    ref = _ShiftRefiner()
    imp_h = ICVLImporter(root, use_cache=False, refine_net=ref)
    imp_d = ICVLImporter(root, use_cache=False, refine_net=ref)
    imp_0 = ICVLImporter(root, use_cache=False)
    host = imp_h.loadSequence("train", docom=True, device_crop=False)
    dev = imp_d.loadSequence("train", docom=True, device_crop=True)
    plain = imp_0.loadSequence("train", docom=True, device_crop=False)
    assert len(host.data) == len(dev.data) == 3
    for fh, fd, fp in zip(host.data, dev.data, plain.data):
        # same refined CoM on both paths (host/device crops are bit-exact
        # on the crop grid; the CoM math is float-rounding close)
        np.testing.assert_allclose(fh.com, fd.com, atol=1e-3)
        # and the refinement actually happened
        np.testing.assert_allclose(fh.com[:2] - fp.com[:2],
                                   ref.delta[:2], atol=1e-3)
        np.testing.assert_allclose(fh.dpt, fd.dpt, atol=1e-3)


def test_icvl_baseline_loader(tmp_path):
    imp = ICVLImporter(str(tmp_path))
    vals = np.arange(16 * 3, dtype=np.float32) + 1.0
    vals[2::3] = 500.0  # depths
    (tmp_path / "base.txt").write_text(" ".join(str(v) for v in vals) + "\n\n")
    out = imp.loadBaseline(str(tmp_path / "base.txt"))
    assert len(out) == 1 and out[0].shape == (16, 3)
    assert out[0][0, 2] == 500.0


# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def nyu_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("nyu")
    cam = NYU_CAMERA
    rng = np.random.default_rng(2)
    os.makedirs(root / "test_1")
    n = 2
    j2d = np.zeros((n, 36, 3))
    j3d = np.zeros((n, 36, 3))
    truths = []
    for i in range(n):
        dpt, gtorig, gt3d = _make_hand_scene(cam, rng, 36)
        d16 = dpt.astype(np.uint16)
        rgb = np.zeros(dpt.shape + (3,), np.uint8)
        rgb[..., 1] = d16 >> 8
        rgb[..., 2] = d16 & 0xFF
        Image.fromarray(rgb).save(root / "test_1" / f"depth_1_{i + 1:07d}.png")
        j2d[i] = gtorig
        j3d[i] = gt3d
        truths.append((gtorig, gt3d))
    scipy.io.savemat(
        str(root / "test_1" / "joint_data.mat"),
        {"joint_uvd": j2d[None], "joint_xyz": j3d[None]},
    )
    return str(root), truths


def test_nyu_import_restricted(nyu_tree, tmp_path):
    root, truths = nyu_tree
    imp = NYUImporter(root, cache_dir=str(tmp_path / "c1"))
    seq = imp.loadSequence("test_1")
    assert len(seq.data) == 2
    assert seq.config["cube"] == (300, 300, 300)
    f = seq.data[0]
    assert f.gtorig.shape == (14, 3)  # restricted joint subset
    gtorig_full, _ = truths[0]
    np.testing.assert_allclose(
        f.gtorig, gtorig_full[imp.restricted_joints], atol=1.0
    )


def test_nyu_import_all_joints(nyu_tree, tmp_path):
    root, _ = nyu_tree
    imp = NYUImporter(root, cache_dir=str(tmp_path / "c2"), all_joints=True)
    seq = imp.loadSequence("test_1")
    assert seq.data[0].gtorig.shape == (36, 3)
    assert imp.crop_joint_idx == 32


def test_nyu_depth_packing(nyu_tree):
    root, truths = nyu_tree
    imp = NYUImporter(root, use_cache=False)
    dpt = imp.loadDepthMap(os.path.join(root, "test_1", "depth_1_0000001.png"))
    assert dpt.shape == (480, 640)
    assert dpt.max() > 256  # G<<8 decoding actually engaged


def test_nyu_dataset_stack(nyu_tree, tmp_path):
    root, _ = nyu_tree
    imp = NYUImporter(root, cache_dir=str(tmp_path / "c3"))
    seq = imp.loadSequence("test_1")
    ds = NYUDataset([seq], basepath=root)
    imgs, labels = ds.imgStackDepthOnly("test_1")
    assert imgs.shape == (2, 1, 128, 128)
    assert labels.shape == (2, 14, 3)
    assert imgs.min() >= -1.0 - 1e-5 and imgs.max() <= 1.0 + 1e-5
    zo, _ = ds.imgStackDepthOnly("test_1", normZeroOne=True)
    assert zo.min() >= -1e-5 and zo.max() <= 1.0 + 1e-5


def test_nyu_baseline_mat(nyu_tree, tmp_path):
    root, truths = nyu_tree
    imp = NYUImporter(root, use_cache=False)
    n, nj = 2, 14
    pred = np.zeros((n, nj, 3))
    for i, (gtorig, _) in enumerate(truths):
        pred[i, :, :2] = gtorig[imp.restricted_joints][:, :2]
    scipy.io.savemat(
        str(tmp_path / "test_predictions.mat"),
        {
            "pred_joint_uvconf": pred[None],
            "conv_joint_names": np.array([f"j{i}" for i in range(nj)])[None],
        },
    )
    # baseline loader reads depth from the same dir as the mat file
    import shutil

    for i in range(n):
        shutil.copy(
            os.path.join(root, "test_1", f"depth_1_{i + 1:07d}.png"),
            str(tmp_path / f"depth_1_{i + 1:07d}.png"),
        )
    gt = np.stack([imp.jointsImgTo3D(t[0][imp.restricted_joints]) for t in truths])
    gt_uvd = np.stack([t[0][imp.restricted_joints] for t in truths])
    out = imp.loadBaseline(str(tmp_path / "test_predictions.mat"), gt=gt_uvd)
    assert len(out) == 2 and out[0].shape == (14, 3)


def test_nyu_baseline_2d(nyu_tree, tmp_path):
    """loadBaseline2D (reference importers.py:1147-1174): zero-confidence
    joints dropped, survivors compacted to the front of each row."""
    root, truths = nyu_tree
    imp = NYUImporter(root, use_cache=False)
    n, nj = 2, 14
    pred = np.zeros((n, nj, 3))
    for i, (gtorig, _) in enumerate(truths):
        pred[i, :, :2] = gtorig[imp.restricted_joints][:, :2]
        pred[i, :, 2] = 1.0
    pred[1, 3] = 0.0  # all-zero joint must be dropped + compacted
    scipy.io.savemat(
        str(tmp_path / "pred2d.mat"),
        {
            "pred_joint_uvconf": pred[None],
            "conv_joint_names": np.array([f"j{i}" for i in range(nj)])[None],
        },
    )
    out = imp.loadBaseline2D(str(tmp_path / "pred2d.mat"))
    assert len(out) == 2 and out[0].shape == (nj, 2)
    # reference side effect (importers.py:1158): the importer's joint count
    # follows the loaded baseline's conv_joint_names
    assert imp.num_joints == nj
    np.testing.assert_allclose(out[0], pred[0, :, :2], rtol=1e-6)
    expect = np.zeros((nj, 2), np.float32)
    kept = np.concatenate([pred[1, :3, :2], pred[1, 4:, :2]])
    expect[: kept.shape[0]] = kept
    np.testing.assert_allclose(out[1], expect, rtol=1e-6)


# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def msra_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("msra")
    cam = MSRA15_CAMERA
    rng = np.random.default_rng(3)
    gdir = root / "P0" / "1"
    os.makedirs(gdir)
    n = 2
    lines = [str(n)]
    truths = []
    for i in range(n):
        d = rng.uniform(400.0, 600.0)
        com = np.array([cam.ux, cam.uy, d], np.float32)
        com3d = np.asarray(cam.img_to_3d(com))
        pose = synthetic_hand_pose(rng, 21, spread_mm=50.0)
        dpt = render_depth(cam, com3d, pose)
        gt3d = pose + com3d
        # labels store negated z (importers.py:688 negates on load)
        stored = gt3d.copy()
        stored[:, 2] *= -1.0
        lines.append(" ".join(f"{v:.4f}" for v in stored.reshape(-1)))
        # write .bin: full-image bbox of nonzero region
        rows, cols = np.nonzero(dpt)
        t, b = rows.min(), rows.max() + 1
        l, r = cols.min(), cols.max() + 1
        with open(gdir / f"{i:06d}_depth.bin", "wb") as f:
            f.write(struct.pack("<6i", dpt.shape[1], dpt.shape[0], l, t, r, b))
            dpt[t:b, l:r].astype(np.float32).tofile(f)
        truths.append((gt3d, dpt))
    (gdir / "joint.txt").write_text("\n".join(lines) + "\n")
    return str(root), truths


def test_msra_import(msra_tree, tmp_path):
    root, truths = msra_tree
    imp = MSRA15Importer(root, cache_dir=str(tmp_path / "c"))
    seq = imp.loadSequence("P0")
    assert len(seq.data) == 2
    assert seq.config["cube"] == (200, 200, 200)
    f = seq.data[0]
    gt3d, dpt_full = truths[0]
    np.testing.assert_allclose(f.gt3Dorig, gt3d, atol=1e-2)
    assert f.subSeqName == "1"
    # inverted-Y round trip held
    np.testing.assert_allclose(
        np.asarray(MSRA15_CAMERA.three_d_to_img(f.gt3Dorig)), f.gtorig, atol=1e-2
    )


def test_msra_bin_decode(msra_tree):
    root, truths = msra_tree
    imp = MSRA15Importer(root, use_cache=False)
    dpt = imp.loadDepthMap(os.path.join(root, "P0", "1", "000000_depth.bin"))
    np.testing.assert_allclose(dpt, truths[0][1], atol=1e-4)


def test_msra_subseq_filter(msra_tree, tmp_path):
    root, _ = msra_tree
    imp = MSRA15Importer(root, use_cache=False)
    seq = imp.loadSequence("P0", subSeq=["nonexistent"])
    assert len(seq.data) == 0
    seq = imp.loadSequence("P0", subSeq=["1"])
    assert len(seq.data) == 2
