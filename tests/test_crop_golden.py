"""Golden-value crop tests: tiny cases verified by hand.

SURVEY.md §4 calls for golden-value tests independent of any
implementation: these values are derived from the reference algorithm on
paper (floor(x+0.5) bounds, zero padding, z-thresholding, nearest resize,
center embed, [-1,1] normalization).
"""

import numpy as np
import pytest

from deepprior_tpu.ops.crop import (
    com_to_bounds,
    crop3d,
    crop_transform,
    normalize_crop,
)

FX = FY = 100.0


def test_golden_bounds():
    """com (8, 8, 500), cube 800mm, fx 100: half-extent 400mm at 500mm depth
    projects to 80px -> bounds 8-80=-72 .. 8+80=88; z in [100, 900]."""
    xs, xe, ys, ye, zs, ze = com_to_bounds(
        np.array([8.0, 8.0, 500.0]), (800.0, 800.0, 800.0), FX, FY, (16, 16)
    )
    assert (float(xs), float(xe), float(ys), float(ye)) == (-72.0, 88.0, -72.0, 88.0)
    assert (float(zs), float(ze)) == (100.0, 900.0)


def test_golden_crop_values():
    """4x4 image, com (2, 2, 500), cube (8, 8, 200)mm @ fx 100:
    half-extent 4mm at 500mm -> 0.8px -> bounds floor(2±0.8+0.5) = (1, 3)
    (a 2x2 bbox), z-range [400, 600].  dsize (4, 4): scale 4/2=2, resized
    size (4, 4), offsets 0.

    Source pixels [1:3, 1:3] = [[500, 300], [650, 0]]:
      300 < zstart=400 and != 0 -> 400 (near clamp)
      650 within [400, 600]? no, 650 > 600 -> 0 (backface)
      0 stays 0
    Nearest resize 2x2 -> 4x4 duplicates each pixel (src = floor(dst*0.5)).
    """
    dpt = np.zeros((4, 4), np.float32)
    dpt[1, 1] = 500.0
    dpt[1, 2] = 300.0
    dpt[2, 1] = 650.0
    dpt[2, 2] = 0.0
    com = np.array([2.0, 2.0, 500.0], np.float32)
    cube = np.array([8.0, 8.0, 200.0], np.float32)

    crop, m = crop3d(dpt[None], com[None], cube, FX, FY, dsize=(4, 4))
    crop = np.asarray(crop)[0]
    expect = np.array(
        [
            [500.0, 500.0, 400.0, 400.0],
            [500.0, 500.0, 400.0, 400.0],
            [0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(crop, expect)

    # transform: scale 2, translate -(1,1), offsets 0 -> M = [[2,0,-2],[0,2,-2]]
    m = np.asarray(m)[0]
    np.testing.assert_allclose(
        m, [[2.0, 0.0, -2.0], [0.0, 2.0, -2.0], [0.0, 0.0, 1.0]], atol=1e-5
    )

    # normalization: com_z 500, cube_z 200 -> background 0 -> +1,
    # 500 -> 0, 400 -> -1
    norm = np.asarray(normalize_crop(crop[None], com[None, 2], cube[None, 2]))[0]
    np.testing.assert_allclose(
        norm,
        [
            [0.0, 0.0, -1.0, -1.0],
            [0.0, 0.0, -1.0, -1.0],
            [1.0, 1.0, 1.0, 1.0],
            [1.0, 1.0, 1.0, 1.0],
        ],
        atol=1e-6,
    )


def test_golden_onehot_matches():
    """The one-hot MXU path reproduces the same golden values."""
    dpt = np.zeros((4, 4), np.float32)
    dpt[1, 1] = 500.0
    dpt[1, 2] = 300.0
    dpt[2, 1] = 650.0
    com = np.array([2.0, 2.0, 500.0], np.float32)
    cube = np.array([8.0, 8.0, 200.0], np.float32)
    ref, _ = crop3d(dpt[None], com[None], cube, FX, FY, dsize=(4, 4))
    out, _ = crop3d(dpt[None], com[None], cube, FX, FY, dsize=(4, 4),
                    method="onehot")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_golden_out_of_image_padding():
    """com at the image corner: out-of-image bbox parts are zero padding,
    which normalizes to the far face (+1)."""
    dpt = np.full((4, 4), 500.0, np.float32)
    com = np.array([0.0, 0.0, 500.0], np.float32)
    cube = np.array([8.0, 8.0, 200.0], np.float32)
    crop, _ = crop3d(dpt[None], com[None], cube, FX, FY, dsize=(4, 4))
    crop = np.asarray(crop)[0]
    # bbox (-1..1)^2: top-left 3 quadrant pixels out of image -> 0
    assert crop[0, 0] == 0.0 and crop[0, 2] == 0.0 and crop[2, 0] == 0.0
    assert crop[2, 2] == 500.0
