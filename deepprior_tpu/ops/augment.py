"""On-device training-time augmentation.

The reference runs augmentation (`NetTrainer.augmentCrop`, reference
src/trainer/nettrainer.py:919-997) in a pool of 8 multiprocessing workers
over shared memory, because cv2 warps on the host were the only option in
2015.  On TPU the whole thing is ~one batched affine warp, so it folds into
the jitted train step: zero host work, zero IPC, overlapped with nothing
because it costs next to nothing.

Semantics reproduced exactly (modulo documented deviations in ops/crop.py):
- mode sampled uniformly from `aug_modes` (subset of {com, rot, sc, none})
- com:  CoM shifted by N(0, sigma_com)^3 mm; patch re-warped through
        M_new . M^-1 (handdetector.py:678-710); labels shifted
- rot:  in-plane rotation by U(-rot_range, rot_range) deg about the patch
        center; labels rotated in 2D image space and re-projected
        (handdetector.py:712-747)
- sc:   metric cube scaled by |1 + N(0, sigma_sc)|; patch re-warped;
        labels unchanged, renormalized by the new cube
        (handdetector.py:750-780)
- the final renormalization maps premax/0/out-of-cube pixels to the cube
  faces exactly as nettrainer.py:985-997 does.

All modes are computed as *one* warp with a per-sample selected transform,
then per-sample selected labels — no data-dependent control flow.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from deepprior_tpu.camera import Camera
from deepprior_tpu.geometry import inv3x3, rotate_points_2d, rotation_matrix_2d
from deepprior_tpu.ops.crop import com_to_bounds, crop_transform, warp_patch

VALID_MODES = ("none", "com", "rot", "sc")
# NYU's invalid-depth marker survives in patches; the reference masks values
# close to it back to background after warping (nettrainer.py augment ->
# handdetector.py:793, nv_val=32000)
NV_VAL = 32000.0


def sample_augment_params(
    key,
    batch: int,
    num_modes: int,
    sigma_com: float = 5.0,
    sigma_sc: float = 0.02,
    rot_range: float = 180.0,
):
    """Draw per-sample augmentation parameters (nettrainer.py:954-957).

    Returns (mode_idx (B,), off (B, 3), rot (B,), sc (B,)).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mode = jax.random.randint(k1, (batch,), 0, num_modes)
    off = jax.random.normal(k2, (batch, 3)) * sigma_com
    rot = jax.random.uniform(k3, (batch,), minval=-rot_range, maxval=rot_range)
    sc = jnp.abs(1.0 + jax.random.normal(k4, (batch,)) * sigma_sc)
    return mode, off, rot, sc


def augment_batch(
    key,
    crops_norm,
    gt3d_crop,
    com,
    cube,
    m,
    camera: Camera,
    aug_modes: Sequence[str] = ("com", "rot", "none"),
    sigma_com: float = 5.0,
    sigma_sc: float = 0.02,
    rot_range: float = 180.0,
    norm_zero_one: bool = False,
    use_pallas: Optional[bool] = None,
    fuse_norm: Optional[bool] = None,
    block_k: Optional[int] = None,
    resize: str = "nearest",
):
    """Augment a batch of normalized crops + labels on device.

    crops_norm: (B, H, W) normalized crops ([-1,1] or [0,1])
    gt3d_crop:  (B, J, 3) CoM-centered 3D labels in mm (NOT normalized)
    com:        (B, 3) crop CoM in image coords (u, v, d)
    cube:       (B, 3) metric cubes in mm
    m:          (B, 3, 3) crop transforms (full frame -> patch)
    aug_modes:  static list, subset of {'com', 'rot', 'sc', 'none'}
    fuse_norm:  fold unnormalize/premax/threshold/renormalize into the
                Pallas warp kernel (one HBM pass instead of four —
                pallas_warp_norm); requires the Pallas path.  None keeps
                the measured default: OFF — the r5 in-scan A/B probe
                (prof_aug_ab.py, real TPU, interleaved reps) measured the
                fused kernel 0.91x/0.95x the unfused step at batch
                128/512; the per-sample kernel-step latency dominates, not
                HBM passes (docs/ROADMAP.md round-5 findings).  Agreement
                with the unfused pipeline is to f32 ulps (the fused
                unnormalize may FMA differently than XLA's).
    block_k:    samples per warp-kernel grid step (Pallas path only; one
                contiguous (K, H, W) DMA per step instead of K per-sample
                copies — see pallas_warp.pallas_warp_patch).  Bit-identical
                to the per-sample kernel.  None keeps per-sample.
    resize:     warp interpolation, mirroring the reference's resizeMethod
                dispatch inside rotateHand/recropHand (handdetector.py:
                731-737, 785-791): 'nearest' (RESIZE_CV2_NN, the default —
                and the ONLY method any reference config ever runs: nothing
                in the reference sets resizeMethod) or 'linear'
                (cv2.INTER_LINEAR float idealization; cv2's warp quantizes
                subpixel coords to 1/32 — docs/PARITY.md).  'linear' forces
                the gather warp (the Pallas kernel is nearest-only).

    Returns (crops_norm', labels_norm' (B, J, 3) scaled by cube'/2,
             com', cube', m').
    """
    for md in aug_modes:
        if md not in VALID_MODES:
            raise ValueError(f"unknown augmentation mode {md!r}")
    if resize not in ("nearest", "linear"):
        raise ValueError(f"unknown resize {resize!r} (nearest|linear)")
    if resize == "linear":
        # every Pallas-only knob must fail loudly, not silently drop the
        # requested kernel path (the warp kernels are nearest-only)
        if use_pallas:
            raise ValueError("the Pallas warp kernel is nearest-only; "
                             "use_pallas must be False/None with "
                             "resize='linear'")
        if fuse_norm:
            raise ValueError("fuse_norm runs the Pallas fused kernel, which "
                             "is nearest-only; fuse_norm must be False/None "
                             "with resize='linear'")
        if block_k:
            raise ValueError("block_k blocks the Pallas warp kernel, which "
                             "is nearest-only; block_k must be None with "
                             "resize='linear'")
        use_pallas = False
    crops_norm = jnp.asarray(crops_norm, jnp.float32)
    gt3d_crop = jnp.asarray(gt3d_crop, jnp.float32)
    com = jnp.asarray(com, jnp.float32)
    cube = jnp.broadcast_to(jnp.asarray(cube, jnp.float32), com.shape)
    m = jnp.asarray(m, jnp.float32)
    b, h, w = crops_norm.shape
    img_hw = (camera.height, camera.width)

    mode_idx, off, rot, sc = sample_augment_params(
        key, b, len(aug_modes), sigma_com, sigma_sc, rot_range
    )
    is_mode = {
        name: jnp.zeros((b,), bool) for name in VALID_MODES
    }
    for i, name in enumerate(aug_modes):
        is_mode[name] = is_mode[name] | (mode_idx == i)

    # zero-out parameters for non-selected modes, as the reference does
    off = jnp.where(is_mode["com"][:, None], off, 0.0)
    # mod ONCE, before both the image matrix and the label rotation use
    # the angle (rotateHand mods up front, handdetector.py:729) — modding
    # only one of the two would rotate pixels and labels by angles a ulp
    # apart
    rot = jnp.mod(jnp.where(is_mode["rot"], rot, 0.0), 360.0)
    sc = jnp.where(is_mode["sc"], sc, 1.0)

    # ---- per-mode geometry ----
    com3d = camera.img_to_3d(com)

    # com mode: shifted CoM
    new_com3d_c = com3d + off
    new_com_c = camera.three_d_to_img(new_com3d_c)

    # sc mode: scaled cube
    new_cube_s = cube * sc[:, None]

    # resulting (com, cube) per sample
    new_com = jnp.where(is_mode["com"][:, None], new_com_c, com)
    new_cube = jnp.where(is_mode["sc"][:, None], new_cube_s, cube)

    # new crop transform for com/sc (comToTransform semantics); for rot/none
    # M stays (rotateHand does not touch M, handdetector.py:712-747)
    m_new_geom = crop_transform(
        new_com, new_cube, camera.fx, camera.fy, img_hw, (w, h)
    )
    needs_recrop = is_mode["com"] | is_mode["sc"]
    m_out = jnp.where(needs_recrop[:, None, None], m_new_geom, m)

    # forward patch->patch transform:
    #   com/sc: M_new . M^-1   (recropHand, handdetector.py:791)
    #   rot:    R(-rot) about the patch center (rotateHand, 730-737)
    #   none:   identity
    m_inv = inv3x3(m)
    # HIGHEST: transform composition must not round through 1-pass bf16
    a_recrop = jnp.einsum(
        "bij,bjk->bik", m_new_geom, m_inv, precision=jax.lax.Precision.HIGHEST
    )

    center = jnp.array([w // 2, h // 2], jnp.float32)
    # forward patch->patch rotation = cv2.getRotationMatrix2D(center, -rot)
    # (rotateHand, handdetector.py:730): with cv2's row layout
    # [[cos t, sin t], [-sin t, cos t]] and t=-rot that is the POSITIVE
    # angle in the reference's rotatePoints2D convention -- the same
    # rotation applied to the labels below, so a blob and its label land
    # on the same pixel.
    a_rot = rotation_matrix_2d(
        jnp.broadcast_to(center, (b, 2)), rot
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
    a_fwd = jnp.where(
        needs_recrop[:, None, None],
        a_recrop,
        jnp.where(is_mode["rot"][:, None, None], a_rot, eye),
    )

    # ---- one warp for the whole batch ----
    # the Pallas MXU warp is ~8x faster on TPU; the gather path is the
    # reference for CPU/tests (bit-identical results, see test_pallas_warp)
    if use_pallas is None:
        from deepprior_tpu.ops.pallas_warp import ROW_CHUNK

        use_pallas = jax.default_backend() == "tpu" and (h % ROW_CHUNK == 0)
    if fuse_norm is None:
        # measured default: the fused kernel LOST its A/B (0.91x/0.95x at
        # batch 128/512, prof_aug_ab.py) — XLA already fuses the
        # elementwise un/renormalize into neighbours, so the kernel only
        # adds per-sample in-kernel epilogue latency
        fuse_norm = False

    # z-threshold about the (new) com with the *original* cube for sc mode
    # (scaleHand passes size=cube, handdetector.py:771-773), the new com for
    # com mode.  rot/none skip the re-threshold (no recrop happened).
    _, _, _, _, zs_t, ze_t = com_to_bounds(
        new_com, cube, camera.fx, camera.fy, img_hw
    )

    out = None
    if use_pallas and fuse_norm:
        # fused single-pass pipeline (pallas_warp_norm): unnormalize,
        # warp, threshold, renormalize without intermediate HBM round
        # trips — same selection math, f32-ulp agreement with the
        # unfused path (test_pallas_warp.py pins it)
        from deepprior_tpu.ops.pallas_warp import pallas_warp_norm

        out = pallas_warp_norm(
            crops_norm, a_fwd, com[:, 2], cube[:, 2], needs_recrop,
            zs_t, ze_t, new_com[:, 2], new_cube[:, 2],
            norm_zero_one=norm_zero_one, border=0.0, nv_val=NV_VAL,
        )
    else:
        # ---- unnormalize to mm (nettrainer.py:948-952) ----
        com_z = com[:, 2][:, None, None]
        cube_z = cube[:, 2][:, None, None]
        if norm_zero_one:
            img_mm = crops_norm * cube_z + (com_z - cube_z / 2.0)
        else:
            img_mm = crops_norm * (cube_z / 2.0) + com_z
        premax = jnp.max(img_mm, axis=(1, 2))
        if use_pallas:
            from deepprior_tpu.ops.pallas_warp import pallas_warp_patch

            bk = block_k if (block_k and b % block_k == 0) else None
            warped = pallas_warp_patch(
                img_mm, a_fwd, border=0.0, nv_val=NV_VAL, block_k=bk
            )
        else:
            warped = warp_patch(img_mm, a_fwd, border=0.0, nv_val=NV_VAL,
                                use_bilinear=(resize == "linear"))
        # 'none'/'rot'-with-rot==0 must be bit-exact passthrough; identity
        # warp is exact by construction (round-to-nearest of int coords;
        # bilinear: integer coords give frac 0, so the 1.0-weighted v00
        # tap passes through exactly)
        thresh = needs_recrop[:, None, None]
        zs_b = zs_t[:, None, None]
        ze_b = ze_t[:, None, None]
        warped = jnp.where(
            thresh & (warped < zs_b) & (warped != 0.0), zs_b, warped
        )
        warped = jnp.where(thresh & (warped > ze_b), 0.0, warped)

    # ---- labels ----
    # com: joints3D + com3D - new_com3D (moveCoM, handdetector.py:708)
    lab_com = gt3d_crop + (com3d - new_com3d_c)[:, None, :]
    # rot: project, rotate about com 2D, unproject (rotateHand, 740-745)
    joint2d = camera.three_d_to_img(gt3d_crop + com3d[:, None, :])
    rot2d = rotate_points_2d(joint2d, com[:, None, :2], rot[:, None])
    lab_rot = camera.img_to_3d(rot2d) - com3d[:, None, :]
    labels = jnp.where(
        is_mode["com"][:, None, None],
        lab_com,
        jnp.where(is_mode["rot"][:, None, None], lab_rot, gt3d_crop),
    )
    labels_norm = labels / (new_cube[:, 2] / 2.0)[:, None, None]

    if out is None:
        # ---- renormalize (nettrainer.py:985-997) ----
        ncz = new_com[:, 2][:, None, None]
        ncu = new_cube[:, 2][:, None, None]
        zend = ncz + ncu / 2.0
        zstart = ncz - ncu / 2.0
        d = warped
        d = jnp.where(d == premax[:, None, None], zend, d)
        d = jnp.where(d == 0.0, zend, d)
        d = jnp.clip(d, zstart, zend)
        if norm_zero_one:
            out = (d - zstart) / ncu
        else:
            out = (d - ncz) / (ncu / 2.0)

    return out, labels_norm, new_com, new_cube, m_out
