"""Shared wiring for the entry-point scripts.

The reference configures each experiment with inline constants in
main_*.py; here the same knobs are argparse flags with the reference
defaults (SURVEY.md §5 config system).  Every main supports --synthetic to
run the full pipeline on generated data when the real datasets are not on
disk (the reference had no such mode — its scripts hard-require the data).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor JAX_PLATFORMS even where a sitecustomize force-registers another
# backend (the env var alone does not stick there; the config API does)
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)

# persistent compilation cache: the axon tunnel remote-compiles every new
# computation (~10-60 s); caching makes repeat runs start in seconds.
# TPU-only: TPU entries are compiled server-side and survive sandbox host
# migrations, but CPU entries are host-AOT — after a migration every hit
# logs a cpu_aot_loader target-feature error and recompiles anyway, and
# serialize_executable round-trips of stale hits break (ROADMAP round-4
# environment findings), so CPU runs skip the persistent cache.
import jax as _jax

# decide from the CONFIGURED platform string, not default_backend():
# default_backend() initializes the PJRT backend at import time, which on a
# TPU host opens the axon tunnel (10-60 s before --help can print) and
# claims the chip for utility imports (CLAUDE.md: one TPU process at a
# time — even a probe steals the device from the next process to start).
_plat_cfg = (_jax.config.jax_platforms or "").lower()
if "cpu" not in _plat_cfg.split(","):
    _jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def _clear_backends():
    """Best-effort backend-cache reset across JAX versions: the public
    `jax.clear_backends` was removed (absent in 0.9), its replacement has
    moved between `jax.extend.backend` and `jax._src.xla_bridge`."""
    for get in (
        lambda: __import__("jax.extend.backend", fromlist=["x"]).clear_backends,
        lambda: _jax.clear_backends,
        lambda: __import__("jax._src.xla_bridge", fromlist=["x"])._clear_backends,
    ):
        try:
            fn = get()
        except (AttributeError, ImportError):
            continue
        fn()
        return


def require_accelerator(retries: int = 30, wait_s: float = 10.0):
    """Fail loudly (after retrying) if the accelerator backend silently
    fell back to CPU.

    The axon PJRT plugin registers in every interpreter but hands the one
    TPU to a single process; a second process quietly gets the CPU
    backend and a 100-epoch 'TPU' run then grinds (or OOMs) on host
    cores.  Called by the mains whenever JAX_PLATFORMS was not explicitly
    set to cpu.
    """
    import time

    for attempt in range(retries):
        if _jax.default_backend() != "cpu":
            return
        if attempt == 0:
            print("accelerator busy/unavailable; waiting for it...",
                  flush=True)
        time.sleep(wait_s)
        # re-resolving requires a fresh backend lookup; jax caches the
        # failure, so clear it (the API moved across JAX versions)
        _clear_backends()
    raise RuntimeError(
        "no accelerator available (default backend is cpu); refusing to "
        "train on host silently — set JAX_PLATFORMS=cpu to force CPU"
    )


def _compute_dtype(args):
    """Model compute dtype: bf16 when --bf16 (f32 master params; flax keeps
    parameters f32 and casts activations/weights per-op), else f32."""
    if getattr(args, "bf16", False):
        import jax.numpy as jnp

        return jnp.bfloat16
    import jax.numpy as jnp

    return jnp.float32


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--data", default=None, help="dataset base path")
    p.add_argument("--synthetic", action="store_true",
                   help="run on synthetic data (no dataset required)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--seed", type=int, default=23455)
    p.add_argument("--nmax", type=float, default=float("inf"),
                   help="cap on imported frames")
    p.add_argument("--eval-prefix", default=None)
    p.add_argument("--out", default="./eval")
    p.add_argument("--aug-modes", nargs="*", default=["com", "rot", "none"])
    p.add_argument("--aug-resize", choices=["nearest", "linear"],
                   default="nearest",
                   help="augmentation warp interpolation — the reference's "
                        "resizeMethod dispatch in rotateHand/recropHand "
                        "(handdetector.py:731-737, 785-791). nearest is the "
                        "reference default (the only method its configs "
                        "reach); linear forces the gather warp.")
    p.add_argument("--aug-block-k", type=int, default=None,
                   help="samples per warp-kernel grid step in the Pallas "
                        "augmentation path (one contiguous (K, H, W) DMA "
                        "per step; bit-identical to per-sample — "
                        "ops/pallas_warp.py block_k). Default: per-sample.")
    p.add_argument("--resnet-type", type=int, default=2,
                   help="reference ResNet head type 0-4 (resnet.py:119-195);"
                        " 2 = dropout head (default), 1 = plain head "
                        "(pair with --weightreg, the reference's recipe for "
                        "dropout-less nets)")
    p.add_argument("--weightreg", type=float, default=0.0,
                   help="L2 weight-decay factor; > 0 forces decay on even "
                        "for dropout models (the reference gates decay on "
                        "not-having-dropout, nettrainer.py:820-828)")
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial-partition size: shards the crop H axis "
                        "over an 'sp' mesh axis (GSPMD inserts the conv "
                        "halo exchanges) — for activation-memory scaling")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (f32 parameters/optimizer state; "
                        "the MXU's native dtype — ~matmul throughput x2). "
                        "Step-time neutral on the flagship configs (the "
                        "step is augment/elementwise/optimizer-bound) but "
                        "halves activation memory. Losses/metrics stay f32.")
    p.add_argument("--packed-conv", dest="packed_conv", action="store_true",
                   default=True,
                   help="MXU lane-packed conv+pool layers (same parameter "
                        "tree and arithmetic, equality-tested; ~10x conv "
                        "throughput / -14%% flagship step time on TPU; "
                        "models/layers._PackedConvPool). Default ON.")
    p.add_argument("--no-packed-conv", dest="packed_conv",
                   action="store_false",
                   help="disable the lane-packed conv formulation (use the "
                        "plain lax.conv path)")
    p.add_argument("--model", default="poseregnet",
                   choices=["poseregnet", "resnet"],
                   help="regressor family (reference: PoseRegNet in the "
                        "shipped mains, ResNet-47 for the paper's best "
                        "results / realtime demo)")
    p.add_argument("--accept", action="store_true",
                   help="acceptance mode: evaluate the combined test set "
                        "against the shipped baseline predictions, emit the "
                        "paper's curves (threshold curve, per-joint bars, "
                        "2D overlays), and exit non-zero unless the mean "
                        "error beats the BASELINE.md threshold")
    p.add_argument("--accept-mm", type=float, default=None,
                   help="acceptance threshold in mm (default: the "
                        "per-dataset BASELINE.md rebuild target)")
    p.add_argument("--baseline-file", default=None,
                   help="baseline predictions file (default: the dataset's "
                        "shipped file under --data, e.g. NYU "
                        "test/test_predictions.mat or ICVL "
                        "LRF_Results_seq_1.txt)")
    p.add_argument("--resume", action="store_true",
                   help="resume from <out>/<prefix>/net_last.ckpt if present "
                        "(full state: params, BN stats, optimizer moments, "
                        "epoch; the RNG streams fast-forward so the resumed "
                        "run is bit-identical to an uninterrupted one)")
    p.add_argument("--validation-frequency", type=int, default=None,
                   help="run the validation observers every N minibatches "
                        "inside the epoch (reference validation_frequency="
                        "1000, nettrainer.py:859-889); default: epoch "
                        "boundaries only")
    p.add_argument("--streamed", action="store_true",
                   help="train via fit_streamed: the dataset stays in host "
                        "RAM and macro chunks stream through a "
                        "double-buffered device prefetcher — for datasets "
                        "larger than HBM (loss trace identical to the "
                        "HBM-resident path)")
    p.add_argument("--chunk-steps", type=int, default=8,
                   help="minibatches staged per streamed dispatch")
    p.add_argument("--sharded-snapshots", action="store_true",
                   help="write rolling snapshots as sharded orbax/"
                        "tensorstore directories (async: training "
                        "continues while the write drains; each process "
                        "writes only its local shards — the multi-host "
                        "format). --resume auto-detects either format")
    return p


def load_serving_net(model_name, ref_pickle=None, checkpoint=None):
    """Model + variables + prior for the serving entry points (shared by
    demo_realtime and serve_http so the checkpoint tree layout lives in
    exactly one place).

    Resolution order: a reference-trained pickle (utils.refweights; must
    carry its own appended decode layer, reference
    main_nyu_posereg_embedding.py:148-158), else a network_prior.ckpt as
    written by run_posereg_embedding, else random weights + random prior
    (pipeline smoke mode).  Returns (model, variables, prior) where prior
    is None when the net decodes to mm joints itself."""
    import jax
    import jax.numpy as jnp

    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.prior import PCAPrior

    if ref_pickle:
        from deepprior_tpu.utils.refweights import (
            model_from_reference_pickle,
        )

        model, variables, needs_prior = model_from_reference_pickle(
            ref_pickle, model_name
        )
        if needs_prior:
            raise SystemExit(
                "this pickle emits the PCA embedding without the decode "
                "layer; use the network_prior.pkl form the reference main "
                "saved (decode appended), or a --checkpoint that carries "
                "the prior"
            )
        return model, variables, None  # the appended decode layer decodes
    if model_name == "resnet":
        from deepprior_tpu.models import ResNet, ResNetConfig

        # the reference realtime demo uses ResNet type 1 (30-D bottleneck)
        model = ResNet(ResNetConfig(num_joints=1, n_dims=30))
    else:
        model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    if checkpoint:
        from deepprior_tpu.train.checkpoint import load_checkpoint

        tree = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "pca_components": np.zeros((30, 42), np.float32),
            "pca_mean": np.zeros(42, np.float32),
        }
        tree, _ = load_checkpoint(checkpoint, tree)
        variables = {"params": tree["params"]}
        if tree["batch_stats"]:  # ResNet needs its BN running stats back
            variables["batch_stats"] = tree["batch_stats"]
        prior = PCAPrior(tree["pca_components"], tree["pca_mean"])
    else:
        rng = np.random.default_rng(0)
        prior = PCAPrior(
            components=rng.standard_normal((30, 42)).astype(np.float32)
            * 0.05,
            mean=np.zeros(42, np.float32),
        )
    return model, variables, prior


def _maybe_resume(args, trainer, state, outdir):
    """Restore the rolling snapshot written by fit() when --resume.

    Returns (state, start_epoch)."""
    from deepprior_tpu.train.checkpoint_sharded import is_sharded_checkpoint

    snap = os.path.join(outdir, "net_last.ckpt")
    if getattr(args, "resume", False) and (
        os.path.isfile(snap) or is_sharded_checkpoint(snap)
    ):
        state, start_epoch = trainer.load_train_state(snap, state)
        print(f"resuming from {snap} at epoch {start_epoch}", flush=True)
        return state, start_epoch
    return state, 0


def load_or_synthesize(args, importer_cls, camera, train_seq, test_seqs,
                       num_joints, docom=False):
    """Returns (train ImageSequence, [test ImageSequences])."""
    from deepprior_tpu.data.synthetic import make_sequence

    if args.data is None and not args.synthetic:
        # keep every downstream synthetic-mode predicate (n_poses cap,
        # acceptance labeling) consistent with what actually loaded
        print("note: --data not given; running on synthetic fixtures "
              "(as if --synthetic)", flush=True)
        args.synthetic = True
    if args.synthetic:
        n_train = 256 if np.isinf(args.nmax) else int(args.nmax)
        train = make_sequence(camera, n_train, num_joints=num_joints,
                              seed=args.seed, name=train_seq, docom=docom)
        tests = [
            make_sequence(camera, max(32, n_train // 8), num_joints=num_joints,
                          seed=args.seed + 1 + i, name=name, docom=docom)
            for i, name in enumerate(test_seqs)
        ]
        return train, tests
    imp = importer_cls(args.data)
    rng = np.random.RandomState(args.seed)
    train = imp.loadSequence(train_seq, Nmax=args.nmax, shuffle=True, rng=rng,
                             docom=docom)
    tests = [imp.loadSequence(s, Nmax=args.nmax, docom=docom) for s in test_seqs]
    return train, tests


def make_trainer(model, cfg, camera, prior=None, dp=None, tp=1, sp=1):
    """Single-chip Trainer, or DistributedTrainer over a ('dp','tp') mesh
    (('dp','sp','tp') with sp > 1) when more than one device is available."""
    import jax

    from deepprior_tpu.parallel import DistributedTrainer, make_mesh
    from deepprior_tpu.train.trainer import Trainer

    n = len(jax.devices())
    if n > 1:
        mesh = make_mesh(dp=dp, tp=tp or 1, sp=sp or 1)
        return DistributedTrainer(model, cfg, camera, mesh, prior=prior)
    return Trainer(model, cfg, camera, prior=prior)


def _load_baseline_predictions(args, importer_cls, baseline_spec, gt_full):
    """Resolve and load the shipped baseline prediction file (Tompson .mat
    via importer.loadBaseline with gt depth-fixup, reference
    main_nyu_posereg_embedding.py:192; LRF .txt, main_icvl:184).

    One code path for both the posereg acceptance gate and the com_refine
    epilogue (they previously duplicated this block).  Returns
    (preds, bl_path) truncated to gt_full's frame count, or (None, None)
    when no baseline file is configured/present.
    """
    bl_path = args.baseline_file
    if bl_path is None and args.data and baseline_spec:
        cand = os.path.join(args.data, baseline_spec["relpath"])
        bl_path = cand if os.path.isfile(cand) else None
    if not (bl_path and baseline_spec):
        return None, None
    imp = importer_cls(args.data or os.path.dirname(bl_path) or ".")
    if baseline_spec["kind"] == "mat":
        preds = imp.loadBaseline(bl_path, gt=gt_full)
    else:
        preds = imp.loadBaseline(bl_path)
    return np.asarray(preds[: gt_full.shape[0]], np.float32), bl_path


def _plot_training_curves(hist, outdir, prefix):
    """Semilogy cost/error curves, always emitted after training — the
    reference writes them unconditionally on every main
    (main_nyu_posereg_embedding.py:133-142, main_nyu_com_refine.py:198-207).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    written = []
    for series, tag in ((hist.get("train_cost"), "cost"),
                        (hist.get("val_error_mm"), "errs")):
        if not series:
            continue
        fig = plt.figure()
        plt.semilogy(np.asarray(series))
        path = os.path.join(outdir, f"{prefix}_{tag}.png")
        fig.savefig(path)
        plt.close(fig)
        written.append(path)
    return written


def _plot_overlays(hpe, camera, seq, joints, prefix, stride=20):
    """Every-`stride`-th-frame 2D skeleton overlays of one test sequence —
    the reference emits these on every flagship run
    (main_nyu_posereg_embedding.py:199-205).  `joints` are the predicted
    (N, J, 3) mm poses aligned with `seq.data`."""
    from deepprior_tpu.geometry import transform_points_2d_np

    written = []
    for ind in range(0, len(seq.data), stride):
        fr = seq.data[ind]
        jt_img = camera.three_d_to_img_np(joints[ind])
        jt2d = transform_points_2d_np(jt_img, fr.T)
        written.append(
            hpe.plotResult(fr.dpt, fr.gtcrop, jt2d, name=f"{prefix}_{ind}")
        )
    return written


def _acceptance(args, importer_cls, camera, eval_cls, tests, all_gt3d,
                all_joints, outdir, prefix, baseline_spec, accept_mm):
    """Acceptance gate (VERDICT r2 #7): the reference's baseline-comparison
    epilogue (main_nyu_posereg_embedding.py:161-205) as a turnkey command.

    Builds one evaluation over the combined test set (the reference extends
    gt3D across all test seqs before comparing, main:163-166), loads the
    shipped baseline predictions (_load_baseline_predictions), emits the
    paper's curves — the frames-within-threshold success curve + per-joint
    bars (plotEvaluation with the baseline overlaid, main:197) — and
    asserts the BASELINE.md rebuild-target mean error.  (The
    every-20th-frame overlays, main:199-205, are emitted unconditionally
    by run_posereg_embedding, not just under --accept.)

    Returns the record written into results.json; raises SystemExit when
    the threshold is missed so CI/scripts get a non-zero exit.
    """
    thr = args.accept_mm if args.accept_mm is not None else accept_mm
    gt = np.concatenate(all_gt3d, axis=0)
    joints = np.concatenate(all_joints, axis=0)
    hpe = eval_cls(gt, joints)
    hpe.subfolder = outdir

    baseline = []
    rec = {"mean_mm": float(hpe.getMeanError()),
           "max_mm": float(hpe.getMaxError()),
           "threshold_mm": float(thr),
           "n_test_frames": int(gt.shape[0]),
           # a synthetic-fixture run is a smoke test of the harness, not
           # evidence against the real-dataset BASELINE.md target
           "synthetic": bool(getattr(args, "synthetic", False))}
    preds, bl_path = _load_baseline_predictions(
        args, importer_cls, baseline_spec, gt
    )
    if preds is not None:
        hpe_base = eval_cls(gt[: preds.shape[0]], preds)
        hpe_base.subfolder = outdir
        baseline = [(baseline_spec["label"], hpe_base)]
        rec["baseline"] = {"label": baseline_spec["label"],
                           "mean_mm": float(hpe_base.getMeanError()),
                           "file": bl_path}
        print(f"baseline {baseline_spec['label']}: "
              f"mean {hpe_base.getMeanError():.3f}mm", flush=True)

    hpe.plotEvaluation(f"{prefix}_accept", methodName="Our regr",
                       baseline=baseline)

    rec["pass"] = bool(rec["mean_mm"] < thr)
    status = "PASS" if rec["pass"] else "FAIL"
    if rec["synthetic"]:
        status += " (synthetic smoke)"
    print(f"acceptance [{status}]: mean {rec['mean_mm']:.3f}mm "
          f"vs threshold {thr:.3f}mm over {rec['n_test_frames']} frames",
          flush=True)
    return rec


def run_posereg_embedding(args, importer_cls, camera, train_seq, test_seqs,
                          num_joints, eval_cls, n_pca=30,
                          baseline_spec=None, accept_mm=10.0):
    """The flagship recipe (reference main_nyu_posereg_embedding.py:38-205):
    import -> PCA prior from 1e6 sampled poses -> PoseRegNet 30-D embedding
    training with augmentation -> decode -> metric evaluation.

    baseline_spec/accept_mm configure the --accept gate (see _acceptance):
    {"label", "relpath", "kind": "mat"|"txt"} and the BASELINE.md mean-mm
    rebuild target."""
    from deepprior_tpu.models import (
        PoseRegNet,
        PoseRegNetConfig,
        ResNet,
        ResNetConfig,
    )
    from deepprior_tpu.prior import fit_pose_prior
    from deepprior_tpu.train.trainer import TrainConfig, TrainData

    prefix = args.eval_prefix or f"{train_seq}_EMB_PCA{n_pca}"
    outdir = os.path.join(args.out, prefix)
    os.makedirs(outdir, exist_ok=True)

    if not _plat:
        require_accelerator()
    import jax

    print(f"[{time.strftime('%H:%M:%S')}] backend={jax.default_backend()} "
          f"loading data...", flush=True)
    train, tests = load_or_synthesize(
        args, importer_cls, camera, train_seq, test_seqs, num_joints
    )
    data = TrainData.from_sequence(train)
    val = TrainData.from_sequence(tests[0]) if tests else None

    print(f"[{time.strftime('%H:%M:%S')}] {data.crops.shape[0]} train frames;"
          " fitting pose prior...", flush=True)
    rng = np.random.default_rng(args.seed)
    n_poses = 1_000_000 if not args.synthetic else 50_000
    prior = fit_pose_prior(
        camera, rng, data.gt3d_crop, data.com, data.cube,
        n_components=n_pca, num_poses=n_poses, aug_modes=tuple(args.aug_modes),
    )
    print(f"[{time.strftime('%H:%M:%S')}] prior ready; training...",
          flush=True)

    has_dropout = True
    if getattr(args, "model", "poseregnet") == "resnet":
        rtype = getattr(args, "resnet_type", 2)
        has_dropout = rtype in (2, 3, 4)
        model = ResNet(
            ResNetConfig(
                num_joints=1, n_dims=n_pca, dropout=has_dropout,
                dtype=_compute_dtype(args),
                packed_conv=getattr(args, "packed_conv", False),
            )
        )
    else:
        model = PoseRegNet(
            PoseRegNetConfig(
                num_joints=1, n_dims=n_pca, dtype=_compute_dtype(args),
                packed_conv=getattr(args, "packed_conv", False),
            )
        )
    wr = getattr(args, "weightreg", 0.0)
    cfg = TrainConfig(
        batch_size=args.batch_size, learning_rate=args.lr,
        n_epochs=args.epochs, aug_modes=tuple(args.aug_modes), seed=args.seed,
        weightreg_factor=wr,
        model_has_dropout=has_dropout and wr <= 0.0,
        validation_frequency=getattr(args, "validation_frequency", None),
        aug_block_k=getattr(args, "aug_block_k", None),
        aug_resize=getattr(args, "aug_resize", "nearest"),
    )
    trainer = make_trainer(model, cfg, camera, prior=prior, dp=args.dp,
                           tp=args.tp, sp=args.sp)
    trainer.sharded_snapshots = getattr(args, "sharded_snapshots", False)
    state = trainer.init_state(np.asarray(data.crops[: args.batch_size]))
    streamed = getattr(args, "streamed", False)
    if streamed:
        # the dataset stays host-resident; macro chunks stream to device
        arrays = {k: np.asarray(getattr(data, k))
                  for k in ("crops", "gt3d_crop", "com", "cube", "m")}
    elif hasattr(trainer, "place_data"):
        data = trainer.place_data(data)
    state, start_epoch = _maybe_resume(args, trainer, state, outdir)
    t0 = time.time()
    if streamed:
        state, hist = trainer.fit_streamed(
            state, arrays, val_data=val,
            snapshot_path=os.path.join(outdir, "net"),
            start_epoch=start_epoch,
            chunk_steps=getattr(args, "chunk_steps", 8),
        )
    else:
        state, hist = trainer.fit(
            state, data, val_data=val,
            snapshot_path=os.path.join(outdir, "net"),
            start_epoch=start_epoch,
        )
    print(f"training took {time.time() - t0:.1f}s")

    # always-on training-curve artifacts (reference main:133-142 writes the
    # semilogy cost/err PNGs on every run, not only under --accept)
    _plot_training_curves(hist, outdir, prefix)

    # save final net + prior (the reference appends the PCA decode layer and
    # saves network_prior.pkl, main:148-158)
    from deepprior_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(
        os.path.join(outdir, "network_prior.ckpt"),
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "pca_components": prior.components,
            "pca_mean": prior.mean,
        },
        config=cfg._asdict(),
    )

    # test: decode to mm and run the metric suite (main:161-205)
    import json

    metrics = {}
    results = {}
    all_gt3d = []
    all_joints = []
    for seq in tests:
        tdata = TrainData.from_sequence(seq)
        emb = trainer.predict(state, np.asarray(tdata.crops))
        decoded = np.asarray(prior.inverse_transform(emb)).reshape(
            emb.shape[0], -1, 3
        )
        cube_z = np.asarray(tdata.cube)[:, 2][:, None, None]
        com3d = camera.img_to_3d_np(np.asarray(tdata.com))
        joints = decoded * (cube_z / 2.0) + com3d[:, None, :]
        gt3d = np.stack([f.gt3Dorig for f in seq.data])
        all_gt3d.append(gt3d)
        all_joints.append(joints)
        hpe = eval_cls(gt3d, joints)
        hpe.subfolder = outdir
        print(f"{seq.name}: mean {hpe.getMeanError():.3f}mm "
              f"max {hpe.getMaxError():.3f}mm")
        hpe.plotEvaluation(f"{prefix}_{seq.name}")
        results[seq.name] = hpe
        metrics[seq.name] = {
            "mean_mm": hpe.getMeanError(),
            "max_mm": hpe.getMaxError(),
            # median of per-frame mean errors — the repo's scalar summary
            # (NOT the reference getMedianError, which is the (J,) array
            # recorded next; see docs/MIGRATION.md "metric semantics")
            "median_mm": float(np.median(hpe.getMeanErrorOverSeq())),
            # reference getMedianError semantics: per-joint medians
            # (handpose_evaluation.py:114-121)
            "joint_median_mm": [float(m) for m in hpe.getMedianError()],
            "frames_within_40mm": hpe.getFractionWithinMaxDist(40.0),
            "per_joint_mean_mm": [
                hpe.getJointMeanError(j) for j in range(joints.shape[1])
            ],
        }
    # always-on 2D overlays of the first test seq, every 20th frame
    # (reference main:199-205 emits these on every flagship run)
    if tests:
        _plot_overlays(results[tests[0].name], camera, tests[0],
                       all_joints[0], prefix)
    accept_rec = None
    if getattr(args, "accept", False) and tests:
        accept_rec = _acceptance(
            args, importer_cls, camera, eval_cls, tests, all_gt3d,
            all_joints, outdir, prefix, baseline_spec, accept_mm,
        )
        metrics["acceptance"] = accept_rec
    # per-run result record (the reference pickles results under
    # eval/<prefix>/, main:184; a JSON is the durable equivalent)
    with open(os.path.join(outdir, "results.json"), "w") as fh:
        json.dump(metrics, fh, indent=1)
    if accept_rec is not None and not accept_rec["pass"]:
        raise SystemExit(
            f"acceptance FAILED: {accept_rec['mean_mm']:.3f}mm >= "
            f"{accept_rec['threshold_mm']:.3f}mm"
        )
    return state, results


def run_com_refine(args, importer_cls, camera, train_seq, test_seqs,
                   num_joints, crop_joint_idx, eval_cls,
                   baseline_spec=None, accept_mm=None):
    """CoM refinement training (reference main_nyu_com_refine.py): ScaleNet
    over docom crops, labels = crop-joint offset from the detected CoM.

    The full reference epilogue (main_nyu_com_refine.py:198-251, mirrored
    in the ICVL/MSRA variants): training-curve plots, result persistence,
    then the three-way HandposeEvaluation — the refined CoM as a 1-joint
    pose vs gt3Dorig[crop_joint_idx], the shipped-baseline crop joint
    (Tompson .mat on NYU, LRF .txt on ICVL; MSRA ships none), and the raw
    detected CoM — plus the success-curve plot with the CoM baseline
    overlaid (main_msra15_com_refine.py:257) and a results.json record.

    --accept gates on the refined mean error: the threshold is
    --accept-mm, else `accept_mm`, else the raw-CoM mean (refinement must
    at least beat the detector it refines)."""
    import json

    from deepprior_tpu.models import ScaleNet, ScaleNetConfig
    from deepprior_tpu.train.trainer import TrainConfig, TrainData

    prefix = args.eval_prefix or f"{train_seq}_COM"
    outdir = os.path.join(args.out, prefix)
    os.makedirs(outdir, exist_ok=True)

    if not _plat:
        require_accelerator()
    train, tests = load_or_synthesize(
        args, importer_cls, camera, train_seq, test_seqs, num_joints, docom=True
    )

    def to_refine_data(seq):
        data = TrainData.from_sequence(seq)
        gt3d = np.asarray(data.gt3d_crop)[:, crop_joint_idx : crop_joint_idx + 1, :]
        return data._replace(gt3d_crop=gt3d)

    data = to_refine_data(train)
    val = to_refine_data(tests[0]) if tests else None

    model = ScaleNet(
        ScaleNetConfig(
            num_joints=1, n_dims=3, dtype=_compute_dtype(args),
            packed_conv=getattr(args, "packed_conv", False),
        )
    )
    wr = getattr(args, "weightreg", 0.0)
    cfg = TrainConfig(
        batch_size=min(args.batch_size, 64),  # reference uses 64 (main:164)
        learning_rate=args.lr, n_epochs=args.epochs,
        aug_modes=tuple(args.aug_modes), seed=args.seed,
        weightreg_factor=wr, model_has_dropout=wr <= 0.0,
        # the reference CoM recipe disables early stopping (main:170)
        use_early_stopping=False,
        validation_frequency=getattr(args, "validation_frequency", None),
        aug_block_k=getattr(args, "aug_block_k", None),
        aug_resize=getattr(args, "aug_resize", "nearest"),
    )
    trainer = make_trainer(model, cfg, camera, prior=None, dp=args.dp,
                           tp=args.tp, sp=args.sp)
    trainer.sharded_snapshots = getattr(args, "sharded_snapshots", False)
    state = trainer.init_state(np.asarray(data.crops[: cfg.batch_size]))
    streamed = getattr(args, "streamed", False)
    if streamed:
        arrays = {k: np.asarray(getattr(data, k))
                  for k in ("crops", "gt3d_crop", "com", "cube", "m")}
    elif hasattr(trainer, "place_data"):
        data = trainer.place_data(data)
    state, start_epoch = _maybe_resume(args, trainer, state, outdir)
    if streamed:
        state, hist = trainer.fit_streamed(
            state, arrays, val_data=val,
            snapshot_path=os.path.join(outdir, "net"),
            start_epoch=start_epoch,
            chunk_steps=getattr(args, "chunk_steps", 8),
        )
    else:
        state, hist = trainer.fit(
            state, data, val_data=val,
            snapshot_path=os.path.join(outdir, "net"),
            start_epoch=start_epoch,
        )

    from deepprior_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(
        os.path.join(outdir, f"net_{prefix}.ckpt"),
        {"params": state.params, "batch_stats": state.batch_stats},
        config=cfg._asdict(),
    )

    # training-curve plots (reference main:198-207: semilogy cost + errs)
    _plot_training_curves(hist, outdir, prefix)

    if not tests:
        return state

    # TEST (main:215-233): refined CoM = net offset * cube_z/2 + detected
    # CoM (mm), evaluated as a 1-joint pose against gt3Dorig[crop_joint]
    metrics = {}
    all_gt_full, all_refined, all_com3d = [], [], []
    for seq in tests:
        tdata = to_refine_data(seq)
        pred = trainer.predict(state, np.asarray(tdata.crops))  # (N, 3)
        cube_z = np.asarray(tdata.cube)[:, 2][:, None]
        com3d = camera.img_to_3d_np(np.asarray(tdata.com))
        refined = com3d + pred * (cube_z / 2.0)
        all_gt_full.append(np.stack([f.gt3Dorig for f in seq.data]))
        all_refined.append(refined)
        all_com3d.append(com3d)
    gt_full = np.concatenate(all_gt_full).astype(np.float32)
    gt1 = gt_full[:, crop_joint_idx : crop_joint_idx + 1, :]
    refined = np.concatenate(all_refined)[:, None, :].astype(np.float32)
    com3d = np.concatenate(all_com3d).astype(np.float32)

    hpe = eval_cls(gt1, refined)
    hpe.subfolder = outdir
    print(f"Refined CoM mean error: {hpe.getMeanError():.3f}mm, "
          f"max error: {hpe.getMaxError():.3f}mm", flush=True)
    metrics["refined"] = {"mean_mm": hpe.getMeanError(),
                          "max_mm": hpe.getMaxError(),
                          "n_test_frames": int(gt1.shape[0])}
    # result persistence (main:233 pickles the joints; .npy is durable)
    np.save(os.path.join(outdir, f"result_{prefix}.npy"), refined)

    # BASELINE 1: the shipped predictions' crop joint (main:240-244)
    baseline = []
    preds, bl_path = _load_baseline_predictions(
        args, importer_cls, baseline_spec, gt_full
    )
    if preds is not None:
        preds1 = preds[:, crop_joint_idx : crop_joint_idx + 1, :]
        hpe_base = eval_cls(gt1[: preds1.shape[0]], preds1)
        hpe_base.subfolder = outdir
        print(f"Baseline {baseline_spec['label']} crop-joint mean error: "
              f"{hpe_base.getMeanError():.3f}mm", flush=True)
        baseline.append((baseline_spec["label"], hpe_base))
        metrics["baseline"] = {"label": baseline_spec["label"],
                               "mean_mm": hpe_base.getMeanError(),
                               "file": bl_path}

    # BASELINE 2: the raw detected CoM (main:246-250)
    hpe_com = eval_cls(gt1, com3d[:, None, :])
    hpe_com.subfolder = outdir
    print(f"Raw CoM mean error: {hpe_com.getMeanError():.3f}mm", flush=True)
    metrics["com"] = {"mean_mm": hpe_com.getMeanError(),
                      "max_mm": hpe_com.getMaxError()}
    baseline.append(("CoM", hpe_com))

    # success curve + per-joint bars with the baselines overlaid
    # (main_msra15_com_refine.py:257)
    hpe.plotEvaluation(prefix, methodName="Refined CoM", baseline=baseline)

    accept_rec = None
    if getattr(args, "accept", False):
        thr = args.accept_mm
        if thr is None:
            thr = accept_mm
        if thr is None:
            thr = hpe_com.getMeanError()  # must at least beat the detector
        accept_rec = {
            "mean_mm": float(hpe.getMeanError()),
            "com_mean_mm": float(hpe_com.getMeanError()),
            "threshold_mm": float(thr),
            "n_test_frames": int(gt1.shape[0]),
            "synthetic": bool(getattr(args, "synthetic", False)),
        }
        accept_rec["pass"] = bool(accept_rec["mean_mm"] < thr)
        status = "PASS" if accept_rec["pass"] else "FAIL"
        if accept_rec["synthetic"]:
            status += " (synthetic smoke)"
        print(f"acceptance [{status}]: refined {accept_rec['mean_mm']:.3f}mm "
              f"vs threshold {thr:.3f}mm over {gt1.shape[0]} frames",
              flush=True)
        metrics["acceptance"] = accept_rec

    with open(os.path.join(outdir, "results.json"), "w") as fh:
        json.dump(metrics, fh, indent=1)
    if accept_rec is not None and not accept_rec["pass"]:
        raise SystemExit(
            f"acceptance FAILED: {accept_rec['mean_mm']:.3f}mm >= "
            f"{accept_rec['threshold_mm']:.3f}mm"
        )
    return state
