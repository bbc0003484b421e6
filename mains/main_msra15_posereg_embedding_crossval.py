"""MSRA15 leave-one-subject-out cross-validation with the PCA embedding
(reference src/main_msra15_posereg_embedding_crossval.py: train on 8
subjects, test on the held-out one, repeat for P0..P8).
"""

import json
import os

import numpy as np

from common import base_parser, run_posereg_embedding


class _MultiSubjectImporter:
    """Presents several MSRA subjects as one training sequence."""

    def __init__(self, basepath, subjects):
        from deepprior_tpu.data.importers import MSRA15Importer

        self.imp = MSRA15Importer(basepath)
        self.subjects = subjects

    def loadSequence(self, seq_name, **kw):
        from deepprior_tpu.data.basetypes import ImageSequence

        if seq_name == "train":
            frames = []
            config = None
            for s in self.subjects:
                seq = self.imp.loadSequence(s, **{k: v for k, v in kw.items()
                                                  if k not in ("shuffle", "rng")})
                frames.extend(seq.data)
                config = seq.config
            rng = kw.get("rng")
            if kw.get("shuffle") and rng is not None:
                rng.shuffle(frames)
            return ImageSequence("train", frames, config)
        return self.imp.loadSequence(seq_name, **kw)


if __name__ == "__main__":
    p = base_parser(__doc__)
    p.add_argument("--holdout", default=None,
                   help="held-out subject (default: all of P0..P8 in turn)")
    args = p.parse_args()
    from deepprior_tpu.camera import MSRA15_CAMERA
    from deepprior_tpu.eval import MSRAHandposeEvaluation

    subjects = [f"P{i}" for i in range(9)]
    holdouts = [args.holdout] if args.holdout else subjects
    means = []
    failed = []
    for held in holdouts:
        print(f"=== crossval fold: holding out {held} ===")
        train_subjects = [s for s in subjects if s != held]

        def importer_cls(basepath, _subj=train_subjects):
            return _MultiSubjectImporter(basepath, _subj)

        args.eval_prefix = f"MSRA_EMB_crossval_{held}"
        try:
            _, results = run_posereg_embedding(
                args, importer_cls, MSRA15_CAMERA,
                train_seq="train", test_seqs=[held],
                num_joints=21, eval_cls=MSRAHandposeEvaluation,
                # --accept: no shipped baseline file for MSRA15 (the
                # reference plots "Our regr" alone, main_msra15:226); gate
                # each fold on the BASELINE.md ~9.5 mm paper number with a
                # 5% tolerance
                accept_mm=10.0,
            )
            means.append(results[held].getMeanError())
        except SystemExit as e:
            # --accept per-fold failure: keep running the remaining folds
            # so the crossval summary covers all 9; the fold's numbers were
            # already written to its results.json before the raise
            rj = os.path.join(args.out, args.eval_prefix, "results.json")
            if not os.path.isfile(rj):
                raise  # a failure before evaluation; nothing to recover
            with open(rj) as fh:
                means.append(float(json.load(fh)[held]["mean_mm"]))
            failed.append((held, str(e)))
    cv_mean = float(np.mean(means))
    print(f"crossval mean over folds: {cv_mean:.3f}mm"
          + (f" ({len(failed)} fold(s) failed acceptance)" if failed else ""))
    # same threshold resolution as the per-fold gate (mains/common.py):
    # --accept-mm overrides the BASELINE.md-derived default
    thr = args.accept_mm if args.accept_mm is not None else 10.0
    if args.accept and (failed or cv_mean >= thr):
        detail = "; ".join(f"{h}: {m}" for h, m in failed)
        raise SystemExit(
            f"acceptance FAILED: crossval mean {cv_mean:.3f}mm vs {thr}mm"
            + (f" (failed folds: {detail})" if detail else "")
        )
