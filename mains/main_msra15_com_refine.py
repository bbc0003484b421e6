"""MSRA15 CoM refinement (reference src/main_msra15_com_refine.py): train
on one subject, test on a held-out subject, with the reference's eval
epilogue (refined CoM vs raw CoM — MSRA ships no external baseline — and
the success curve with the CoM overlay, main:240-257)."""

from common import base_parser, run_com_refine

if __name__ == "__main__":
    p = base_parser(__doc__)
    p.set_defaults(lr=0.0005)  # reference CoM recipe
    p.add_argument("--subject", default="P0", help="MSRA train subject")
    p.add_argument("--test-subject", default="P8",
                   help="held-out MSRA subject for the eval epilogue "
                        "(reference trains P0-P7 and tests P8)")
    args = p.parse_args()
    from deepprior_tpu.camera import MSRA15_CAMERA
    from deepprior_tpu.data.importers import MSRA15Importer
    from deepprior_tpu.eval import MSRAHandposeEvaluation

    run_com_refine(
        args, MSRA15Importer, MSRA15_CAMERA,
        train_seq=args.subject, test_seqs=[args.test_subject],
        num_joints=21, crop_joint_idx=5, eval_cls=MSRAHandposeEvaluation,
    )
