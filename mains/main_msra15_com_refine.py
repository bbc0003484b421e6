"""MSRA15 CoM refinement (reference src/main_msra15_com_refine.py)."""

from common import base_parser, run_com_refine

if __name__ == "__main__":
    p = base_parser(__doc__)
    p.add_argument("--subject", default="P0", help="MSRA subject (P0..P8)")
    args = p.parse_args()
    from deepprior_tpu.camera import MSRA15_CAMERA
    from deepprior_tpu.data.importers import MSRA15Importer
    from deepprior_tpu.eval import MSRAHandposeEvaluation

    run_com_refine(
        args, MSRA15Importer, MSRA15_CAMERA,
        train_seq=args.subject, test_seqs=[],
        num_joints=21, crop_joint_idx=5, eval_cls=MSRAHandposeEvaluation,
    )
