"""ICVL CoM refinement (reference src/main_icvl_com_refine.py)."""

from common import base_parser, run_com_refine

if __name__ == "__main__":
    args = base_parser(__doc__).parse_args()
    from deepprior_tpu.camera import ICVL_CAMERA
    from deepprior_tpu.data.importers import ICVLImporter
    from deepprior_tpu.eval import ICVLHandposeEvaluation

    run_com_refine(
        args, ICVLImporter, ICVL_CAMERA,
        train_seq="train", test_seqs=["test_seq_1"],
        num_joints=16, crop_joint_idx=0, eval_cls=ICVLHandposeEvaluation,
    )
