"""ICVL CoM refinement (reference src/main_icvl_com_refine.py), with the
reference's three-way eval epilogue (refined CoM vs LRF baseline crop
joint vs raw CoM, main:205-227)."""

from common import base_parser, run_com_refine

if __name__ == "__main__":
    p = base_parser(__doc__)
    p.set_defaults(lr=0.0005)  # reference CoM recipe
    args = p.parse_args()
    from deepprior_tpu.camera import ICVL_CAMERA
    from deepprior_tpu.data.importers import ICVLImporter
    from deepprior_tpu.eval import ICVLHandposeEvaluation

    run_com_refine(
        args, ICVLImporter, ICVL_CAMERA,
        train_seq="train", test_seqs=["test_seq_1"],
        num_joints=16, crop_joint_idx=0, eval_cls=ICVLHandposeEvaluation,
        baseline_spec={"label": "Tang et al.",
                       "relpath": "LRF_Results_seq_1.txt",
                       "kind": "txt"},
    )
