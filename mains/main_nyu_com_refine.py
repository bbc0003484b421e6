"""NYU CoM refinement: 3-scale ScaleNet (reference
src/main_nyu_com_refine.py, batch 64, 1-joint offset labels), with the
reference's three-way eval epilogue (refined CoM vs Tompson baseline crop
joint vs raw CoM, main:228-250).
"""

from common import base_parser, run_com_refine

if __name__ == "__main__":
    p = base_parser(__doc__)
    p.set_defaults(lr=0.0005)  # reference CoM recipe (main:172)
    args = p.parse_args()
    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.data.importers import NYUImporter
    from deepprior_tpu.eval import NYUHandposeEvaluation
    import os

    run_com_refine(
        args, NYUImporter, NYU_CAMERA,
        train_seq="train", test_seqs=["test_1", "test_2"],
        num_joints=14, crop_joint_idx=13, eval_cls=NYUHandposeEvaluation,
        baseline_spec={"label": "Tompson et al.",
                       "relpath": os.path.join("test",
                                               "test_predictions.mat"),
                       "kind": "mat"},
    )
