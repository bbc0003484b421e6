"""NYU flagship: PoseRegNet + 30-D PCA embedding + augmentation.

Mirrors reference src/main_nyu_posereg_embedding.py:38-205.
Run: python mains/main_nyu_posereg_embedding.py --data ../data/NYU
     python mains/main_nyu_posereg_embedding.py --synthetic --epochs 5
"""

import os

from common import base_parser, run_posereg_embedding

if __name__ == "__main__":
    args = base_parser(__doc__).parse_args()
    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.data.importers import NYUImporter
    from deepprior_tpu.eval import NYUHandposeEvaluation

    run_posereg_embedding(
        args, NYUImporter, NYU_CAMERA,
        train_seq="train", test_seqs=["test_1", "test_2"],
        num_joints=14, eval_cls=NYUHandposeEvaluation,
        # --accept: vs Tompson et al. predictions, BASELINE.md <10 mm target
        baseline_spec={"label": "Tompson et al.",
                       "relpath": os.path.join("test", "test_predictions.mat"),
                       "kind": "mat"},
        accept_mm=10.0,
    )
