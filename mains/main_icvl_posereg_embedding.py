"""ICVL: PoseRegNet + 30-D PCA embedding (reference
src/main_icvl_posereg_embedding.py).
"""

from common import base_parser, run_posereg_embedding

if __name__ == "__main__":
    args = base_parser(__doc__).parse_args()
    from deepprior_tpu.camera import ICVL_CAMERA
    from deepprior_tpu.data.importers import ICVLImporter
    from deepprior_tpu.eval import ICVLHandposeEvaluation

    run_posereg_embedding(
        args, ICVLImporter, ICVL_CAMERA,
        train_seq="train", test_seqs=["test_seq_1"],
        num_joints=16, eval_cls=ICVLHandposeEvaluation,
        # --accept: vs Tang et al. LRF predictions (reference
        # main_icvl_posereg_embedding.py:184), BASELINE.md ~8.1 mm paper
        # number with a 5% tolerance
        baseline_spec={"label": "Tang et al.",
                       "relpath": "LRF_Results_seq_1.txt",
                       "kind": "txt"},
        accept_mm=8.5,
    )
