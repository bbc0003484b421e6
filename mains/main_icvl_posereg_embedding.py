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
    )
