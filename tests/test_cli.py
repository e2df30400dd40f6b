"""CLI surface tests: argument parsing (reference flag compatibility) and the
non-model CLIs (atlas/preprocess) end-to-end on synthetic fixtures.

The train/evaluate model paths are exercised on real hardware via
.claude/skills/verify (their compiles are too heavy for the unit suite).
"""

import os

import numpy as np
import pytest

from multimodal_pl_tpu.cli.atlas import main as atlas_main
from multimodal_pl_tpu.cli.evaluate import get_arguments as eval_args
from multimodal_pl_tpu.cli.preprocess import main as preprocess_main
from multimodal_pl_tpu.cli.train import get_arguments as train_args
from multimodal_pl_tpu.data.synthetic import make_synthetic_amos


REFERENCE_TRAIN_FLAGS = [
    # exact argparse surface of the reference driver (train_amos_atlas_final.py:51-90)
    "--data_dir", "--train_list", "--val_list", "--snapshot_dir", "--reload_path",
    "--reload_from_checkpoint", "--input_size", "--batch_size", "--num_gpus",
    "--local_rank", "--FP16", "--num_epochs", "--itrs_each_epoch", "--patience",
    "--start_epoch", "--val_pred_every", "--learning_rate", "--num_classes",
    "--num_workers", "--weight_std", "--momentum", "--power", "--weight_gan",
    "--weight_decay", "--ignore_label", "--is_training", "--random_mirror",
    "--random_scale", "--deep_up", "--random_seed", "--gpu", "--disweight",
    "--augmask", "--seed", "--pretrain_epoch",
]


def test_train_cli_accepts_all_reference_flags():
    parser = train_args()
    opts = {o for a in parser._actions for o in a.option_strings}
    missing = [f for f in REFERENCE_TRAIN_FLAGS if f not in opts]
    assert not missing, f"train CLI missing reference flags: {missing}"


def test_train_cli_run_script_args_parse():
    # the exact flag style of run_amos_atlas_final.sh
    args = train_args().parse_args([
        "--data_dir=/tmp/x", "--input_size=64,192,192", "--batch_size=3",
        "--learning_rate=5e-4", "--num_epochs=500", "--num_classes=14",
        "--weight_std=True", "--deep_up=True", "--random_mirror=True",
        "--random_scale=True", "--weight_gan=1e-3", "--augmask=2",
        "--pretrain_epoch=20",
    ])
    assert args.batch_size == 3 and args.deep_up is True and args.augmask == 2


def test_evaluate_cli_parses():
    args = eval_args().parse_args(["--input_size=64,192,192", "--tta=true", "--print=true"])
    assert args.tta is True and args.print_preds is True


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("raw_amos"))
    make_synthetic_amos(root, n_ct=3, n_mri=1, shape=(40, 40, 32), seed=1, spread_ids=False)
    return root


def test_atlas_cli_end_to_end(raw_root, tmp_path):
    out_atlas = str(tmp_path / "atlas.npy")
    out_csv = str(tmp_path / "sup.csv")
    atlas_main(["--labels_dir", os.path.join(raw_root, "labelsTr"),
                "--out_atlas", out_atlas, "--out_csv", out_csv])
    atlas = np.load(out_atlas)
    assert atlas.shape[0] == 13
    assert os.path.getsize(out_csv) > 0


def test_preprocess_cli_end_to_end(raw_root, tmp_path):
    out_i = str(tmp_path / "imagesTr")
    out_l = str(tmp_path / "labelsTr")
    preprocess_main([
        "--images_dir", os.path.join(raw_root, "imagesTr"),
        "--labels_dir", os.path.join(raw_root, "labelsTr"),
        "--out_images", out_i, "--out_labels", out_l, "--only_case", "1",
    ])
    from multimodal_pl_tpu.data.nifti import read_nifti

    out = read_nifti(os.path.join(out_i, "amos_0001_0000.nii.gz"))
    lab = read_nifti(os.path.join(out_l, "amos_0001.nii.gz"))
    assert out.data.ndim == 3 and out.data.size > 0
    assert out.spacing == (1.0, 1.0, 2.0)
    assert lab.data.max() <= 13
