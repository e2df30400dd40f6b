"""Data pipeline: NIfTI IO, preprocessing, dataset, atlas, augmentation."""

from multimodal_pl_tpu.data.nifti import read_nifti, write_nifti
from multimodal_pl_tpu.data.supervision import (
    modality_of,
    supervision_mask_for_case,
    generate_supervision_csv,
    load_supervision_csv,
    LABEL_T_CT,
    LABEL_T_MRI,
)
from multimodal_pl_tpu.data.atlas import generate_atlas, resize_atlas_nearest
from multimodal_pl_tpu.data.dataset import AMOSDataset, split_files
from multimodal_pl_tpu.data.augment import intensity_augment, mask_aug
