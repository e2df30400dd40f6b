"""Asset bootstrap CLI (reference setup.py + preprocess/atlas_gen_mm.py):
generates the organ-probability atlas and the supervision-mask csv."""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="generate atlas_mm.npy + supervise_mask.csv")
    p.add_argument("--labels_dir", required=True)
    p.add_argument("--out_atlas", default="atlas_mm.npy")
    p.add_argument("--out_csv", default="supervise_mask.csv")
    p.add_argument("--num_fg", type=int, default=13)
    p.add_argument("--sigma", type=float, default=3.0)
    args = p.parse_args(argv)

    from multimodal_pl_tpu.data.atlas import generate_atlas
    from multimodal_pl_tpu.data.dataset import case_id_of
    from multimodal_pl_tpu.data.supervision import generate_supervision_csv

    files = sorted(glob.glob(os.path.join(args.labels_dir, "*.nii.gz")))
    ids = [case_id_of(f) for f in files]
    generate_supervision_csv(ids, args.out_csv)
    print(f"wrote {args.out_csv} ({len(ids)} cases)")

    atlas = generate_atlas(args.labels_dir, args.out_atlas, num_fg=args.num_fg,
                           sigma=args.sigma)
    print(f"wrote {args.out_atlas} shape={atlas.shape}")


if __name__ == "__main__":
    main()
