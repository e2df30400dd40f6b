"""Tabulate the torch-reference h2h loss curves against the matched
mpl-train run (same fixtures, split seed, schedule, sample counts).

Semantics mapping (verified against the reference trainer's prints):
  - torch per-iter ``loss_Sum`` is term_all = get_loss(...) — the SEG loss
    only (train_amos_atlas_final.py:395-399); refiner and GAN terms are
    reported separately. The matched mpl-train series is therefore
    ``seg_loss`` (not ``loss``, which folds all three terms).
  - torch ``refiner_loss`` <-> ours ``refine_loss``.
Epoch value = mean over the epoch's iterations on both sides.

Usage: python scripts/h2h_curves.py [--torch_log /tmp/h2h_train.log]
       [--ours_jsonl /tmp/h2h_ours/snapshots/train.jsonl]
       [--steps_per_epoch 8]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict


def parse_torch(path):
    seg, ref = defaultdict(list), defaultdict(list)
    pat = re.compile(
        r"Epoch (\d+): \d+/\d+.*?loss_Sum = ([\d.eE+-]+), refiner_loss = ([\d.eE+-]+)")
    for line in open(path):
        m = pat.search(line)
        if m:
            e = int(m.group(1))
            seg[e].append(float(m.group(2)))
            ref[e].append(float(m.group(3)))
    return seg, ref


def parse_ours(path, steps_per_epoch):
    seg, ref = defaultdict(list), defaultdict(list)
    for line in open(path):
        r = json.loads(line)
        if "seg_loss" in r:
            e = (int(r["step"]) - 1) // steps_per_epoch
            seg[e].append(float(r["seg_loss"]))
            ref[e].append(float(r["refine_loss"]))
    return seg, ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_log", default="/tmp/h2h_train.log")
    ap.add_argument("--ours_jsonl", default="/tmp/h2h_ours/snapshots/train.jsonl")
    ap.add_argument("--steps_per_epoch", type=int, default=8)
    args = ap.parse_args()

    tseg, tref = parse_torch(args.torch_log)
    oseg, oref = parse_ours(args.ours_jsonl, args.steps_per_epoch)
    epochs = sorted(set(tseg) & set(oseg))
    if not epochs:
        sys.exit("no common epochs parsed — check --torch_log/--ours_jsonl/"
                 "--steps_per_epoch")
    mean = lambda v: sum(v) / max(len(v), 1)

    print("| epoch | torch seg | mpl seg | delta | torch refine | mpl refine |")
    print("|---|---|---|---|---|---|")
    show = [e for e in epochs if e % 5 == 0 or e == epochs[-1]]
    for e in show:
        ts, os_ = mean(tseg[e]), mean(oseg[e])
        print(f"| {e} | {ts:.4f} | {os_:.4f} | {os_ - ts:+.4f} | "
              f"{mean(tref[e]):.4f} | {mean(oref[e]):.4f} |")

    # summaries: pretrain epochs (< 20) share the exact loss math on both
    # sides; epochs >= 20 add the consistency term, whose magnitude depends
    # on each side's own random refiner init (pseudo-label noise), so the
    # phases are reported separately.
    import statistics

    for label, es in (("pretrain (<20)", [e for e in epochs if e < 20]),
                      ("ramp (>=20)", [e for e in epochs if e >= 20]),
                      ("all", epochs)):
        if len(es) < 2:
            continue
        ds = [mean(oseg[e]) - mean(tseg[e]) for e in es]
        print(f"{label}: {len(es)} epochs, seg delta mean "
              f"{statistics.mean(ds):+.4f} (max |{max(abs(d) for d in ds):.4f}|)")


if __name__ == "__main__":
    main()
