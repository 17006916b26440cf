#!/usr/bin/env python
"""SpeedySpeech feature normalization: z-score the mel features.

Equivalent of the reference stage (reference:
examples/speedyspeech/baker/normalize.py): compute per-dim mean/std of
``feats`` over the TRAIN metadata (``--compute-stats``), write
``feats_stats.npy``, then rewrite metadata with normalized features
(phone/tone ids are already numeric from preprocess.py).

Usage:
  python normalize.py --metadata dump/metadata_train.jsonl \
      --dumpdir dump/norm/train --stats-dir dump --compute-stats
"""
import argparse
from pathlib import Path

import numpy as np

from parakeet_tpu.data.datatable import read_jsonl, write_jsonl
from parakeet_tpu.data.preprocess import RunningStats


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--metadata", type=Path, required=True)
    parser.add_argument("--dumpdir", type=Path, required=True)
    parser.add_argument("--stats-dir", type=Path, default=None)
    parser.add_argument("--compute-stats", action="store_true")
    args = parser.parse_args()

    records = read_jsonl(args.metadata)
    args.dumpdir.mkdir(parents=True, exist_ok=True)
    stats_dir = args.stats_dir or args.dumpdir.parent
    stats_dir.mkdir(parents=True, exist_ok=True)

    path = stats_dir / "feats_stats.npy"
    if args.compute_stats:
        stats = RunningStats(np.load(records[0]["feats"]).shape[-1])
        for r in records:
            stats.update(np.load(r["feats"]))
        np.save(path, np.stack([stats.mean, stats.std]))
    elif not path.exists():
        raise SystemExit(
            f"stats file {path} not found — normalize the TRAIN split "
            "first with --compute-stats (dev/test must reuse the train "
            "statistics)")
    arr = np.load(path)
    mean, std = arr[0], arr[1]

    out_records = []
    for r in records:
        new = dict(r)
        x = np.load(r["feats"])
        x = (x - mean) / np.maximum(std, 1e-8)
        out_path = args.dumpdir / Path(r["feats"]).name
        np.save(out_path, x.astype(np.float32))
        new["feats"] = str(out_path)
        out_records.append(new)

    write_jsonl(args.dumpdir / "metadata.jsonl", out_records)
    print(f"normalized {len(out_records)} utterances -> {args.dumpdir}")


if __name__ == "__main__":
    main()
