#!/usr/bin/env python
"""Z-score speech features + phone-id mapping for TransformerTTS.

Equivalent of the reference recipe stage (reference:
examples/transformer_tts/normalize.py:28-140): per-dim mean/std of
``speech`` over the TRAIN metadata -> speech_stats.npy, then rewrite
each split with normalized features and text ids (the model itself
appends <eos>).

Usage:
  python normalize.py --metadata dump/metadata_train.jsonl \
      --dumpdir dump_norm/train --phones-dict dump/phone_id_map.txt \
      --stats-dir dump --compute-stats
"""
import argparse
from pathlib import Path

import numpy as np

from parakeet_tpu.data.datatable import read_jsonl, write_jsonl
from parakeet_tpu.data.preprocess import RunningStats, load_id_map


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--metadata", type=Path, required=True)
    parser.add_argument("--dumpdir", type=Path, required=True)
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--stats-dir", type=Path, default=None)
    parser.add_argument("--compute-stats", action="store_true")
    args = parser.parse_args()

    records = read_jsonl(args.metadata)
    args.dumpdir.mkdir(parents=True, exist_ok=True)
    stats_dir = args.stats_dir or args.dumpdir.parent
    stats_dir.mkdir(parents=True, exist_ok=True)

    stats_path = stats_dir / "speech_stats.npy"
    if args.compute_stats:
        stats = RunningStats(np.load(records[0]["speech"]).shape[-1])
        for r in records:
            stats.update(np.load(r["speech"]))
        np.save(stats_path, np.stack([stats.mean, stats.std]))
    elif not stats_path.exists():
        raise SystemExit(
            f"stats file {stats_path} not found — normalize the TRAIN "
            "split first with --compute-stats (dev/test must reuse the "
            "train statistics)")
    arr = np.load(stats_path)
    mean, std = arr[0], np.maximum(arr[1], 1e-8)

    phone_map = load_id_map(args.phones_dict)
    out_records = []
    for r in records:
        new = dict(r)
        x = (np.load(r["speech"]) - mean) / std
        out_path = args.dumpdir / Path(r["speech"]).name
        np.save(out_path, x.astype(np.float32))
        new["speech"] = str(out_path)
        new["text"] = [phone_map.get(p, phone_map.get("<unk>", 1))
                       for p in r["phones"]]
        out_records.append(new)

    write_jsonl(args.dumpdir / "metadata.jsonl", out_records)
    print(f"normalized {len(out_records)} utterances -> {args.dumpdir}")


if __name__ == "__main__":
    main()
