#!/usr/bin/env python
"""Z-score feature normalization + id mapping.

Equivalent of the reference recipe stages (reference:
examples/fastspeech2/normalize.py + utils/compute_statistics.py:14):
compute per-dim mean/std of speech/pitch/energy over the TRAIN metadata,
write ``*_stats.npy``, then rewrite metadata with normalized feature files
and phone/speaker ids.

Usage:
  python normalize.py --metadata dump/metadata_train.jsonl \
      --dumpdir dump_norm/train --phones-dict dump/phone_id_map.txt \
      [--stats-dir dump]   # compute stats (train) or reuse (dev/test)
"""
import argparse
from pathlib import Path

import numpy as np

from parakeet_tpu.data.datatable import read_jsonl, write_jsonl
from parakeet_tpu.data.preprocess import RunningStats, load_id_map


def compute_stats(records, field, dim):
    stats = RunningStats(dim)
    for r in records:
        stats.update(np.load(r[field]))
    return stats


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--metadata", type=Path, required=True)
    parser.add_argument("--dumpdir", type=Path, required=True)
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--speaker-dict", type=Path, default=None)
    parser.add_argument("--stats-dir", type=Path, default=None,
                        help="where to read/write *_stats.npy "
                             "(default: --dumpdir parent)")
    parser.add_argument("--compute-stats", action="store_true",
                        help="compute stats from this metadata (train)")
    args = parser.parse_args()

    records = read_jsonl(args.metadata)
    args.dumpdir.mkdir(parents=True, exist_ok=True)
    stats_dir = args.stats_dir or args.dumpdir.parent
    stats_dir.mkdir(parents=True, exist_ok=True)

    fields = [("speech", None), ("pitch", 1), ("energy", 1)]
    stats = {}
    for field, dim in fields:
        path = stats_dir / f"{field}_stats.npy"
        if args.compute_stats:
            d = dim or np.load(records[0][field]).shape[-1]
            s = compute_stats(records, field, d)
            np.save(path, np.stack([s.mean, s.std]))
        elif not path.exists():
            raise SystemExit(
                f"stats file {path} not found — normalize the TRAIN "
                "split first with --compute-stats (dev/test must reuse "
                "the train statistics)")
        arr = np.load(path)
        stats[field] = (arr[0], arr[1])

    phone_map = load_id_map(args.phones_dict)
    spk_map = (load_id_map(args.speaker_dict)
               if args.speaker_dict else None)

    out_records = []
    for r in records:
        new = dict(r)
        for field, _ in fields:
            x = np.load(r[field])
            mean, std = stats[field]
            x = (x - mean) / np.maximum(std, 1e-8)
            out_path = args.dumpdir / Path(r[field]).name
            np.save(out_path, x.astype(np.float32))
            new[field] = str(out_path)
        new["text"] = [phone_map.get(p, phone_map.get("<unk>", 1))
                       for p in r["phones"]]
        if spk_map is not None:
            new["spk_id"] = spk_map[r["speaker"]]
        out_records.append(new)

    write_jsonl(args.dumpdir / "metadata.jsonl", out_records)
    print(f"normalized {len(out_records)} utterances -> {args.dumpdir}")


if __name__ == "__main__":
    main()
