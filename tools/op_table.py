#!/usr/bin/env python
"""Aggregate a jax.profiler xplane dump into a per-op duration table.

The "op table" step of the profiling checklist (docs/tpu_performance.md):
group device-plane trace events by op name, sum durations, and print the
top offenders.  This is how kernel-level hotspots are found (e.g. the
~150 ms WaveFlow ConvTranspose fusion in round 1).

Usage:
  python tools/op_table.py --input out/plugins/profile/<run>/*.xplane.pb \
      [--top 30] [--plane tpu]

Equivalent of eyeballing the reference's converted Chrome trace
(reference: parakeet/utils/timeline.py); here the aggregation is done
for you.  For the full timeline view use parakeet_tpu.utils.timeline.
"""
import argparse
import collections
import glob
import sys

sys.path.insert(0, ".")

from parakeet_tpu.utils.timeline import _load_xspace  # noqa: E402


def op_table(path, plane_filter=None):
    """Return [(op name, total us, calls, plane)] sorted by total desc."""
    xs = _load_xspace(path)
    totals = collections.defaultdict(lambda: [0.0, 0])
    for plane in xs.planes:
        pname = plane.name
        if plane_filter and plane_filter.lower() not in pname.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                rec = totals[(pname, meta.name)]
                rec[0] += ev.duration_ps / 1e6
                rec[1] += 1
    rows = [(name, tot, n, pname)
            for (pname, name), (tot, n) in totals.items()]
    rows.sort(key=lambda r: -r[1])
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True,
                        help="xplane.pb path (glob ok)")
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--plane", default=None,
                        help="substring filter on plane name "
                             "(e.g. 'tpu' to drop host threads)")
    args = parser.parse_args(argv)
    paths = sorted(glob.glob(args.input))
    if not paths:
        parser.error(f"no file matches {args.input}")
    for path in paths:
        rows = op_table(path, args.plane)
        grand = sum(r[1] for r in rows)
        print(f"# {path}  ({grand / 1e3:.3f} ms total across "
              f"{len(rows)} op names)")
        print(f"{'total_us':>12} {'calls':>7} {'%':>6}  op [plane]")
        for name, tot, n, pname in rows[:args.top]:
            pct = 100.0 * tot / grand if grand else 0.0
            print(f"{tot:12.1f} {n:7d} {pct:6.2f}  {name} [{pname}]")


if __name__ == "__main__":
    main()
