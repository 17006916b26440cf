"""Convert a jax.profiler xplane dump to Chrome trace JSON.

Equivalent of the reference's profiler-protobuf -> catapult converter
(reference: parakeet/utils/timeline.py:32-315).  Input: the
``plugins/profile/<run>/*.xplane.pb`` file written by
``jax.profiler.start_trace`` (or utils/profiler.ProfilerOptions); output:
a ``chrome://tracing`` / Perfetto-loadable JSON with one track per xline
(TPU op stream, host threads).

Standalone CLI:
  python -m parakeet_tpu.utils.timeline --input .../foo.xplane.pb \
      --output trace.json
"""
from __future__ import annotations

import json
import re
from typing import List

__all__ = ["xplane_to_chrome_trace", "main"]

# Stat names that describe memory state.  Events carrying one of these
# become Chrome counter tracks (ph "C") alongside the op events, matching
# the reference converter's memory counter emission
# (reference: parakeet/utils/timeline.py:268-280 emits a "Memory" counter
# per allocation event).  XLA/TF profiler dumps put these on op events
# (e.g. "bytes_in_use", "peak_bytes_in_use") or dedicated allocator
# lines, depending on backend.
_MEMORY_STAT_RE = re.compile(
    r"(?i)(bytes_in_use|peak_bytes|bytes_reserved|bytes_allocated|"
    r"heap_size|free_memory|memory_bw|_memory_bytes|allocated_bytes)")


def _stat_value(stat):
    """Extract whichever numeric value field an XStat carries.

    XStat's value is a proto oneof, so presence — not truthiness — must
    decide (a bytes_in_use sample of 0 is a real sample; dropping it
    would leave the Chrome counter track stuck at the previous value).
    """
    numeric = ("int64_value", "uint64_value", "double_value")
    which = getattr(stat, "WhichOneof", None)
    if which is not None:
        try:
            field = which("value")
        except ValueError:  # no oneof named "value" on this proto build
            field = None
        if field is not None:
            return getattr(stat, field) if field in numeric else None
    for field in numeric:  # duck-typed stats (tests use SimpleNamespace)
        v = getattr(stat, field, None)
        if v:
            return v
    return None


def _load_xspace(path):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "xplane parsing needs the tensorflow xplane proto "
            "(pip install tensorflow-cpu)") from e
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def xplane_to_chrome_trace(path) -> List[dict]:
    """xplane.pb -> list of Chrome trace events (phase 'X')."""
    xs = _load_xspace(path)
    events = []
    for pid, plane in enumerate(xs.planes):
        events.append({"ph": "M", "pid": pid, "name": "process_name",
                       "args": {"name": plane.name}})
        for tid, line in enumerate(plane.lines):
            events.append({"ph": "M", "pid": pid, "tid": tid,
                           "name": "thread_name",
                           "args": {"name": line.name or f"line{tid}"}})
            base_ns = line.timestamp_ns
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                ts_us = (base_ns + ev.offset_ps / 1e3) / 1e3
                events.append({
                    "ph": "X", "pid": pid, "tid": tid,
                    "name": meta.name,
                    "ts": ts_us,                                 # us
                    "dur": ev.duration_ps / 1e6,                 # us
                })
                # memory stats on the event -> counter track (ph "C"),
                # one per (plane, stat name), like the reference's
                # Memory counter (timeline.py:268-280).
                for stat in ev.stats:
                    sname = plane.stat_metadata[stat.metadata_id].name
                    if not _MEMORY_STAT_RE.search(sname):
                        continue
                    val = _stat_value(stat)
                    if val is None:
                        continue
                    events.append({
                        "ph": "C", "pid": pid, "name": sname,
                        "ts": ts_us, "args": {sname: val},
                    })
    return events


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True,
                        help="path to a .xplane.pb profile dump")
    parser.add_argument("--output", required=True,
                        help="Chrome trace JSON to write")
    args = parser.parse_args(argv)
    events = xplane_to_chrome_trace(args.input)
    with open(args.output, "w") as f:
        json.dump({"traceEvents": events}, f)
    print(f"wrote {len(events)} events to {args.output}")


if __name__ == "__main__":
    main()
