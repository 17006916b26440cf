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
from typing import List

__all__ = ["xplane_to_chrome_trace", "main"]


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
                events.append({
                    "ph": "X", "pid": pid, "tid": tid,
                    "name": meta.name,
                    "ts": (base_ns + ev.offset_ps / 1e3) / 1e3,  # us
                    "dur": ev.duration_ps / 1e6,                 # us
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
