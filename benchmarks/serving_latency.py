#!/usr/bin/env python
"""Serving latency under load: p50/p99 vs arrival rate.

`serving_throughput.py` / `serving_engine.py` measure capacity
(audio-s/s); a deployment also plans against LATENCY at a given
traffic level.  This bench simulates a single-replica server in front
of the engine:

- requests arrive by a Poisson process at ``--rate`` requests/s
  (virtual clock; lengths drawn from the mixed-length workload of
  serving_engine.py);
- the server collects everything that has arrived whenever it is
  free — plus an optional ``--window`` ms batching wait that trades
  first-request latency for better batching — up to the largest
  batch bucket, and runs one engine.synthesize() on it;
- the batch's REAL wall-clock service time advances the virtual
  clock; per-request latency = completion - arrival.

The grid is fully warmed first, so numbers reflect steady-state
serving, not compiles.  Output: one JSON line per rate with p50/p95/
p99 latency, mean batch size, and server utilization.  (Beyond-
reference: the reference synthesizes one utterance per loop step.)

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/serving_latency.py \
           [--rates 1 2 4 8] [--requests 64] [--window 0] [--dtype bfloat16]
"""
import argparse
import json
import time

import numpy as np

from serving_engine import build_engine, workload  # noqa: E402


def simulate(engine, reqs, rate, window_s, cap, seed=0):
    rng = np.random.default_rng(seed)
    arrivals = np.cumsum(rng.exponential(1.0 / rate, len(reqs)))
    latencies = np.zeros(len(reqs))
    batch_sizes = []
    busy = 0.0
    now = 0.0
    i = 0
    while i < len(reqs):
        # server idle: jump to the next arrival, then apply the window
        now = max(now, arrivals[i]) + window_s
        take = i
        while take < len(reqs) and arrivals[take] <= now and take - i < cap:
            take += 1
        batch = reqs[i:take]
        tic = time.perf_counter()
        engine.synthesize(batch)
        service = time.perf_counter() - tic
        done = now + service
        latencies[i:take] = done - arrivals[i:take]
        batch_sizes.append(len(batch))
        busy += service
        now = done
        i = take
    util = busy / max(now, 1e-9)
    return latencies, batch_sizes, util


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rates", type=float, nargs="+",
                        default=(1.0, 2.0, 4.0, 8.0),
                        help="arrival rates, requests/sec")
    parser.add_argument("--requests", type=int, default=64)
    parser.add_argument("--min-len", type=int, default=20)
    parser.add_argument("--buckets", type=int, nargs="+",
                        default=(32, 64, 128))
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--frames-per-token", type=int, default=7)
    parser.add_argument("--window", type=float, default=0.0,
                        help="batching window, ms (wait after first "
                             "queued request before launching)")
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    engine = build_engine(args.buckets, args.batch_size, args.dtype,
                          args.frames_per_token)
    engine.warmup()
    reqs = workload(args.requests, args.min_len, max(args.buckets))

    sr = 24000
    for rate in args.rates:
        lats, bss, util = simulate(engine, reqs, rate,
                                   args.window / 1e3,
                                   engine.batch_buckets[-1])
        out = {"metric": "serving_latency", "rate_rps": rate,
               "requests": len(reqs),
               "p50_ms": round(float(np.percentile(lats, 50)) * 1e3, 1),
               "p95_ms": round(float(np.percentile(lats, 95)) * 1e3, 1),
               "p99_ms": round(float(np.percentile(lats, 99)) * 1e3, 1),
               "mean_batch": round(float(np.mean(bss)), 2),
               "utilization": round(util, 3),
               "window_ms": args.window, "dtype": args.dtype}
        print(json.dumps(out))


if __name__ == "__main__":
    main()
