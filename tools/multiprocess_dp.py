#!/usr/bin/env python
"""Multi-PROCESS data-parallel training leg (one worker).

The reference's chain tests actually spawn multiple processes
(reference: tests/chain/test.sh; dist.spawn at
examples/fastspeech2/train.py:208).  Every multi-device path in this
repo is normally single-process SPMD; this script is the multi-process
twin: N workers connect through ``jax.distributed.initialize`` (CPU
backend, localhost coordinator), build ONE global mesh over all
processes' devices, and run the RECIPE composition (StandardUpdater
with mesh=...) for two DP steps on a deterministic tiny FastSpeech2 —
so the per-step losses must equal the single-process run bit-for-bit
protocol-wise (same batch, same init key).

It then snapshots through ``updater.save``: ``flatten_tree`` gathers
every leaf with ``multihost_utils.process_allgather`` (the branch that
can only execute multi-process), and only process 0 writes the file.
Process 0 finally reloads the snapshot and checks the step counter and
a param checksum.

Launched by tests/test_multiprocess.py (2 workers x 2 virtual CPU
devices = a 4-way data mesh); runnable by hand:

  XLA_FLAGS=--xla_force_host_platform_device_count=2 \\
  python tools/multiprocess_dp.py --num-processes 2 --process-id 0 \\
      --port 12631 --out /tmp/mp_ckpt &
  XLA_FLAGS=--xla_force_host_platform_device_count=2 \\
  python tools/multiprocess_dp.py --num-processes 2 --process-id 1 \\
      --port 12631 --out /tmp/mp_ckpt
"""
import argparse
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--num-processes", type=int, default=2)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--port", type=int, default=12631)
    parser.add_argument("--out", required=True,
                        help="checkpoint directory (shared)")
    args = parser.parse_args()

    import jax

    # CPU backend BEFORE distributed init (the axon sitecustomize forces
    # the TPU platform; the env var alone does not work — CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes, process_id=args.process_id)

    import numpy as np

    from __graft_entry__ import _tiny_batch
    from parakeet_tpu.models import (FastSpeech2, init_fs2_train_state,
                                     make_fs2_train_step)
    from parakeet_tpu.parallel import make_mesh
    from parakeet_tpu.training import build_optimizer
    from parakeet_tpu.training.checkpoint import load_pytree
    from parakeet_tpu.training.updater import StandardUpdater

    n_global = len(jax.devices())
    assert n_global > len(jax.local_devices()), (
        "expected a multi-process device set; got only local devices")

    model = FastSpeech2(idim=30, odim=10, adim=16, aheads=2, elayers=2,
                        eunits=32, dlayers=2, dunits=32, postnet_layers=2,
                        postnet_chans=8, postnet_filts=5,
                        duration_predictor_chans=16,
                        pitch_predictor_chans=16, energy_predictor_chans=16)
    tx = build_optimizer("adam", 1e-3)
    batch = _tiny_batch(b=n_global, t=8, frames=32, odim=10, vocab=30)
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_fs2_train_step(model, tx)

    mesh = make_mesh(data=n_global)     # spans both processes' devices
    with mesh:
        updater = StandardUpdater(step, state, [batch], mesh=mesh)
        losses = []
        for _ in range(2):
            updater.update()
            # the loss is fully replicated, so float() is legal even
            # though the array is not fully addressable per-process
            losses.append(float(updater.last_metrics["loss"]))

        # the gathered save is a collective: EVERY process calls it,
        # process 0 writes (training/checkpoint.py::save_pytree)
        leaf0 = jax.tree_util.tree_leaves(updater.train_state.params)[0]
        assert not leaf0.is_fully_addressable, (
            "params unexpectedly fully addressable — the "
            "process_allgather branch would not be exercised")
        ckpt = f"{args.out}/snapshot_iter_2.npz"
        updater.save(ckpt)

    print(f"MPLOSS {args.process_id} {losses[0]:.6f} {losses[1]:.6f}",
          flush=True)

    if args.process_id == 0:
        tree, meta = load_pytree(ckpt, template=state)
        assert int(meta["iteration"]) == 2, meta
        assert int(np.asarray(tree.step)) == 2
        checksum = float(sum(np.abs(np.asarray(l)).sum()
                             for l in jax.tree_util.tree_leaves(tree.params)))
        assert np.isfinite(checksum)
        print(f"MPCKPT {checksum:.6f}", flush=True)

    # all processes must reach the end together (the distributed client
    # tears down collectives on exit)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("mp_dp_done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
