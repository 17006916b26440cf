"""Multi-process distributed execution (the reference's chain coverage).

Spawns 2 REAL processes (tools/multiprocess_dp.py) that form one 4-way
data mesh via ``jax.distributed.initialize``, run two recipe-path DP
steps, and snapshot through the gathered (process_allgather) save with
rank-0-only writing — the branches single-process SPMD can never
execute (reference twin: tests/chain/test.sh + dist.spawn at
examples/fastspeech2/train.py:208).

Loss parity: a multi-device DP step is algorithm-identical to the
serial step on the same global batch, so both processes' per-step
losses must match the in-process serial run.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step_and_gathered_snapshot(tmp_path):
    port = _free_port()
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_NUM_CPU_DEVICES="2")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools/multiprocess_dp.py"),
             "--num-processes", "2", "--process-id", str(pid),
             "--port", str(port), "--out", str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MPLOSS"):
                _, pid, l1, l2 = line.split()
                losses[int(pid)] = (float(l1), float(l2))
    assert set(losses) == {0, 1}, f"missing worker losses:\n{outs}"
    assert losses[0] == losses[1], "replicated loss differs across procs"
    assert any("MPCKPT" in o for o in outs), "rank-0 reload never ran"

    # exactly one process wrote the snapshot, and it round-trips
    ckpt = tmp_path / "snapshot_iter_2.npz"
    assert ckpt.exists()
    assert not (tmp_path / "snapshot_iter_2.npz.tmp").exists()

    # serial parity: same batch, same init -> same per-step losses
    import jax

    from __graft_entry__ import _tiny_batch
    from parakeet_tpu.models import (FastSpeech2, init_fs2_train_state,
                                     make_fs2_train_step)
    from parakeet_tpu.training import build_optimizer

    model = FastSpeech2(idim=30, odim=10, adim=16, aheads=2, elayers=2,
                        eunits=32, dlayers=2, dunits=32, postnet_layers=2,
                        postnet_chans=8, postnet_filts=5,
                        duration_predictor_chans=16,
                        pitch_predictor_chans=16, energy_predictor_chans=16)
    tx = build_optimizer("adam", 1e-3)
    batch = _tiny_batch(b=4, t=8, frames=32, odim=10, vocab=30)
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_fs2_train_step(model, tx)
    ref = []
    for _ in range(2):
        state, metrics = step(state, batch)
        ref.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses[0], ref, rtol=1e-5)
