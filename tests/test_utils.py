"""Utils tests: error rates, layer tools, profiler options."""
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_tpu.utils import (ProfilerOptions, StepTimer, cer,
                                freeze_optimizer, gradient_norm,
                                levenshtein, num_parameters, wer)


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein([], [1, 2]) == 2
    assert levenshtein("abc", "abc") == 0


def test_wer_cer():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the bat sat") == pytest.approx(1 / 3)
    assert cer("abcd", "abed") == pytest.approx(0.25)
    with pytest.raises(ValueError):
        wer("", "x")


def test_num_parameters_and_gradient_norm():
    params = {"a": jnp.ones((2, 3)), "b": {"c": jnp.ones(4)}}
    assert num_parameters(params) == 10
    g = gradient_norm(params)
    assert float(g) == pytest.approx(np.sqrt(10.0))


def test_freeze_optimizer():
    import optax
    params = {"enc": jnp.ones(3), "dec": jnp.ones(3)}
    tx = freeze_optimizer(optax.sgd(1.0), params,
                          lambda name: name.startswith("enc"))
    state = tx.init(params)
    grads = {"enc": jnp.ones(3), "dec": jnp.ones(3)}
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["enc"]), 0.0)
    np.testing.assert_array_equal(np.asarray(updates["dec"]), -1.0)


def test_profiler_options_parse():
    o = ProfilerOptions("batch_range=[5,8];profile_path=/tmp/x;"
                        "exit_on_finished=true")
    assert o.batch_range == [5, 8]
    assert o.profile_path == "/tmp/x"
    assert o.exit_on_finished
    with pytest.raises(ValueError):
        ProfilerOptions("batch_range=[8,5]")


def test_step_timer():
    t = StepTimer()
    t.tick_reader()
    t.tick_batch(4)
    s = t.stats
    assert s["avg_ips"] > 0
    assert s["avg_batch_cost"] >= s["avg_reader_cost"]


def test_xplane_trace_to_chrome_and_op_table(tmp_path):
    """Profile a real jitted call, then run both xplane consumers on
    the dump: the Chrome-trace converter (utils/timeline.py) and the
    per-op aggregation tool (tools/op_table.py)."""
    pytest.importorskip("tensorflow.tsl.profiler.protobuf")
    import glob
    import sys
    from pathlib import Path

    import jax

    from parakeet_tpu.utils.timeline import xplane_to_chrome_trace

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((64, 64))
    f(x).block_until_ready()            # compile outside the trace
    jax.profiler.start_trace(str(tmp_path))
    f(x).block_until_ready()
    jax.profiler.stop_trace()
    dumps = glob.glob(str(tmp_path / "plugins/profile/*/*.xplane.pb"))
    assert dumps, "profiler wrote no xplane dump"

    events = xplane_to_chrome_trace(dumps[0])
    xs = [e for e in events if e["ph"] == "X"]
    assert xs and all(e["dur"] >= 0 for e in xs)
    assert any(e["ph"] == "M" for e in events)  # track metadata

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    try:
        from op_table import op_table
    finally:
        sys.path.pop(0)
    rows = op_table(dumps[0])
    assert rows and rows[0][1] >= rows[-1][1]   # sorted by total desc
    names = {r[0] for r in rows}
    assert any("fusion" in n or "dot" in n or "jit" in n.lower()
               for n in names)


def test_xplane_memory_counter_events(tmp_path):
    """Memory stats on xplane events become Chrome counter tracks
    (ph "C"), matching the reference converter's Memory counters
    (reference: parakeet/utils/timeline.py:268-280).  CPU dumps carry no
    memory stats, so synthesize an XSpace with a ``bytes_in_use`` stat
    and run it through the real serializer + parser path."""
    xplane_pb2 = pytest.importorskip(
        "tensorflow.tsl.profiler.protobuf.xplane_pb2")

    xs = xplane_pb2.XSpace()
    plane = xs.planes.add(name="/device:TPU:0")
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "fusion.1"
    plane.stat_metadata[1].id = 1
    plane.stat_metadata[1].name = "bytes_in_use"
    plane.stat_metadata[2].id = 2
    plane.stat_metadata[2].name = "flops"     # non-memory: no counter
    line = plane.lines.add(name="XLA Ops", timestamp_ns=1000)
    ev = line.events.add(metadata_id=1, offset_ps=2000, duration_ps=500)
    st = ev.stats.add(metadata_id=1)
    st.uint64_value = 123456
    st2 = ev.stats.add(metadata_id=2)
    st2.int64_value = 99
    # a later sample where the allocator drains to zero: presence (the
    # proto oneof), not truthiness, must decide — a 0 sample is real
    ev0 = line.events.add(metadata_id=1, offset_ps=9000, duration_ps=500)
    st0 = ev0.stats.add(metadata_id=1)
    st0.uint64_value = 0

    dump = tmp_path / "synthetic.xplane.pb"
    dump.write_bytes(xs.SerializeToString())

    from parakeet_tpu.utils.timeline import xplane_to_chrome_trace
    events = xplane_to_chrome_trace(str(dump))
    counters = [e for e in events if e["ph"] == "C"]
    assert [c["args"] for c in counters] == [
        {"bytes_in_use": 123456}, {"bytes_in_use": 0}]
    assert counters[0] == {
        "ph": "C", "pid": 0, "name": "bytes_in_use",
        "ts": counters[0]["ts"], "args": {"bytes_in_use": 123456},
    }
    assert counters[0]["ts"] == pytest.approx(1.002)  # us
    # the op event itself is still emitted
    assert any(e["ph"] == "X" and e["name"] == "fusion.1" for e in events)
