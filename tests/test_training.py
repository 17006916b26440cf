"""Training-runtime tests: triggers, reporter, snapshot ring, trainer loop.

Modeled on the reference's fake-updater strategy (reference:
tests/unit/test_snapshot.py): exercise the runtime without a real model.
"""
import numpy as np
import pytest

from parakeet_tpu import training as T


class FakeUpdater(T.UpdaterBase):
    def __init__(self):
        super().__init__()
        self.saved_paths = []

    def update(self):
        self.state.iteration += 1
        if self.state.iteration % 10 == 0:
            self.state.epoch += 1
        T.report("train/loss", 1.0 / self.state.iteration)
        T.report("train/batch_size", 4)

    def save(self, path):
        T.save_pytree(path, {"w": np.zeros(3)}, metadata=self.state_dict())
        self.saved_paths.append(path)

    def load(self, path):
        _, meta = T.load_pytree(path)
        self.set_state_dict(meta)


def test_reporter_scope_nesting():
    outer, inner = {}, {}
    with T.scope(outer):
        T.report("a", 1)
        with T.scope(inner):
            T.report("b", 2)
        T.report("c", 3)
    assert outer == {"a": 1, "c": 3}
    assert inner == {"b": 2}
    T.report("ignored", 0)  # no active scope: no-op


def test_summary_statistics():
    s = T.Summary()
    for v in [1.0, 2.0, 3.0]:
        s.add(v)
    mean, std = s.make_statistics()
    assert mean == pytest.approx(2.0)
    assert std == pytest.approx(np.std([1, 2, 3]))
    ds = T.DictSummary()
    ds.add({"x": 1.0, "skip": "str"})
    ds.add({"x": 3.0})
    assert ds.compute_mean() == {"x": 2.0}


def test_interval_and_limit_triggers():
    class Obj:
        pass
    trainer = Obj()
    updater = FakeUpdater()
    trainer.updater = updater
    it = T.IntervalTrigger(5, "iteration")
    fires = []
    for i in range(12):
        updater.state.iteration = i
        if it(trainer):
            fires.append(i)
    assert fires == [5, 10]
    lim = T.LimitTrigger(10, "iteration")
    updater.state.iteration = 9
    assert not lim(trainer)
    updater.state.iteration = 10
    assert lim(trainer)


def test_snapshot_ring_keeps_max_size(tmp_path):
    ring = T.SnapshotRing(tmp_path, max_size=3)
    for i in range(1, 8):
        ring.save(i, {"w": np.full(2, i)})
    assert len(ring.records) == 3
    kept = sorted(p.name for p in tmp_path.glob("snapshot_iter_*.npz"))
    assert kept == ["snapshot_iter_5.npz", "snapshot_iter_6.npz",
                    "snapshot_iter_7.npz"]
    assert ring.latest()["iteration"] == 7
    # fresh ring reloads the ledger
    ring2 = T.SnapshotRing(tmp_path, max_size=3)
    assert ring2.latest()["iteration"] == 7


def test_pytree_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(4, dtype=np.float32),
            "nested": {"b": np.ones((2, 2)), "c": np.int64(3)}}
    T.save_pytree(tmp_path / "x.npz", tree, metadata={"iteration": 5})
    loaded, meta = T.load_pytree(tmp_path / "x.npz", template=tree)
    assert meta["iteration"] == 5
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["nested"]["b"], tree["nested"]["b"])


def test_trainer_runs_extensions_and_snapshots(tmp_path, caplog):
    updater = FakeUpdater()
    trainer = T.Trainer(updater, stop_trigger=(30, "iteration"),
                        out=tmp_path)
    trainer.extend(T.Snapshot(max_size=2), trigger=(10, "iteration"))
    calls = []

    @T.make_extension(trigger=(7, "iteration"))
    def probe(tr):
        calls.append(tr.updater.state.iteration)

    trainer.extend(probe)
    trainer.run()
    assert updater.state.iteration == 30
    assert calls == [7, 14, 21, 28]
    snaps = sorted(p.name for p in (tmp_path / "checkpoints").glob("*.npz"))
    assert snaps == ["snapshot_iter_20.npz", "snapshot_iter_30.npz"]
    with pytest.raises(RuntimeError):
        trainer.run()  # cannot run twice


def test_trainer_auto_resume(tmp_path):
    import parakeet_tpu.training as Tr
    u1 = FakeUpdater()
    t1 = Tr.Trainer(u1, stop_trigger=(20, "iteration"), out=tmp_path)
    t1.extend(Tr.Snapshot(max_size=3), trigger=(10, "iteration"))
    t1.run()
    # new trainer resumes from iteration 20 and continues to 25
    u2 = FakeUpdater()
    t2 = Tr.Trainer(u2, stop_trigger=(25, "iteration"), out=tmp_path)
    t2.extend(Tr.Snapshot(max_size=3), trigger=(10, "iteration"))
    t2.run()
    assert u2.state.iteration == 25


def test_trainer_on_error_called(tmp_path):
    class FailingUpdater(FakeUpdater):
        def update(self):
            super().update()
            if self.state.iteration >= 3:
                raise RuntimeError("boom")

    import parakeet_tpu.training as Tr
    errors = []

    class Probe(Tr.Extension):
        def __call__(self, trainer):
            pass

        def on_error(self, trainer, exc, tb):
            errors.append(str(exc))

    t = Tr.Trainer(FailingUpdater(), stop_trigger=(10, "iteration"),
                   out=tmp_path)
    t.extend(Probe())
    with pytest.raises(RuntimeError):
        t.run()
    assert errors == ["boom"]


def test_config_yaml_opts_freeze(tmp_path):
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text("model:\n  adim: 384\n  layers: 4\nlr: 0.001\n")
    cfg = T.Config.from_yaml(cfg_path)
    assert cfg.model.adim == 384
    cfg.merge_opts(["model.adim", "512", "lr", "0.01"])
    assert cfg.model.adim == 512 and cfg.lr == 0.01
    dumped = tmp_path / "dump.yaml"
    cfg.dump(dumped)
    again = T.Config.from_yaml(dumped)
    assert again.to_dict() == cfg.to_dict()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.model.adim = 1


def test_optimizer_factory_and_schedules():
    import jax.numpy as jnp
    import optax
    tx = T.build_optimizer("adam", 1e-3, max_grad_norm=1.0)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    grads = {"w": jnp.full(3, 100.0)}
    updates, _ = tx.update(grads, state, params)
    # clipped to global norm 1 then adam-normalized
    assert np.isfinite(np.asarray(updates["w"])).all()

    sched = T.step_decay_schedule(0.1, step_size=10, gamma=0.5)
    assert sched(0) == pytest.approx(0.1)
    assert sched(10) == pytest.approx(0.05)
    assert sched(25) == pytest.approx(0.025)
    pw = T.piecewise_schedule([5, 10], [1.0, 0.5, 0.1])
    assert float(pw(0)) == 1.0
    assert float(pw(7)) == 0.5
    assert float(pw(100)) == pytest.approx(0.1)


def test_figure_writer_extension(tmp_path):
    """FigureWriter feeds fn(trainer) figures to the writer at its
    trigger (reference in-loop VisualDL add_figure,
    examples/tacotron2_aishell3/train.py:100-112)."""
    from parakeet_tpu.training.extensions.figures import FigureWriter
    from parakeet_tpu.utils import display
    import numpy as np

    logged = []

    class FakeWriter:
        def add_figure(self, tag, fig, global_step):
            logged.append((tag, global_step))

    class FakeState:
        iteration = 7

    class FakeUpdater:
        state = FakeState()

    class FakeTrainer:
        updater = FakeUpdater()

    fw = FigureWriter(
        lambda tr: {"alignment": display.plot_alignment(
            np.random.default_rng(0).random((5, 9)))},
        FakeWriter())
    fw(FakeTrainer())
    assert logged == [("alignment", 7)]


def test_resolve_model_kwargs_dtype():
    """YAML dtype strings resolve to jnp dtypes; init_type is stripped
    for inference construction."""
    import jax.numpy as jnp
    from parakeet_tpu.training.config import (inference_model_kwargs,
                                              resolve_model_kwargs)
    kw = resolve_model_kwargs({"adim": 8, "dtype": "bf16"})
    assert kw["dtype"] is jnp.bfloat16 and kw["adim"] == 8
    kw = inference_model_kwargs({"dtype": "float32", "init_type": "xavier"})
    assert kw["dtype"] is jnp.float32 and "init_type" not in kw
    import pytest
    with pytest.raises(ValueError):
        resolve_model_kwargs({"dtype": "int7"})


def test_trainer_writes_worker_log(tmp_path):
    """Trainer.setup attaches a per-rank worker_{rank}.log file handler
    (reference experiment.py:233-246)."""
    from parakeet_tpu.training.trainer import Trainer
    from parakeet_tpu.training.updater import UpdaterBase, UpdaterState

    class FakeUpdater(UpdaterBase):
        def __init__(self):
            self.state = UpdaterState()

        def update(self):
            self.state.iteration += 1

    t = Trainer(FakeUpdater(), (3, "iteration"), out=tmp_path)
    t.run()
    log = tmp_path / "worker_0.log"
    assert log.exists()
    assert "iter" in log.read_text()
