"""Data-layer tests: batchers, combinators, collators, stats, textgrid."""
import numpy as np
import pytest

from parakeet_tpu import data as D


def test_batch_text_id_bucketing():
    ids, lens = D.batch_text_id([[1, 2, 3], [4]], bucket_size=8)
    assert ids.shape == (2, 8)
    assert ids.dtype == np.int64
    np.testing.assert_array_equal(lens, [3, 1])
    np.testing.assert_array_equal(ids[1], [4, 0, 0, 0, 0, 0, 0, 0])


def test_batch_spec_time_axis():
    specs = [np.ones((5, 4)), np.ones((3, 4))]
    padded, lens = D.batch_spec(specs, bucket_size=4)
    assert padded.shape == (2, 8, 4)
    np.testing.assert_array_equal(lens, [5, 3])
    assert padded[1, 3:].sum() == 0


def test_bucket_length():
    assert D.bucket_length(5, 32) == 32
    assert D.bucket_length(33, 32) == 64
    assert D.bucket_length(100, 32, cap=64) == 64


def test_dataset_combinators():
    base = list(range(10))
    a, b = D.split(base, 6)
    assert len(a) == 6 and len(b) == 4 and b[0] == 6
    t = D.TransformDataset(base, lambda x: x * 2)
    assert t[3] == 6
    tup = D.TupleDataset(base, base)
    assert tup[2] == (2, 2)
    dd = D.DictDataset(x=base, y=base)
    assert dd[1] == {"x": 1, "y": 1}
    sub = D.SubsetDataset(base, [9, 0])
    assert sub[0] == 9 and len(sub) == 2
    filt = D.FilterDataset(base, lambda v: v % 2 == 0)
    assert len(filt) == 5 and filt[1] == 2
    chain = D.ChainDataset(base, base)
    assert len(chain) == 20 and chain[15] == 5
    cache = D.CacheDataset(base)
    assert cache[4] == 4 and cache[4] == 4


def test_datatable_converters():
    rows = [{"a": "1", "b": "x"}, {"a": "2", "b": "y"}]
    dt = D.DataTable(rows, converters={"a": int})
    assert dt[0] == {"a": 1, "b": "x"}
    assert len(dt) == 2
    dt2 = D.DataTable(rows, fields=["b"], use_cache=True)
    assert dt2[1] == {"b": "y"}


def test_fastspeech2_batch_fn():
    rng = np.random.default_rng(0)
    examples = [
        {
            "text": np.arange(n, dtype=np.int64),
            "speech": rng.random((n * 4, 10), dtype=np.float64).astype(
                np.float32),
            "durations": np.full(n, 4, dtype=np.int64),
            "pitch": rng.random((n, 1)).astype(np.float32),
            "energy": rng.random((n, 1)).astype(np.float32),
            "spk_id": 3,
        }
        for n in (5, 9)
    ]
    b = D.fastspeech2_batch_fn(examples, spk=True)
    assert b["text"].shape == (2, 16)
    assert b["speech"].shape == (2, 64, 10)
    np.testing.assert_array_equal(b["text_lengths"], [5, 9])
    np.testing.assert_array_equal(b["speech_lengths"], [20, 36])
    assert b["pitch"].shape == (2, 16, 1)
    np.testing.assert_array_equal(b["spk_id"], [3, 3])


def test_vocoder_clip():
    rng = np.random.default_rng(1)
    hop = 256
    examples = [
        {"wave": rng.standard_normal(n_frames * hop).astype(np.float32),
         "feats": rng.standard_normal((n_frames, 80)).astype(np.float32)}
        for n_frames in (120, 200, 50)  # 50 gets filtered out
    ]
    clip = D.VocoderClip(batch_max_steps=20480, hop_size=hop,
                         aux_context_window=2,
                         rng=np.random.default_rng(2))
    batch = clip(examples)
    assert batch["wav"].shape == (2, 20480)
    assert batch["mel"].shape == (2, 80 + 4, 80)
    # wav window must align with mel window (offset by context window)
    # reconstruct: wav[i] == wave[start*hop : ...] for some start
    for i, ex in enumerate(examples[:2]):
        w = batch["wav"][i]
        found = False
        for start in range(ex["feats"].shape[0]):
            s = start * hop
            if s + 20480 <= len(ex["wave"]) and np.array_equal(
                    ex["wave"][s:s + 20480], w):
                mel_ref = ex["feats"][start - 2:start + 80 + 2]
                np.testing.assert_array_equal(batch["mel"][i], mel_ref)
                found = True
                break
        assert found


def test_sharded_batch_sampler_partition():
    total, bs = 100, 5
    all_batches = []
    for shard in range(4):
        s = D.ShardedBatchSampler(total, bs, num_shards=4, shard_id=shard,
                                  shuffle=True, seed=7)
        s.set_epoch(3)
        all_batches.extend(tuple(b) for b in s)
    # disjoint and exhaustive over the common permutation
    flat = [i for b in all_batches for i in b]
    assert sorted(flat) == list(range(100))
    # same epoch -> same permutation across shards; different epoch differs
    s0 = D.ShardedBatchSampler(total, bs, num_shards=4, shard_id=0, seed=7)
    s0.set_epoch(3)
    e3 = list(s0)
    s0.set_epoch(4)
    assert list(s0) != e3


def test_dataloader_prefetch_and_order():
    ds = list(range(32))
    sampler = D.BatchSampler(32, 4, shuffle=False)
    loader = D.DataLoader(ds, sampler, collate_fn=lambda xs: np.asarray(xs),
                          prefetch=2)
    batches = list(loader)
    assert len(batches) == 8
    np.testing.assert_array_equal(batches[0], [0, 1, 2, 3])
    # errors propagate
    def bad(xs):
        raise RuntimeError("boom")
    with pytest.raises(RuntimeError):
        list(D.DataLoader(ds, sampler, collate_fn=bad, prefetch=2))


def test_running_stats_matches_numpy():
    rng = np.random.default_rng(3)
    chunks = [rng.standard_normal((n, 4)) * 3 + 1 for n in (10, 1, 57)]
    rs = D.RunningStats(4)
    for c in chunks:
        rs.update(c)
    full = np.concatenate(chunks)
    np.testing.assert_allclose(rs.mean, full.mean(0), atol=1e-10)
    np.testing.assert_allclose(rs.std, full.std(0), atol=1e-10)


def test_duration_file_roundtrip(tmp_path):
    path = tmp_path / "durations.txt"
    path.write_text("utt1|spk_a|sil 10 a1 5 sp 3 sil 2\n"
                    "utt2|spk_b|sil 4 b2 6 sp 20\n")
    sentences, speakers = D.read_duration_file(path)
    assert speakers == {"spk_a", "spk_b"}
    assert sentences["utt1"][0] == ["sil", "a1", "sp", "sil"]
    D.merge_silence(sentences)
    # sp followed by sil merges into sil; long sp becomes spl
    assert sentences["utt1"][0] == ["sil", "a1", "sil"]
    assert sentences["utt1"][1] == [10, 5, 5]
    assert sentences["utt2"][0] == ["sil", "b2", "spl"]


def test_phone_id_map(tmp_path):
    sentences = {"u": [["a1", "sil"], [1, 2], "s"]}
    table = D.build_phone_id_map(sentences, tmp_path / "p.txt",
                                 dataset="ljspeech")
    assert table[:2] == ["<pad>", "<unk>"]
    assert table[-1] == "<eos>"
    assert "," in table
    loaded = D.load_id_map(tmp_path / "p.txt")
    assert loaded["<pad>"] == 0 and loaded["<eos>"] == len(table) - 1


def test_reconcile_durations():
    s = {"u": [["a", "b"], [5, 5], "spk"]}
    assert D.reconcile_durations(s, "u", 12)
    assert s["u"][1] == [5, 7]
    assert D.reconcile_durations(s, "u", 8)
    assert s["u"][1] == [5, 3]
    s2 = {"u": [["a", "b"], [1, 1], "spk"]}
    assert not D.reconcile_durations(s2, "u", -5)
    assert "u" not in s2


def test_textgrid_parse(tmp_path):
    tg = tmp_path / "x.TextGrid"
    tg.write_text('''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 1.0
            text = "hello"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.25
            text = ""
        intervals [2]:
            xmin = 0.25
            xmax = 0.75
            text = "HH"
        intervals [3]:
            xmin = 0.75
            xmax = 1.0
            text = "sp"
''')
    tiers = D.parse_textgrid(tg)
    assert set(tiers) == {"words", "phones"}
    phones, durs = D.textgrid_to_durations(tg, sample_rate=24000, n_shift=300)
    assert phones == ["sil", "HH", "sil"]  # edge "" -> sil, last sp -> sil
    assert sum(durs) == 24000 // 300
