"""Host-side data pipeline: tables, batchers, collators, loaders."""
from .batch import (batch_sequences, batch_spec, batch_text_id, batch_wav,
                    bucket_length, round_up)
from .collate import (VocoderClip, fastspeech2_batch_fn,
                      speedyspeech_batch_fn, tacotron2_batch_fn,
                      transformer_tts_batch_fn)
from .dataloader import BatchSampler, DataLoader, ShardedBatchSampler
from .dataset import (CacheDataset, ChainDataset, DictDataset, FilterDataset,
                      SliceDataset, SubsetDataset, TransformDataset,
                      TupleDataset, split)
from .datasets import (AudioDataset, AudioFolderDataset, AudioSegmentDataset,
                       LJSpeechMetaData)
from .datatable import DataTable, read_jsonl, write_jsonl
from .preprocess import (RunningStats, build_phone_id_map,
                         build_phone_tone_id_maps, build_spk_id_map,
                         load_id_map, merge_silence, read_duration_file,
                         reconcile_durations)
from .textgrid import (gen_duration_from_textgrid, parse_textgrid,
                       textgrid_to_durations)

__all__ = [
    "batch_sequences", "batch_text_id", "batch_wav", "batch_spec",
    "bucket_length", "round_up",
    "fastspeech2_batch_fn", "speedyspeech_batch_fn",
    "transformer_tts_batch_fn", "tacotron2_batch_fn", "VocoderClip",
    "BatchSampler", "ShardedBatchSampler", "DataLoader",
    "split", "TransformDataset", "CacheDataset", "TupleDataset",
    "DictDataset", "SliceDataset", "SubsetDataset", "FilterDataset",
    "ChainDataset",
    "AudioDataset", "AudioSegmentDataset", "AudioFolderDataset",
    "LJSpeechMetaData",
    "DataTable", "read_jsonl", "write_jsonl",
    "read_duration_file", "merge_silence", "build_phone_id_map",
    "build_phone_tone_id_maps", "build_spk_id_map", "load_id_map",
    "reconcile_durations", "RunningStats",
    "parse_textgrid", "textgrid_to_durations", "gen_duration_from_textgrid",
]
