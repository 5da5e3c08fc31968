"""Data pipeline: corpus preprocessing + static-shape batchers + prefetch."""
from .corpus import (
    preprocess_corpus, build_moon, build_son, build_from_json_corpus,
    write_metadata, CORPUS_BUILDERS,
)
from .loader import (
    TacotronBatcher, TacotronBatch, WaveNetBatcher, WaveNetBatch,
    scan_npz_dir, round_up,
)
from .feeder import DevicePrefetcher

__all__ = [
    "preprocess_corpus", "build_moon", "build_son", "build_from_json_corpus",
    "write_metadata", "CORPUS_BUILDERS",
    "TacotronBatcher", "TacotronBatch", "WaveNetBatcher", "WaveNetBatch",
    "scan_npz_dir", "round_up", "DevicePrefetcher",
]
