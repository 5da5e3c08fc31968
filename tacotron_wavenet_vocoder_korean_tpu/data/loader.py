"""Host-side batchers with TPU-friendly static shapes.

Replaces the reference's feeder-thread + tf.FIFOQueue machinery
(reference: datasets/datafeeder_tacotron.py:75-314,
datasets/datafeeder_wavenet.py:50-167) with plain-numpy iterators:

  * length-sorted batch grouping + shuffle (datafeeder_tacotron.py:215-218)
  * per-dataset sampling weights and the ``initial_phase_step`` curriculum
    (datafeeder_tacotron.py:205-213)
  * reduction-factor rounding of target lengths (datafeeder_tacotron.py:297-314)
  * WaveNet random hop-aligned crops (datafeeder_wavenet.py:153-156)

plus shape bucketing (round padded lengths up to coarse multiples) so XLA sees
a handful of shapes instead of one per batch, and a double-buffered
device-prefetch wrapper in feeder.py.
"""
from __future__ import annotations

import glob
import os
from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..config import Config

PAD_VALUE = 0


def round_up(x: int, multiple: int) -> int:
    r = x % multiple
    return x if r == 0 else x + multiple - r


@dataclass
class TacotronBatch:
    inputs: np.ndarray          # [B, T_in] int32
    input_lengths: np.ndarray   # [B] int32
    loss_coeff: np.ndarray      # [B] float32
    mel_targets: np.ndarray     # [B, T_out, num_mels] float32
    linear_targets: np.ndarray  # [B, T_out, num_freq] float32
    speaker_id: np.ndarray      # [B] int32 (zeros when single-speaker)


def scan_npz_dir(data_dir: str, cfg: Config,
                 apply_filter: bool = True) -> List[str]:
    """List usable npz paths (reference datafeeder_tacotron.py:28-71)."""
    paths = sorted(glob.glob(os.path.join(data_dir, "*.npz")))
    if not apply_filter:
        return paths
    t = cfg.tacotron
    min_n_frame = t.reduction_factor * t.min_iters
    max_n_frame = t.reduction_factor * t.max_iters - t.reduction_factor
    keep = []
    for p in paths:
        try:
            with np.load(p) as d:
                n_frame = d["linear"].shape[0]
                n_tokens = len(d["tokens"])
        except Exception:
            continue
        if min_n_frame <= n_frame <= max_n_frame and n_tokens >= t.min_tokens:
            keep.append(p)
    # Known-bad son/yuinna clips (reference datafeeder_tacotron.py:47-49).
    if any(tag in data_dir for tag in ("son", "yuinna")):
        blacklist = (".0000.", ".0001.", "NB11479580.0001")
        keep = [p for p in keep
                if not any(b in os.path.basename(p) for b in blacklist)]
    return keep


class TacotronBatcher:
    """Epoch-style iterator over length-bucketed padded batches.

    data_dirs maps to speaker ids by position (reference
    datafeeder_tacotron.py:100-101).
    """

    def __init__(self, data_dirs: Sequence[str], cfg: Config,
                 data_type: str = "train", batch_size: Optional[int] = None,
                 batches_per_group: int = 32,
                 apply_filter: Optional[bool] = None,
                 token_bucket: int = 16, frame_bucket_iters: int = 10,
                 seed: Optional[int] = None, device_store: bool = False,
                 mesh=None):
        """``device_store=True`` (train only) preloads the whole corpus ONCE
        into device-resident arrays (spectrograms as f16) and yields batches
        assembled ON DEVICE from a per-step index gather.  Steady-state
        host->device traffic drops from ~50-130 MB/step (the tunneled chip
        moves ~30 MB/s — the train-step bottleneck) to one [B] int32 vector.
        Selection semantics (curriculum, shuffles, bucketing) are identical
        to the host path — proven by test."""
        assert data_type in ("train", "test")
        assert not (device_store and data_type == "test"), \
            "device_store is for the train stream"
        self.cfg = cfg
        self.data_type = data_type
        self.batch_size = batch_size or cfg.tacotron.batch_size
        self.batches_per_group = batches_per_group
        self.token_bucket = token_bucket
        # frames round up to multiples of r * frame_bucket_iters
        self.frame_bucket = cfg.tacotron.reduction_factor * frame_bucket_iters
        self.rng = np.random.RandomState(
            cfg.train.random_seed if seed is None else seed)
        self.step = 0

        self.data_dirs = list(data_dirs)
        self.dir_to_id = {d: i for i, d in enumerate(self.data_dirs)}
        self.is_multi_speaker = len(self.data_dirs) > 1

        self.path_dict: Dict[str, List[str]] = {}
        # Held-out examples per dir (reference keeps a small static test set;
        # datafeeder_tacotron.py:162-174).  Using batch_size here would eat
        # most of a small corpus — the test-mode iterator cycles the held-out
        # set to fill a batch, so num_test_per_speaker is enough.
        n_test = max(1, cfg.train.num_test_per_speaker)
        # apply_filter=None derives from the run config: the split-defining
        # choice is recorded in params.json (train.skip_path_filter), so
        # resumes and eval tooling reconstruct the same split by default.
        if apply_filter is None:
            apply_filter = not cfg.train.skip_path_filter
        for d in self.data_dirs:
            paths = scan_npz_dir(d, cfg, apply_filter)
            if not paths:
                raise ValueError(f"no usable npz files in {d}")
            self.rng.shuffle(paths)
            if data_type == "train":
                split = paths[:-n_test] if len(paths) > n_test else paths
            else:
                split = paths[-n_test:]
            self.path_dict[d] = split

        # Per-dataset sampling weights (reference datafeeder_tacotron.py:103-112).
        t = cfg.tacotron
        weights = {d: 1.0 for d in self.data_dirs}
        if t.main_data_greedy_factor > 0:
            for main in t.main_data:
                for d in self.data_dirs:
                    if main and main in d:
                        weights[d] += t.main_data_greedy_factor
        z = sum(weights.values())
        self.data_ratio = {d: w / z for d, w in weights.items()}

        self._offset = defaultdict(int)

        self.device_store = device_store
        self.mesh = mesh
        if device_store:
            self._build_store()

    # ------------------------------------------------------------------
    # Device-resident store
    # ------------------------------------------------------------------
    def _build_store(self) -> None:
        """Load every example once, pad to global bucket ceilings, and move
        the corpus to device (f16 spectrograms).  Per-dir index lists then
        replace the path lists for iteration."""
        records = []          # (tokens, coeff, mel, linear, sid, n_frames)
        self.idx_dict: Dict[str, List[int]] = {}
        for d in self.data_dirs:
            idxs = []
            for p in self.path_dict[d]:
                try:
                    with np.load(p) as f:
                        rec = (np.asarray(f["tokens"], np.int32),
                               float(f["loss_coeff"])
                               if "loss_coeff" in f else 1.0,
                               np.asarray(f["mel"], np.float16),
                               np.asarray(f["linear"], np.float16),
                               self.dir_to_id[d])
                except Exception:
                    continue      # corrupt npz: drop from the corpus
                idxs.append(len(records))
                records.append(rec + (rec[3].shape[0],))
            if not idxs:
                raise ValueError(f"no readable npz files in {d}")
            self.idx_dict[d] = idxs

        n = len(records)
        t_max = round_up(max(len(r[0]) for r in records), self.token_bucket)
        r_factor = self.cfg.tacotron.reduction_factor
        f_max = round_up(max(r[-1] for r in records) + 1, r_factor)
        f_max = round_up(f_max, self.frame_bucket)
        num_mels = records[0][2].shape[1]
        num_freq = records[0][3].shape[1]

        inputs = np.full((n, t_max), PAD_VALUE, np.int32)
        lengths = np.zeros(n, np.int32)
        coeffs = np.zeros(n, np.float32)
        mels = np.zeros((n, f_max, num_mels), np.float16)
        linears = np.zeros((n, f_max, num_freq), np.float16)
        speakers = np.zeros(n, np.int32)
        self.store_meta = []                 # (n_tokens, n_frames) per idx
        for i, (tok, coeff, mel, lin, sid, n_frame) in enumerate(records):
            inputs[i, :len(tok)] = tok
            lengths[i] = len(tok)
            coeffs[i] = coeff
            mels[i, :n_frame] = mel
            linears[i, :n_frame] = lin
            speakers[i] = sid
            self.store_meta.append((len(tok), n_frame))

        import jax.numpy as jnp
        host_store = {
            "inputs": inputs,
            "input_lengths": lengths,
            "loss_coeff": coeffs,
            "mel_targets": mels,
            "linear_targets": linears,
            "speaker_id": speakers,
        }
        self.store = {k: self._put_store(v) for k, v in host_store.items()}
        self.store_bytes = sum(a.size * a.dtype.itemsize
                               for a in self.store.values())

    def _put_store(self, arr: np.ndarray):
        """Move one store array to device.  Under a mesh the example dim is
        SHARDED over the data axis (each device holds 1/N of the corpus;
        batch gathers become XLA collectives over ICI) instead of replicating
        the corpus N times — the reason `--use_mesh` used to fall back to the
        slow host-transfer path."""
        import jax
        import jax.numpy as jnp
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS
        n_shard = self.mesh.shape[DATA_AXIS]
        pad = (-arr.shape[0]) % n_shard
        if pad:
            arr = np.concatenate(
                [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
        return jax.device_put(arr, NamedSharding(self.mesh, P(DATA_AXIS)))

    def _assemble_device(self, idx: np.ndarray, max_tokens: int,
                         max_frames: int):
        """On-device batch assembly: gather rows, slice to the bucket shape.
        Only ``idx`` ([B] int32) crosses the host->device link.

        First compiles happen inside the DevicePrefetcher's background
        thread, possibly concurrent with the main thread's train-step jit —
        which deadlocks on this backend (see utils/compile_lock.py), so the
        first call per (t_in, t_out) bucket is serialized."""
        import jax
        import jax.numpy as jnp
        from ..utils.compile_lock import COMPILE_LOCK
        if not hasattr(self, "_gather_fn"):
            import functools

            def _gather(store, idx, t_in, t_out):
                return {
                    "inputs": store["inputs"][idx, :t_in],
                    "input_lengths": store["input_lengths"][idx],
                    "loss_coeff": store["loss_coeff"][idx],
                    "mel_targets": store["mel_targets"][idx, :t_out],
                    "linear_targets": store["linear_targets"][idx, :t_out],
                    "speaker_id": store["speaker_id"][idx],
                }
            if self.mesh is not None:
                # batch-sharded outputs match the sharded train step's
                # in_shardings, so no resharding between gather and step
                from ..parallel.mesh import batch_sharding
                out_sh = {k: batch_sharding(self.mesh) for k in (
                    "inputs", "input_lengths", "loss_coeff", "mel_targets",
                    "linear_targets", "speaker_id")}
                self._gather_fn = jax.jit(_gather, static_argnums=(2, 3),
                                          out_shardings=out_sh)
            else:
                self._gather_fn = jax.jit(_gather, static_argnums=(2, 3))
            self._gather_compiled = set()
        args = (self.store, jnp.asarray(idx, jnp.int32),
                max_tokens, max_frames)
        bucket = (max_tokens, max_frames)
        if bucket not in self._gather_compiled:
            with COMPILE_LOCK:
                out = self._gather_fn(*args)
                jax.block_until_ready(out)
                self._gather_compiled.add(bucket)
            return out
        return self._gather_fn(*args)

    def _next_example_store(self, data_dir: str):
        idxs = self.idx_dict[data_dir]
        if self._offset[data_dir] >= len(idxs):
            self._offset[data_dir] = 0
            if self.data_type == "train":
                self.rng.shuffle(idxs)
        i = idxs[self._offset[data_dir]]
        self._offset[data_dir] += 1
        n_tokens, n_frames = self.store_meta[i]
        return (i, n_tokens, n_frames)

    def _next_example(self, data_dir: str):
        if self.device_store:
            return self._next_example_store(data_dir)
        paths = self.path_dict[data_dir]
        for _ in range(len(paths)):
            if self._offset[data_dir] >= len(paths):
                self._offset[data_dir] = 0
                if self.data_type == "train":
                    self.rng.shuffle(paths)
            p = paths[self._offset[data_dir]]
            self._offset[data_dir] += 1
            try:
                with np.load(p) as d:
                    tokens = np.asarray(d["tokens"], dtype=np.int32)
                    mel = np.asarray(d["mel"], dtype=np.float32)
                    linear = np.asarray(d["linear"], dtype=np.float32)
                    coeff = float(d["loss_coeff"]) if "loss_coeff" in d else 1.0
            except Exception:
                # corrupt npz: drop it from the epoch (reference deletes the
                # file outright, datafeeder_tacotron.py:242-249)
                paths.remove(p)
                self._offset[data_dir] = min(self._offset[data_dir],
                                             len(paths))
                continue
            return (tokens, coeff, mel, linear, self.dir_to_id[data_dir],
                    linear.shape[0])
        raise RuntimeError(f"no readable npz files remain in {data_dir}")

    def _group(self) -> List[list]:
        n = self.batch_size
        t = self.cfg.tacotron
        examples = []
        for d in self.data_dirs:
            if self.step < t.initial_phase_step:
                count = n * self.batches_per_group // len(self.data_dirs)
            else:
                count = int(n * self.batches_per_group * self.data_ratio[d])
            examples.extend(self._next_example(d) for _ in range(count))
        examples.sort(key=lambda x: x[-1])  # by target length
        batches = [examples[i:i + n] for i in range(0, len(examples), n)
                   if len(examples[i:i + n]) == n]
        self.rng.shuffle(batches)
        return batches

    def _prepare(self, batch: list) -> TacotronBatch:
        r = self.cfg.tacotron.reduction_factor
        if self.data_type == "train":
            self.rng.shuffle(batch)
        if self.device_store:
            # batch entries are (idx, n_tokens, n_frames); same bucket math
            # as the host path below, then a device-side gather.
            max_tokens = round_up(max(x[1] for x in batch), self.token_bucket)
            max_frames = round_up(max(x[2] for x in batch) + 1, r)
            max_frames = round_up(max_frames, self.frame_bucket)
            idx = np.asarray([x[0] for x in batch], np.int32)
            return self._assemble_device(idx, max_tokens, max_frames)
        max_tokens = round_up(max(len(x[0]) for x in batch), self.token_bucket)
        # +1 then round up to a bucketed multiple of r
        # (reference datafeeder_tacotron.py:297-300).
        max_frames = round_up(max(x[-1] for x in batch) + 1, r)
        max_frames = round_up(max_frames, self.frame_bucket)

        inputs = np.full((len(batch), max_tokens), PAD_VALUE, np.int32)
        lengths = np.zeros(len(batch), np.int32)
        coeffs = np.zeros(len(batch), np.float32)
        mels = np.zeros((len(batch), max_frames, batch[0][2].shape[1]), np.float32)
        linears = np.zeros((len(batch), max_frames, batch[0][3].shape[1]), np.float32)
        speakers = np.zeros(len(batch), np.int32)
        for i, (tokens, coeff, mel, linear, sid, n_frame) in enumerate(batch):
            inputs[i, :len(tokens)] = tokens
            lengths[i] = len(tokens)
            coeffs[i] = coeff
            mels[i, :n_frame] = mel
            linears[i, :n_frame] = linear
            speakers[i] = sid
        return TacotronBatch(inputs, lengths, coeffs, mels, linears, speakers)

    def __iter__(self) -> Iterator[TacotronBatch]:
        if self.data_type == "test":
            # Static batches: one fixed example set, repeated
            # (reference datafeeder_tacotron.py:162-174).
            examples = []
            while len(examples) < self.batch_size:
                for d in self.data_dirs:
                    examples.append(self._next_example(d))
                    if len(examples) >= self.batch_size:
                        break
            batch = self._prepare(examples)
            while True:
                yield batch
        while True:
            for batch in self._group():
                self.step += 1
                yield self._prepare(batch)


@dataclass
class WaveNetBatch:
    input_wav: np.ndarray        # [B, sample_size, 1] float32
    local_condition: np.ndarray  # [B, sample_size // hop, num_mels] float32
    speaker_id: np.ndarray       # [B] int32


class WaveNetBatcher:
    """Random hop-aligned crops of (audio, mel) windows
    (reference datafeeder_wavenet.py:50-159)."""

    def __init__(self, data_dirs: Sequence[str], cfg: Config,
                 batch_size: Optional[int] = None, gc_enable: bool = False,
                 seed: Optional[int] = None, batches_per_group: int = 32,
                 device_store: bool = False, data_type: str = "train",
                 mesh=None):
        """``device_store=True`` keeps every (padded) clip resident on device
        and takes the random hop-aligned crops with on-device dynamic slices;
        per-step host->device traffic is two [B] int32 vectors (clip index +
        frame offset) instead of ~0.5 MB of audio+mel.  Crop selection is
        identical to the host path (same rng stream) — proven by test.

        ``data_type``: 'train' excludes, 'test' serves, a deterministic
        held-out set of ``train.num_test_per_speaker`` clips per data dir
        (the last in sorted order) — the eval stream the reference's WaveNet
        feeder lacks entirely.  Dirs too small to split (< 2x the held-out
        count) keep every clip in both streams."""
        assert data_type in ("train", "test"), data_type
        self.data_type = data_type
        self.cfg = cfg
        self.batch_size = batch_size or cfg.wavenet.batch_size
        self.gc_enable = gc_enable
        self.batches_per_group = batches_per_group
        self.hop_size = cfg.audio.hop_size
        self.sample_size = (cfg.wavenet.sample_size
                            // self.hop_size) * self.hop_size
        self.max_frames = self.sample_size // self.hop_size
        self.rng = np.random.RandomState(
            cfg.train.random_seed if seed is None else seed)

        self.data_dirs = list(data_dirs)
        self.dir_to_id = {d: i for i, d in enumerate(self.data_dirs)}
        min_length = max(self.sample_size, cfg.wavenet.receptive_field)
        self.path_dict: Dict[str, List[str]] = {}
        for d in self.data_dirs:
            paths = []
            train_txt = os.path.join(d, "train.txt")
            if os.path.exists(train_txt):
                with open(train_txt, encoding="utf-8") as f:
                    for line in f:
                        parts = line.strip().split("|")
                        if len(parts) >= 4 and int(parts[1]) > min_length:
                            paths.append(os.path.join(d, parts[0]))
            else:
                for p in sorted(glob.glob(os.path.join(d, "*.npz"))):
                    with np.load(p) as npz:
                        if int(npz["time_steps"]) > min_length:
                            paths.append(p)
            if not paths:
                raise ValueError(
                    f"no npz with time_steps > {min_length} in {d}")
            n_test = max(1, cfg.train.num_test_per_speaker)
            if len(paths) >= 2 * n_test:
                held = set(sorted(paths)[-n_test:])
                paths = (sorted(held) if data_type == "test"
                         else [p for p in paths if p not in held])
            elif data_type == "test":
                import warnings
                warnings.warn(
                    f"{d}: only {len(paths)} usable clips (< 2x "
                    f"num_test_per_speaker={n_test}) — test stream serves "
                    f"TRAINING clips; test_loss will understate the gap")
            self.path_dict[d] = paths

            # Corpora are companded at PREPROCESS time (corpus.py:47-62:
            # mulaw-quantize stores int16 class ids, raw/mulaw store float32
            # in [-1,1]).  Training with a mismatched wavenet.input_type
            # would converge to garbage silently (e.g. round() of raw floats
            # yields 3 classes), so fail fast on the storage dtype.
            with np.load(self.path_dict[d][0]) as f0:
                dt = f0["audio"].dtype
            quantized = cfg.wavenet.input_type == "mulaw-quantize"
            if quantized != np.issubdtype(dt, np.integer):
                raise ValueError(
                    f"{d}: corpus audio dtype {dt} does not match "
                    f"wavenet.input_type={cfg.wavenet.input_type!r} — "
                    f"re-run preprocess.py with the intended input_type "
                    f"(quantized corpora store int class ids)")
        self._offset = defaultdict(int)

        self.device_store = device_store
        self.mesh = mesh
        if device_store:
            self._build_store()

    _put_store = TacotronBatcher._put_store  # same example-dim sharding

    # ------------------------------------------------------------------
    # Device-resident store (full clips on device; crops via dynamic_slice)
    # ------------------------------------------------------------------
    def _build_store(self) -> None:
        records = []                        # (audio [L,1], mel [F,80], sid)
        self.idx_dict: Dict[str, List[int]] = {}
        for d in self.data_dirs:
            idxs = []
            for p in self.path_dict[d]:
                with np.load(p) as f:
                    audio = np.asarray(f["audio"], np.float32).reshape(-1, 1)
                    mel = np.asarray(f["mel"], np.float16)
                assert len(audio) == len(mel) * self.hop_size
                idxs.append(len(records))
                records.append((audio, mel, self.dir_to_id[d]))
            self.idx_dict[d] = idxs

        n = len(records)
        f_max = max(r[1].shape[0] for r in records)
        num_mels = records[0][1].shape[1]
        audio_arr = np.zeros((n, f_max * self.hop_size, 1), np.float32)
        mel_arr = np.zeros((n, f_max, num_mels), np.float16)
        self.store_frames = np.zeros(n, np.int64)
        sids = np.zeros(n, np.int32)
        for i, (audio, mel, sid) in enumerate(records):
            audio_arr[i, :len(audio)] = audio
            mel_arr[i, :len(mel)] = mel
            self.store_frames[i] = len(mel)
            sids[i] = sid

        import jax
        import jax.numpy as jnp
        self._store_audio = self._put_store(audio_arr)
        self._store_mel = self._put_store(mel_arr)
        self._store_sid = self._put_store(sids)
        self.store_bytes = sum(
            a.size * a.dtype.itemsize
            for a in (self._store_audio, self._store_mel, self._store_sid))

        hop, sample_size, max_frames = \
            self.hop_size, self.sample_size, self.max_frames

        def _gather(audio_s, mel_s, sid_s, idx, frame_off):
            def one(i, s):
                a = jax.lax.dynamic_slice(
                    audio_s[i], (s * hop, 0), (sample_size, 1))
                m = jax.lax.dynamic_slice(
                    mel_s[i], (s, 0), (max_frames, mel_s.shape[-1]))
                return a, m
            a, m = jax.vmap(one)(idx, frame_off)
            return {"input_wav": a,
                    "local_condition": m.astype(jnp.float32),
                    "speaker_id": sid_s[idx]}
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding
            out_sh = {k: batch_sharding(self.mesh) for k in (
                "input_wav", "local_condition", "speaker_id")}
            self._gather_fn = jax.jit(_gather, out_shardings=out_sh)
        else:
            self._gather_fn = jax.jit(_gather)

    def _next_example(self, data_dir: str):
        paths = (self.idx_dict[data_dir] if self.device_store
                 else self.path_dict[data_dir])
        if self._offset[data_dir] >= len(paths):
            self._offset[data_dir] = 0
            self.rng.shuffle(paths)
        p = paths[self._offset[data_dir]]
        self._offset[data_dir] += 1
        if self.device_store:
            n_frames = int(self.store_frames[p])
            s = self.rng.randint(0, n_frames - self.max_frames + 1)
            return (p, s)
        with np.load(p) as d:
            audio = np.asarray(d["audio"], dtype=np.float32).reshape(-1, 1)
            mel = np.asarray(d["mel"], dtype=np.float32)
        assert len(audio) % len(mel) == 0
        assert len(audio) // len(mel) == self.hop_size
        s = self.rng.randint(0, len(mel) - self.max_frames + 1)
        ts = s * self.hop_size
        return (audio[ts:ts + self.sample_size],
                mel[s:s + self.max_frames],
                self.dir_to_id[data_dir])

    def __iter__(self) -> Iterator[WaveNetBatch]:
        import jax.numpy as jnp
        n = self.batch_size
        while True:
            examples = []
            for d in self.data_dirs:
                count = n * self.batches_per_group // len(self.data_dirs)
                examples.extend(self._next_example(d) for _ in range(count))
            self.rng.shuffle(examples)
            for i in range(0, len(examples) - n + 1, n):
                batch = examples[i:i + n]
                if self.device_store:
                    args = (self._store_audio, self._store_mel,
                            self._store_sid,
                            jnp.asarray([b[0] for b in batch], jnp.int32),
                            jnp.asarray([b[1] for b in batch], jnp.int32))
                    if not getattr(self, "_gather_ready", False):
                        # first compile may happen inside the prefetcher
                        # thread concurrently with the train-step jit —
                        # serialize it (see utils/compile_lock.py)
                        import jax
                        from ..utils.compile_lock import COMPILE_LOCK
                        with COMPILE_LOCK:
                            out = self._gather_fn(*args)
                            jax.block_until_ready(out)
                            self._gather_ready = True
                        yield out
                        continue
                    yield self._gather_fn(*args)
                    continue
                yield WaveNetBatch(
                    input_wav=np.stack([b[0] for b in batch]),
                    local_condition=np.stack([b[1] for b in batch]),
                    speaker_id=np.asarray([b[2] for b in batch], np.int32),
                )
