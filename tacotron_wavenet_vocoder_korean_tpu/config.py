"""Configuration system: explicit, typed, JSON round-trippable.

Replaces the reference's module-global ``tf.contrib.training.HParams`` singleton
(reference: hparams.py:6-176) with frozen dataclasses grouped by subsystem.  The
``params.json``-in-rundir contract (reference: utils/__init__.py:143-172) is
preserved via :func:`save_config` / :func:`load_config` / :func:`overlay`.

Derived-field invariants enforced at construction (reference: hparams.py:62-79):
  * ``prod(upsample_factor) == hop_size``
  * ``out_channels % 3 == 0`` (mixture-of-logistics needs 3 params per component)
  * ``scalar_input`` must agree with ``input_type``
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple


@dataclass(frozen=True)
class AudioConfig:
    """Audio analysis/synthesis parameters (reference: hparams.py:17-56)."""

    sample_rate: int = 24000
    hop_size: int = 300              # 12.5 ms
    fft_size: int = 2048
    win_size: int = 1200             # 50 ms
    num_mels: int = 80

    preemphasize: bool = True
    preemphasis: float = 0.97
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    signal_normalization: bool = True
    allow_clipping_in_normalization: bool = True
    symmetric_mels: bool = True
    max_abs_value: float = 4.0

    rescaling: bool = True
    rescaling_max: float = 0.999

    trim_silence: bool = True
    trim_fft_size: int = 512
    trim_hop_size: int = 128
    trim_top_db: float = 23.0

    clip_mels_length: bool = True
    max_mel_frames: int = 1000

    griffin_lim_iters: int = 60
    power: float = 1.5

    @property
    def num_freq(self) -> int:
        return self.fft_size // 2 + 1

    @property
    def frame_shift_ms(self) -> float:
        return self.hop_size * 1000.0 / self.sample_rate

    @property
    def frame_length_ms(self) -> float:
        return self.win_size * 1000.0 / self.sample_rate


@dataclass(frozen=True)
class TacotronConfig:
    """Tacotron-1 model hyperparameters (reference: hparams.py:106-168)."""

    cleaners: str = "korean_cleaners"

    # multi-speaker conditioning: 'single' | 'simple' | 'deepvoice'
    model_type: str = "deepvoice"
    num_speakers: int = 1
    speaker_embedding_size: int = 16

    embedding_size: int = 256
    dropout_prob: float = 0.5

    # Encoder
    enc_prenet_sizes: Tuple[int, ...] = (256, 128)
    enc_bank_size: int = 16
    enc_bank_channel_size: int = 128
    enc_maxpool_width: int = 2
    enc_highway_depth: int = 4
    enc_rnn_size: int = 128
    enc_proj_sizes: Tuple[int, ...] = (128, 128)
    enc_proj_width: int = 3

    # Attention: bah_mon_norm | bah_mon | loc_sen | gmm | bah | bah_norm |
    #            luong | luong_scaled
    attention_type: str = "bah_mon_norm"
    attention_size: int = 256
    attention_state_size: int = 256

    # Decoder
    dec_layer_num: int = 2
    dec_rnn_size: int = 256
    dec_prenet_sizes: Tuple[int, ...] = (256, 128)
    # Reference tacotron.py:41 keeps decoder-prenet dropout LIVE in test mode
    # (keithito-lineage Tacotron trait: inference-time prenet dropout adds
    # variation the autoregressive decoder was trained against).  True matches
    # the reference; inference callers must supply a 'dropout' rng to opt in
    # (apply() without one stays deterministic, so tests/exactness paths are
    # unaffected).  See docs/ROUND2.md for the A/B MCD measurement.
    dec_prenet_dropout_inference: bool = True

    # Post-net CBHG
    post_bank_size: int = 8
    post_bank_channel_size: int = 128
    post_maxpool_width: int = 2
    post_highway_depth: int = 4
    post_rnn_size: int = 128
    post_proj_sizes: Tuple[int, ...] = (256, 80)
    post_proj_width: int = 3

    reduction_factor: int = 5

    # Scheduled sampling (Bengio et al. 2015) — exposure-bias mitigation the
    # reference lacks (its helpers.py:36-47 train with 100% teacher forcing;
    # heldout free-run MCD regressed 42.55->44.60 between 50k and 106k on the
    # ~130-clip bundled corpus, see docs/ROUND4.md).  When enabled, each
    # decoder step feeds the TEACHER frame with probability p and the model's
    # own previous output otherwise; p ramps linearly
    # 1.0 -> ss_final_prob over [ss_start_step, ss_start_step+ss_ramp_steps].
    # Off (False) = exact reference parity.  No extra params: checkpoints are
    # interchangeable across this flag.
    scheduled_sampling: bool = False
    ss_final_prob: float = 0.7
    ss_start_step: int = 10000
    ss_ramp_steps: int = 20000

    # Length bounds (reference: hparams.py:162-164)
    min_tokens: int = 30
    min_iters: int = 30
    max_iters: int = 200

    # Training
    # 'bfloat16' runs the encoder/decoder/postnet compute in bf16 (params and
    # attention math stay f32 — TPU mixed precision); 'float32' is exact.
    compute_dtype: str = "float32"
    # XLA unroll factor for the sequential loops (decoder scan + GRU RNNs).
    # Pure scheduling knob: >1 trades compile time/code size for fewer loop
    # iterations and more instruction-level overlap; outputs are identical.
    scan_unroll: int = 1
    # Fused GRU kernels: one [D,3H] input matmul (hoisted out of the scan
    # for full sequences) + one [H,3H] recurrent matmul per step, vs flax
    # GRUCell's six Denses.  Same math, different param layout — convert old
    # checkpoints with models.modules.fuse_gru_params.
    fused_rnn: bool = False
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    initial_learning_rate: float = 1e-3
    decay_learning_rate_mode: int = 0
    batch_size: int = 32
    prioritize_loss: bool = False
    initial_data_greedy: bool = True
    initial_phase_step: int = 8000
    main_data_greedy_factor: float = 0.0
    main_data: Tuple[str, ...] = ("",)


@dataclass(frozen=True)
class WaveNetConfig:
    """WaveNet vocoder hyperparameters (reference: hparams.py:54-100)."""

    input_type: str = "raw"           # 'raw' | 'mulaw' | 'mulaw-quantize'
    scalar_input: bool = True

    filter_width: int = 2
    initial_filter_width: int = 32
    dilations: Tuple[int, ...] = tuple([1, 2, 4, 8, 16, 32, 64, 128, 256, 512] * 5)
    residual_channels: int = 32
    dilation_channels: int = 32
    quantization_channels: int = 256
    out_channels: int = 30
    skip_channels: int = 512
    use_biases: bool = True

    gc_channels: int = 32             # speaker (global condition) embedding dim
    num_speakers: int = 1             # global_condition_cardinality
    local_condition_channels: int = 80
    upsample_factor: Tuple[int, ...] = (5, 5, 12)

    sample_size: int = 15000
    silence_threshold: int = 0
    l2_regularization_strength: float = 0.0

    # Weight normalization (arXiv 1602.07868) on every stack weight — the
    # r9y9/wavenet_vocoder lineage applies it to all convs and converges
    # substantially faster; the TF reference dropped it (plain conv1d,
    # wavenet/model.py:112-167).  Off by default = reference parity.
    # Checkpoints are NOT layout-compatible across this flag; generation
    # paths consume ``materialize_wn_params`` output (models/wavenet.py).
    weight_normalization: bool = False

    # Training
    # 'bfloat16' runs the dilated-conv stack in bf16 (params, targets and the
    # MoL loss stay f32); 'float32' is exact.
    compute_dtype: str = "float32"
    batch_size: int = 8
    num_steps: int = 200000
    learning_rate: float = 1e-3
    decay_rate: float = 0.5
    decay_steps: int = 300000
    clip_gradients: bool = False
    ema_decay: float = 0.9999
    optimizer: str = "adam"
    momentum: float = 0.9

    @property
    def receptive_field(self) -> int:
        """Samples of context needed for one output sample.

        Mirrors reference wavenet/model.py:32-39: (fw-1)*sum(dilations)+1 plus
        the front causal conv's context.
        """
        rf = (self.filter_width - 1) * sum(self.dilations) + 1
        if self.scalar_input:
            rf += self.initial_filter_width - 1
        else:
            rf += self.filter_width - 1
        return rf


@dataclass(frozen=True)
class TrainConfig:
    """Run-level training knobs (reference: train_tacotron.py:256-281 argparse)."""

    random_seed: int = 123
    checkpoint_interval: int = 2000
    test_interval: int = 500
    summary_interval: int = 100
    max_checkpoints: int = 3
    # Best-heldout checkpoint retention (VERDICT r4 missing #1): every
    # test_interval the Tacotron driver scores this many FIXED heldout
    # batches with the free-running eval model and keeps the argmin-loss
    # checkpoint under <log_dir>/best/ alongside the rolling latest ones.
    # The reference instead keeps EVERY checkpoint (max_to_keep=None,
    # train_tacotron.py:165) so the best can be picked post-hoc; tracking
    # the free-run heldout loss online gets the same outcome at ~1/50th
    # the disk.  0 disables.
    best_eval_batches: int = 2
    skip_path_filter: bool = False
    num_test_per_speaker: int = 2
    loss_explosion_threshold: float = 100.0
    store_metadata: bool = False      # opt-in profiler trace
    # Keep the whole (bucketed, f16-spectrogram) training corpus resident on
    # device and assemble batches with an on-device index gather — per-step
    # host->device traffic becomes one [B] int32 vector.  Decisive on the
    # tunneled chip (~30 MB/s transfer path); disable for corpora too big
    # for HBM.  Single-device only (falls back to host batching on a mesh).
    device_resident_data: bool = True
    # Host->device transfer dtype for bulky spectrogram targets ('float16'
    # or 'float32').  The tunneled chip's transfer path is the train-step
    # bottleneck (~30 MB/s); f16 halves->quarters the bytes and the task
    # upcasts to f32 on device (~1e-3 quantization, far below the L1 losses
    # it feeds).  'float32' is exact.
    transfer_dtype: str = "float16"
    # Host<->device sync cadence (steps) in the train loops.  Between syncs
    # the host races ahead and steps queue on the device; each sync (a loss
    # fetch) costs a full tunnel round trip (~100 ms), so amortizing it over
    # 30 steps keeps the overhead ~3 ms/step (at 10 it was ~8% of a WaveNet
    # step).  Also the cadence of step logging, STOP-file polling, NaN/
    # explosion checks and hang-watchdog beats; summary/eval/checkpoint
    # intervals sync exactly regardless.
    sync_every: int = 30
    # Elastic-recovery watchdog: if host RSS exceeds this, the train driver
    # checkpoints and exec-restarts itself with --load_path (resumes at the
    # same step; the persistent compile cache makes restarts cheap).  Needed
    # because the tunneled TPU client retains a host copy of every
    # host->device transfer (~batch_size MB leaked per step).  <=0 disables.
    max_host_rss_gb: float = 60.0
    # Slowdown watchdog: the same per-transfer host leak also progressively
    # slows the whole RPC path — measured: a fresh WaveNet campaign process
    # steps at ~0.12 s/step and degrades to ~0.18 s/step (+50%) within ~2 h,
    # long before the RSS limit.  When the median recent step time exceeds
    # this ratio times the best median seen in this process, the driver
    # checkpoints and exec-restarts itself (the eval_shape-skeleton restore
    # makes the resume cost ~35 s, so restarting early nets ~10-20% campaign
    # throughput).  <=1 disables.
    restart_slowdown_ratio: float = 1.25
    # Hang watchdog: hard-exit (code 42) if the train loop makes no progress
    # for this many seconds — a lost RPC on the tunneled chip blocks the loop
    # (and any checkpoint save) in native code forever, and only the client's
    # death releases the device lease.  Must comfortably exceed the slowest
    # single first-compile (~5 min for the biggest Tacotron bucket).  <=0
    # disables.  Run campaigns under a supervisor loop that resumes with
    # --load_path when the process exits 42.
    hang_timeout_s: float = 1200.0
    # Grace before the FIRST beat of a process: restore + whole-train-step
    # compile + first fetch happen before the loop can beat, and on slow
    # backend days that chain legitimately exceeds hang_timeout_s (observed
    # >20 min on 2026-08-20; each premature kill re-wedged the chip ~40 min
    # and the campaign never reached step 1).  After the first beat the
    # steady-state hang_timeout_s applies.  Ignored unless > hang_timeout_s.
    first_hang_timeout_s: float = 2700.0


@dataclass(frozen=True)
class Config:
    """Top-level bundle of all subsystem configs."""

    audio: AudioConfig = field(default_factory=AudioConfig)
    tacotron: TacotronConfig = field(default_factory=TacotronConfig)
    wavenet: WaveNetConfig = field(default_factory=WaveNetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def __post_init__(self):
        validate(self)


def validate(cfg: Config) -> None:
    """Cross-field invariants (reference: hparams.py:62-79 comments)."""
    w = cfg.wavenet
    if math.prod(w.upsample_factor) != cfg.audio.hop_size:
        raise ValueError(
            f"prod(upsample_factor)={math.prod(w.upsample_factor)} must equal "
            f"hop_size={cfg.audio.hop_size}")
    if w.scalar_input and w.out_channels % 3 != 0:
        raise ValueError("out_channels must be a multiple of 3 for MoL output")
    scalar = w.input_type in ("raw", "mulaw")
    if scalar != w.scalar_input:
        raise ValueError(
            f"input_type={w.input_type!r} implies scalar_input={scalar}, got "
            f"{w.scalar_input}")
    if w.sample_size < w.receptive_field:
        raise ValueError(
            f"sample_size={w.sample_size} must be >= receptive_field="
            f"{w.receptive_field}")


# ---------------------------------------------------------------------------
# JSON persistence: the params.json-in-rundir contract.
# ---------------------------------------------------------------------------

def to_dict(cfg: Config) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def _coerce(dc_cls, data: Dict[str, Any]):
    """Build a dataclass from a dict, tolerating unknown keys and coercing
    lists back to tuples for tuple-typed fields."""
    fields = {f.name: f for f in dataclasses.fields(dc_cls)}
    kwargs = {}
    for k, v in data.items():
        if k not in fields:
            continue
        if isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    return dc_cls(**kwargs)


def from_dict(data: Dict[str, Any]) -> Config:
    return Config(
        audio=_coerce(AudioConfig, data.get("audio", {})),
        tacotron=_coerce(TacotronConfig, data.get("tacotron", {})),
        wavenet=_coerce(WaveNetConfig, data.get("wavenet", {})),
        train=_coerce(TrainConfig, data.get("train", {})),
    )


def save_config(cfg: Config, log_dir: str, filename: str = "params.json") -> str:
    """Write the config into a run dir (reference: utils/__init__.py:143-155)."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, filename)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(to_dict(cfg), f, indent=2, sort_keys=True, ensure_ascii=False)
    return path


def load_config(log_dir: str, filename: str = "params.json") -> Config:
    """Load a config previously written by :func:`save_config`
    (reference: utils/__init__.py:156-172)."""
    path = os.path.join(log_dir, filename)
    with open(path, encoding="utf-8") as f:
        return from_dict(json.load(f))


def overlay(base: Config, **groups: Dict[str, Any]) -> Config:
    """Return a new Config with per-group field overrides applied.

    ``overlay(cfg, tacotron={'batch_size': 8})`` mirrors the reference's
    hparams.parse string-override mechanism (reference: preprocess.py:47-48)
    with explicit structure instead of string parsing.
    """
    current = to_dict(base)
    for group, upd in groups.items():
        if group not in current:
            raise KeyError(f"unknown config group: {group}")
        current[group].update(upd)
    return from_dict(current)


def split_overrides(spec: str) -> List[str]:
    """Split a ``--hparams`` string on commas that are NOT inside brackets,
    so list values survive: ``"wavenet.dilations=[1,2,4],tacotron.adam_beta1=0.9"``
    -> ``["wavenet.dilations=[1,2,4]", "tacotron.adam_beta1=0.9"]``."""
    parts, buf, depth = [], [], 0
    for ch in spec:
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth = max(0, depth - 1)
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def overlay_from_strings(base: Config, assignments) -> Config:
    """Apply ``group.key=value`` string overrides (the CLI's --hparams flag,
    mirroring the reference's hparams.parse, e.g. train.py --hparams
    semantics): values are JSON-parsed (so ``True``/``0.5``/``[1,2]`` work,
    with Python-style True/False/None accepted), falling back to raw
    strings.  Unknown groups or keys raise."""
    groups: Dict[str, Dict[str, Any]] = {}
    for item in assignments:
        if "=" not in item or "." not in item.split("=", 1)[0]:
            raise ValueError(
                f"bad --hparams entry {item!r}; want group.key=value")
        key, raw = item.split("=", 1)
        group, field = key.split(".", 1)
        py_lits = {"True": True, "False": False, "None": None}
        if raw in py_lits:
            val = py_lits[raw]
        else:
            try:
                val = json.loads(raw)
            except ValueError:
                val = raw
        groups.setdefault(group, {})[field] = val
    current = to_dict(base)
    for group, upd in groups.items():
        if group not in current:
            raise KeyError(f"unknown config group: {group}")
        for field in upd:
            if field not in current[group]:
                raise KeyError(f"unknown field {group}.{field}")
    return overlay(base, **groups)


def debug_string(cfg: Config) -> str:
    """Sorted key dump (reference: hparams.py:194-197)."""
    lines = []
    for group, values in sorted(to_dict(cfg).items()):
        for k, v in sorted(values.items()):
            lines.append(f"  {group}.{k}: {v}")
    return "Hyperparameters:\n" + "\n".join(lines)
