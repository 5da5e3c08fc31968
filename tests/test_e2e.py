"""End-to-end CPU regression: preprocess -> train -> checkpoint ->
synthesize -> vocode, all on tiny configs."""
import os

import jax
import numpy as np
import pytest

# Every e2e test compiles full train/synthesis graphs: quick pass skips them.
pytestmark = pytest.mark.slow

from tacotron_wavenet_vocoder_korean_tpu.config import (
    Config, TacotronConfig, WaveNetConfig, AudioConfig, TrainConfig, overlay)
from tacotron_wavenet_vocoder_korean_tpu.data.loader import TacotronBatch
from tacotron_wavenet_vocoder_korean_tpu.train import (
    TacotronTask, CheckpointManager, prepare_run_dir, batch_to_dict)
from tacotron_wavenet_vocoder_korean_tpu.synth import Synthesizer

RNG = jax.random.PRNGKey(0)


def tiny_config():
    return Config(tacotron=TacotronConfig(
        enc_bank_size=2, enc_bank_channel_size=16, enc_rnn_size=16,
        enc_prenet_sizes=(32, 16), enc_proj_sizes=(16, 16),
        attention_size=16, attention_state_size=16,
        dec_rnn_size=16, dec_prenet_sizes=(32, 16),
        post_bank_size=2, post_bank_channel_size=16, post_rnn_size=16,
        post_proj_sizes=(32, 80), embedding_size=16, max_iters=8))


def make_batch(B=2, T_in=16, T_out=20):
    rng = np.random.RandomState(0)
    return TacotronBatch(
        inputs=rng.randint(2, 70, size=(B, T_in)).astype(np.int32),
        input_lengths=np.full((B,), T_in, np.int32),
        loss_coeff=np.ones((B,), np.float32),
        mel_targets=(rng.randn(B, T_out, 80) * 0.1).astype(np.float32),
        linear_targets=(rng.randn(B, T_out, 1025) * 0.1).astype(np.float32),
        speaker_id=np.zeros((B,), np.int32))


def test_train_save_synthesize(tmp_path):
    """Full inference contract: a run dir written by the trainer must be
    loadable by the Synthesizer and produce wav + mel + alignment files."""
    log_dir = str(tmp_path / "run")
    cfg = tiny_config()
    prepare_run_dir(log_dir, cfg)

    task = TacotronTask(cfg)
    batch = make_batch()
    state = task.init_state(RNG, batch)
    step_fn = task.jit_train_step()
    b = batch_to_dict(batch)
    for _ in range(2):
        state, metrics = step_fn(state, b, RNG)
    ckpt = CheckpointManager(log_dir)
    ckpt.save(int(state.step), state)
    ckpt.close()

    synth = Synthesizer().load(log_dir)
    assert synth.step == 2
    results = synth.synthesize(
        ["안녕하세요 오늘은 날씨가 좋습니다", "테스트"],
        base_path=str(tmp_path / "out"), max_iters=6)
    assert len(results) == 2
    for r in results:
        assert os.path.exists(r["wav_path"])
        assert os.path.exists(r["mel_path"])
        assert os.path.exists(r["alignment_path"])
        assert r["wav"].ndim == 1 and len(r["wav"]) > 0
        assert np.isfinite(r["wav"]).all()
        mel = np.load(r["mel_path"])
        assert mel.shape[1] == 80

    # manual-attention second pass
    results2 = synth.synthesize("안녕", manual_attention_mode=1, max_iters=6)
    assert np.isfinite(results2[0]["wav"]).all()


def test_wavenet_generator_roundtrip(tmp_path):
    """WaveNet run dir -> generator -> waveform from the synthesizer's mel."""
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask, wavenet_batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.data.loader import WaveNetBatch
    from tacotron_wavenet_vocoder_korean_tpu.synth.generator import (
        WaveNetGenerator)

    log_dir = str(tmp_path / "wn")
    cfg = overlay(Config(), wavenet={
        "dilations": [1, 2, 4, 1, 2, 4], "residual_channels": 8,
        "dilation_channels": 8, "skip_channels": 16, "out_channels": 12,
        "initial_filter_width": 8, "sample_size": 1500, "batch_size": 2})
    prepare_run_dir(log_dir, cfg)

    hop = cfg.audio.hop_size
    frames = 5
    rng = np.random.RandomState(0)
    batch = WaveNetBatch(
        input_wav=rng.uniform(-0.5, 0.5,
                              (2, frames * hop, 1)).astype(np.float32),
        local_condition=rng.randn(2, frames, 80).astype(np.float32),
        speaker_id=np.zeros((2,), np.int32))

    task = WaveNetTask(cfg)
    state = task.init_state(RNG, batch)
    step_fn = task.jit_train_step()
    state, metrics = step_fn(state, wavenet_batch_to_dict(batch))
    assert np.isfinite(float(metrics["loss"]))
    ckpt = CheckpointManager(log_dir)
    ckpt.save(int(state.step), state)
    ckpt.close()

    gen = WaveNetGenerator().load(log_dir)
    mel = rng.randn(4, 80).astype(np.float32)
    wav = gen.generate(mel)
    assert wav.shape == (4 * hop,)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0

    # Batched ragged-length vocoding (reference generate.py:120-137): three
    # mels of different lengths through ONE launch, each trimmed back.
    mels = [rng.randn(4, 80).astype(np.float32),
            rng.randn(6, 80).astype(np.float32),
            rng.randn(3, 80).astype(np.float32)]
    wavs = gen.generate(mels)
    assert [len(w) for w in wavs] == [4 * hop, 6 * hop, 3 * hop]
    assert all(np.isfinite(w).all() for w in wavs)

    # wav_seed priming end-to-end (reference generate.py:66,168-192)
    seed_wav = rng.uniform(-0.5, 0.5, 2 * hop).astype(np.float32)
    seeded = gen.generate(mel, wav_seed=seed_wav)
    assert seeded.shape == (4 * hop,)
    assert np.isfinite(seeded).all()

    # A seed LONGER than the utterance must not over-run it: only the last
    # receptive_field samples prime (reference generate.py:169 uses
    # waveform[-receptive_field:]).
    long_seed = rng.uniform(-0.5, 0.5, 10 * hop).astype(np.float32)
    seeded = gen.generate(mel, wav_seed=long_seed)
    assert seeded.shape == (4 * hop,)
    assert np.isfinite(seeded).all()


def test_tts_pipeline_batched_vocoder(tmp_path, monkeypatch):
    """Text -> Tacotron mel -> WaveNet wav through TTSPipeline (the
    reference workflow synthesizer.py -> generate.py as ONE call); all
    utterances must be vocoded in a single batched generate() launch —
    a per-utterance loop would recompile the generation kernel for every
    distinct mel length."""
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask, wavenet_batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.data.loader import WaveNetBatch
    from tacotron_wavenet_vocoder_korean_tpu.synth import TTSPipeline
    from tacotron_wavenet_vocoder_korean_tpu.synth.generator import (
        WaveNetGenerator)

    taco_dir = str(tmp_path / "taco")
    cfg = tiny_config()
    prepare_run_dir(taco_dir, cfg)
    task = TacotronTask(cfg)
    batch = make_batch()
    state = task.init_state(RNG, batch)
    state, _ = task.jit_train_step()(state, batch_to_dict(batch), RNG)
    ckpt = CheckpointManager(taco_dir)
    ckpt.save(int(state.step), state)
    ckpt.close()

    wn_dir = str(tmp_path / "wn")
    wn_cfg = overlay(Config(), wavenet={
        "dilations": [1, 2, 4, 1, 2, 4], "residual_channels": 8,
        "dilation_channels": 8, "skip_channels": 16, "out_channels": 12,
        "initial_filter_width": 8, "sample_size": 1500, "batch_size": 2})
    prepare_run_dir(wn_dir, wn_cfg)
    hop = wn_cfg.audio.hop_size
    rng = np.random.RandomState(0)
    wn_batch = WaveNetBatch(
        input_wav=rng.uniform(-0.5, 0.5, (2, 5 * hop, 1)).astype(np.float32),
        local_condition=rng.randn(2, 5, 80).astype(np.float32),
        speaker_id=np.zeros((2,), np.int32))
    wn_task = WaveNetTask(wn_cfg)
    wn_state = wn_task.init_state(RNG, wn_batch)
    wn_state, _ = wn_task.jit_train_step()(wn_state,
                                           wavenet_batch_to_dict(wn_batch))
    wn_ckpt = CheckpointManager(wn_dir)
    wn_ckpt.save(int(wn_state.step), wn_state)
    wn_ckpt.close()

    pipe = TTSPipeline().load(taco_dir, wn_dir)
    calls = []
    orig_generate = WaveNetGenerator.generate

    def counting_generate(self, mel, **kw):
        calls.append(len(mel) if isinstance(mel, (list, tuple)) else 1)
        return orig_generate(self, mel, **kw)

    monkeypatch.setattr(WaveNetGenerator, "generate", counting_generate)
    results = pipe.tts(["안녕하세요", "테스트 문장", "끝"],
                       base_path=str(tmp_path / "out"))
    assert len(results) == 3
    assert calls == [3]   # one batched launch, not one per utterance
    for r in results:
        assert os.path.exists(r["wav_path"])          # Griffin-Lim wav
        assert os.path.exists(r["wavenet_wav_path"])  # vocoded wav
        assert r["wavenet_wav"].ndim == 1 and len(r["wavenet_wav"]) > 0
        assert np.isfinite(r["wavenet_wav"]).all()
        # vocoder output spans the mel the Tacotron produced for THIS text
        assert len(r["wavenet_wav"]) == r["mel"].shape[0] * hop


def test_wavenet_generator_quantized_temperature(tmp_path):
    """Quantized (mulaw-quantize) generator: softmax sampling with
    temperature + wav_seed one-hot encoding (reference generate.py:55,216)."""
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask, wavenet_batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.data.loader import WaveNetBatch
    from tacotron_wavenet_vocoder_korean_tpu.synth.generator import (
        WaveNetGenerator)

    log_dir = str(tmp_path / "wnq")
    cfg = overlay(Config(), wavenet={
        "input_type": "mulaw-quantize", "scalar_input": False,
        "dilations": [1, 2, 4, 1, 2, 4], "residual_channels": 8,
        "dilation_channels": 8, "skip_channels": 16,
        "quantization_channels": 64, "out_channels": 64,
        "sample_size": 1500, "batch_size": 2})
    prepare_run_dir(log_dir, cfg)

    hop = cfg.audio.hop_size
    rng = np.random.RandomState(0)
    batch = WaveNetBatch(
        # quantized corpora store mu-law class ids (data/corpus.py:48-53)
        input_wav=rng.randint(0, 64, (2, 5 * hop, 1)).astype(np.float32),
        local_condition=rng.randn(2, 5, 80).astype(np.float32),
        speaker_id=np.zeros((2,), np.int32))

    task = WaveNetTask(cfg)
    state = task.init_state(RNG, batch)
    step_fn = task.jit_train_step()
    state, metrics = step_fn(state, wavenet_batch_to_dict(batch))
    assert np.isfinite(float(metrics["loss"]))
    ckpt = CheckpointManager(log_dir)
    ckpt.save(int(state.step), state)
    ckpt.close()

    gen = WaveNetGenerator().load(log_dir)
    mel = rng.randn(4, 80).astype(np.float32)
    seed_wav = rng.uniform(-0.5, 0.5, hop).astype(np.float32)
    wav = gen.generate(mel, wav_seed=seed_wav, temperature=0.7)
    assert wav.shape == (4 * hop,)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0   # decoded out of mu-law space


def _tiny_moon_corpus(tmp_path, n_clips=6):
    """Preprocess a small subset of the bundled moon corpus into
    tmp_path/data; returns the data dir (or skips if absent)."""
    import json
    import shutil

    from tacotron_wavenet_vocoder_korean_tpu import data as D

    ref = "/root/reference/datasets/moon"
    if not os.path.exists(os.path.join(ref, "moon-recognition-All.json")):
        pytest.skip("bundled moon corpus not present")
    in_dir = tmp_path / "in"
    (in_dir / "audio").mkdir(parents=True)
    with open(os.path.join(ref, "moon-recognition-All.json"),
              encoding="utf-8") as f:
        full = json.load(f)
    subset = dict(list(full.items())[:n_clips])
    for key in subset:
        name = key.strip().split("/")[-1]
        shutil.copy(os.path.join(ref, "audio", name), in_dir / "audio" / name)
    with open(in_dir / "moon-recognition-All.json", "w",
              encoding="utf-8") as f:
        json.dump(subset, f, ensure_ascii=False)
    data_dir = tmp_path / "data"
    D.preprocess_corpus(Config(), "moon", str(in_dir), str(data_dir),
                        num_workers=1)
    return data_dir


def test_best_checkpoint_retention(tmp_path):
    """train_tacotron.py with train.best_eval_batches>0 must retain the
    heldout-eval argmin checkpoint under <log_dir>/best as a loadable run
    dir (the reference instead keeps EVERY checkpoint so the best can be
    picked post-hoc — train_tacotron.py:165 max_to_keep=None; scoring fixed
    heldout batches online gets the same outcome at bounded disk)."""
    import json
    import subprocess
    import sys

    data_dir = _tiny_moon_corpus(tmp_path)
    log_dir = tmp_path / "run"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "train_tacotron.py"),
         "--platform", "cpu", "--data_paths", str(data_dir),
         "--log_dir", str(log_dir), "--num_steps", "30",
         "--batch_size", "2", "--skip_path_filter", "--hparams",
         "tacotron.enc_bank_size=2,tacotron.enc_bank_channel_size=16,"
         "tacotron.enc_rnn_size=16,tacotron.enc_prenet_sizes=[32,16],"
         "tacotron.enc_proj_sizes=[16,16],tacotron.attention_size=16,"
         "tacotron.attention_state_size=16,tacotron.dec_rnn_size=16,"
         "tacotron.dec_prenet_sizes=[32,16],tacotron.post_bank_size=2,"
         "tacotron.post_bank_channel_size=16,tacotron.post_rnn_size=16,"
         "tacotron.post_proj_sizes=[32,80],tacotron.embedding_size=16,"
         "tacotron.max_iters=8,tacotron.scheduled_sampling=True,"
         "tacotron.ss_start_step=0,tacotron.ss_ramp_steps=10,"
         "train.test_interval=10,train.sync_every=10,"
         "train.best_eval_batches=1,train.device_resident_data=False"],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=900)
    out = proc.stdout.decode(errors="replace")
    assert proc.returncode == 0, out[-3000:]
    best_dir = log_dir / "best"
    steps = [d for d in os.listdir(best_dir / "ckpt") if d.isdigit()]
    assert len(steps) == 1, f"expected exactly one best ckpt, got {steps}"
    with open(best_dir / "best.json", encoding="utf-8") as f:
        best = json.load(f)
    assert best["step"] == int(steps[0])
    assert np.isfinite(best["eval_loss"])
    assert "new best heldout eval loss" in out
    # the best dir is a loadable run dir
    synth = Synthesizer().load(str(best_dir))
    assert synth.step == int(steps[0])


def test_english_pipeline_end_to_end(tmp_path):
    """The ENGLISH path is live end-to-end: ljspeech builder ->
    english_cleaners (number expansion, ASCII symbol table, vocab 65) ->
    train_tacotron.py -> Synthesizer on an English sentence.  Proves the
    second symbol table and the ljspeech/cmu builders the reference CLI
    advertises but never shipped (reference preprocess.py:42,59,
    text/symbols.py:14-16) are not dead code, and that trainer and
    synthesizer agree on codec.vocab_size (they build the same embedding)."""
    import shutil
    import subprocess
    import sys

    from tacotron_wavenet_vocoder_korean_tpu import data as D
    from tacotron_wavenet_vocoder_korean_tpu.config import overlay as _overlay

    ref = "/root/reference/datasets/moon/audio"
    wavs = sorted(glob.glob(os.path.join(ref, "*.wav")))[:6]
    if len(wavs) < 6:
        pytest.skip("bundled moon corpus not present")
    in_dir = tmp_path / "LJSpeech-tiny"
    (in_dir / "wavs").mkdir(parents=True)
    texts = [
        "Printing, in the only sense with which we are concerned.",
        "The quick brown fox jumps over 12 lazy dogs.",
        "In 1876 the telephone was patented by Alexander Bell.",
        "Dr. Smith paid $15.50 for the second edition.",
        "It weighs 3.5 pounds and costs nothing at all.",
        "Mr. and Mrs. Jones arrived at half past 2 o'clock.",
    ]
    rows = []
    for i, (w, t) in enumerate(zip(wavs, texts)):
        wav_id = f"LJ001-{i:04d}"
        shutil.copy(w, in_dir / "wavs" / f"{wav_id}.wav")
        rows.append(f"{wav_id}|{t}|{t}")
    (in_dir / "metadata.csv").write_text("\n".join(rows), encoding="utf-8")

    cfg = _overlay(Config(), tacotron={"cleaners": "english_cleaners"})
    data_dir = tmp_path / "data"
    examples = D.preprocess_corpus(cfg, "ljspeech", str(in_dir),
                                   str(data_dir), num_workers=1)
    assert len(examples) == 6

    log_dir = tmp_path / "run"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "train_tacotron.py"),
         "--platform", "cpu", "--data_paths", str(data_dir),
         "--log_dir", str(log_dir), "--num_steps", "10",
         "--batch_size", "2", "--skip_path_filter", "--hparams",
         "tacotron.cleaners=english_cleaners,"
         "tacotron.enc_bank_size=2,tacotron.enc_bank_channel_size=16,"
         "tacotron.enc_rnn_size=16,tacotron.enc_prenet_sizes=[32,16],"
         "tacotron.enc_proj_sizes=[16,16],tacotron.attention_size=16,"
         "tacotron.attention_state_size=16,tacotron.dec_rnn_size=16,"
         "tacotron.dec_prenet_sizes=[32,16],tacotron.post_bank_size=2,"
         "tacotron.post_bank_channel_size=16,tacotron.post_rnn_size=16,"
         "tacotron.post_proj_sizes=[32,80],tacotron.embedding_size=16,"
         "tacotron.max_iters=8,train.sync_every=10,"
         "train.best_eval_batches=0,train.device_resident_data=False"],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=900)
    out = proc.stdout.decode(errors="replace")
    assert proc.returncode == 0, out[-3000:]

    synth = Synthesizer().load(str(log_dir))
    assert synth.codec.vocab_size == 65      # the English table was selected
    res = synth.synthesize(["The printing press changed the world in 1440."],
                           max_iters=6)
    assert np.isfinite(res[0]["wav"]).all()
    assert len(res[0]["wav"]) > 0


import glob


def test_stop_file_graceful_campaign_exit(tmp_path):
    """Campaign wind-down contract: `touch LOG_DIR/STOP` makes the train
    driver save a checkpoint and exit 0 (so supervise.sh stops instead of
    relaunching, and no SIGTERM lands mid-RPC — which can wedge the chip);
    a stale STOP file left by a previous stop is cleared at startup so the
    relaunch is not instantly killed."""
    import json
    import shutil
    import subprocess
    import sys
    import time

    from tacotron_wavenet_vocoder_korean_tpu import data as D

    ref = "/root/reference/datasets/moon"
    if not os.path.exists(os.path.join(ref, "moon-recognition-All.json")):
        pytest.skip("bundled moon corpus not present")
    in_dir = tmp_path / "in"
    (in_dir / "audio").mkdir(parents=True)
    with open(os.path.join(ref, "moon-recognition-All.json"),
              encoding="utf-8") as f:
        full = json.load(f)
    subset = dict(list(full.items())[:6])
    for key in subset:
        name = key.strip().split("/")[-1]
        shutil.copy(os.path.join(ref, "audio", name), in_dir / "audio" / name)
    with open(in_dir / "moon-recognition-All.json", "w",
              encoding="utf-8") as f:
        json.dump(subset, f, ensure_ascii=False)
    data_dir = tmp_path / "data"
    D.preprocess_corpus(Config(), "moon", str(in_dir), str(data_dir),
                        num_workers=1)

    log_dir = tmp_path / "run"
    log_dir.mkdir()
    (log_dir / "STOP").touch()          # stale request from a "previous" run
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "train_vocoder.py"),
         "--platform", "cpu", "--data_dir", str(data_dir),
         "--log_dir", str(log_dir), "--num_steps", "2000",
         "--batch_size", "2", "--hparams",
         "wavenet.dilations=[1,2,4,1,2,4],wavenet.residual_channels=8,"
         "wavenet.dilation_channels=8,wavenet.skip_channels=16,"
         "wavenet.out_channels=12,wavenet.initial_filter_width=8,"
         "wavenet.sample_size=1500"],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        train_log = log_dir / "train.log"
        deadline = time.time() + 300
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                raise AssertionError(
                    f"trainer exited rc={proc.returncode} before stepping "
                    f"(stale STOP not cleared?):\n{out[-2000:]}")
            if train_log.exists() and "Step " in train_log.read_text():
                break
            time.sleep(2)
        else:
            raise AssertionError("trainer never reached a train step")
        (log_dir / "STOP").touch()
        out, _ = proc.communicate(timeout=240)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out.decode(errors="replace")[-2000:]
    assert "STOP file found" in train_log.read_text()
    ckpts = os.listdir(log_dir / "ckpt")
    assert ckpts, "graceful stop must leave a checkpoint behind"

    # Resume leg: --load_path restores through the eval_shape skeleton
    # (abstract_state) — no on-device init — and keeps stepping from the
    # saved step (supervise.sh's relaunch contract).
    stepped_log_len = len(train_log.read_text())
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "train_vocoder.py"),
         "--platform", "cpu", "--data_dir", str(data_dir),
         "--log_dir", str(log_dir), "--load_path", str(log_dir),
         "--num_steps", "2000", "--batch_size", "2", "--hparams",
         "wavenet.dilations=[1,2,4,1,2,4],wavenet.residual_channels=8,"
         "wavenet.dilation_channels=8,wavenet.skip_channels=16,"
         "wavenet.out_channels=12,wavenet.initial_filter_width=8,"
         "wavenet.sample_size=1500"],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                raise AssertionError(
                    f"resumed trainer exited rc={proc.returncode} before "
                    f"stepping:\n{out[-2000:]}")
            tail = train_log.read_text()[stepped_log_len:]
            if "Resuming from step" in tail and "Step " in tail:
                break
            time.sleep(2)
        else:
            raise AssertionError("resumed trainer never reached a train step")
        (log_dir / "STOP").touch()
        out, _ = proc.communicate(timeout=240)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out.decode(errors="replace")[-2000:]
