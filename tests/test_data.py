"""Data pipeline tests: preprocessing on the bundled moon corpus + batchers."""
import json
import os
import shutil

import numpy as np
import pytest

from tacotron_wavenet_vocoder_korean_tpu.config import (
    Config, TacotronConfig, WaveNetConfig, overlay)
from tacotron_wavenet_vocoder_korean_tpu import data as D

MOON_DIR = "/root/reference/datasets/moon"
HAVE_MOON = os.path.exists(os.path.join(MOON_DIR, "moon-recognition-All.json"))


@pytest.fixture(scope="module")
def moon_subset(tmp_path_factory):
    """Preprocess a 12-utterance subset of the bundled moon corpus."""
    if not HAVE_MOON:
        pytest.skip("bundled moon corpus not present")
    root = tmp_path_factory.mktemp("moon")
    in_dir = root / "in"
    (in_dir / "audio").mkdir(parents=True)
    with open(os.path.join(MOON_DIR, "moon-recognition-All.json"),
              encoding="utf-8") as f:
        full = json.load(f)
    subset = dict(list(full.items())[:12])
    for key in subset:
        name = key.strip().split("/")[-1]
        shutil.copy(os.path.join(MOON_DIR, "audio", name),
                    in_dir / "audio" / name)
    with open(in_dir / "moon-recognition-All.json", "w", encoding="utf-8") as f:
        json.dump(subset, f, ensure_ascii=False)

    out_dir = root / "data"
    cfg = Config()
    examples = D.preprocess_corpus(cfg, "moon", str(in_dir), str(out_dir),
                                   num_workers=1)
    return cfg, str(out_dir), examples


def test_preprocess_invariants(moon_subset):
    cfg, out_dir, examples = moon_subset
    assert len(examples) >= 8  # a few may be dropped by trim/length rules
    assert os.path.exists(os.path.join(out_dir, "train.txt"))
    for fname in os.listdir(out_dir):
        if not fname.endswith(".npz"):
            continue
        with np.load(os.path.join(out_dir, fname)) as d:
            for key in ("audio", "mel", "linear", "time_steps", "mel_frames",
                        "text", "tokens", "loss_coeff"):
                assert key in d, f"{key} missing from {fname}"
            hop = cfg.audio.hop_size
            # the core upsampling invariant (reference datasets/moon.py:140-146)
            assert len(d["audio"]) == int(d["mel_frames"]) * hop
            assert d["mel"].shape == (int(d["mel_frames"]), cfg.audio.num_mels)
            assert d["linear"].shape[1] == cfg.audio.num_freq
            assert d["tokens"][-1] == 1  # EOS


def test_ljspeech_builder(tmp_path):
    """LJSpeech layout (metadata.csv + wavs/) with english_cleaners."""
    if not HAVE_MOON:
        pytest.skip("bundled corpus not present (wav fixtures)")
    in_dir = tmp_path / "LJSpeech-1.1"
    (in_dir / "wavs").mkdir(parents=True)
    src = sorted(os.listdir(os.path.join(MOON_DIR, "audio")))[:2]
    rows = []
    for i, name in enumerate(src):
        wav_id = f"LJ001-{i:04d}"
        shutil.copy(os.path.join(MOON_DIR, "audio", name),
                    in_dir / "wavs" / f"{wav_id}.wav")
        rows.append(f"{wav_id}|Printing number {i}|"
                    f"Printing, in the only sense number {i}.")
    with open(in_dir / "metadata.csv", "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")

    cfg = overlay(Config(), tacotron={"cleaners": "english_cleaners"})
    out_dir = tmp_path / "data"
    examples = D.preprocess_corpus(cfg, "ljspeech", str(in_dir), str(out_dir),
                                   num_workers=1)
    assert len(examples) == 2
    with np.load(os.path.join(str(out_dir), "LJ001-0000.npz")) as d:
        assert "number" in str(d["text"])
        assert d["tokens"][-1] == 1  # EOS in the English symbol table
        assert len(d["audio"]) == int(d["mel_frames"]) * cfg.audio.hop_size


def test_cmu_arctic_builder(tmp_path):
    """CMU ARCTIC layout (etc/txt.done.data + wav/) with english_cleaners."""
    if not HAVE_MOON:
        pytest.skip("bundled corpus not present (wav fixtures)")
    in_dir = tmp_path / "cmu_us_slt_arctic"
    (in_dir / "wav").mkdir(parents=True)
    (in_dir / "etc").mkdir()
    src = sorted(os.listdir(os.path.join(MOON_DIR, "audio")))[:2]
    rows = []
    for i, name in enumerate(src):
        wav_id = f"arctic_a{i:04d}"
        shutil.copy(os.path.join(MOON_DIR, "audio", name),
                    in_dir / "wav" / f"{wav_id}.wav")
        rows.append(f'( {wav_id} "Author of the danger trail number {i}." )')
    # a malformed row the parser must skip
    rows.append(";; festival comment line")
    with open(in_dir / "etc" / "txt.done.data", "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")

    cfg = overlay(Config(), tacotron={"cleaners": "english_cleaners"})
    out_dir = tmp_path / "data"
    examples = D.preprocess_corpus(cfg, "cmu_arctic", str(in_dir),
                                   str(out_dir), num_workers=1)
    assert len(examples) == 2
    with np.load(os.path.join(str(out_dir), "arctic_a0000.npz")) as d:
        assert "danger trail" in str(d["text"])
        assert d["tokens"][-1] == 1  # EOS in the English symbol table
        assert len(d["audio"]) == int(d["mel_frames"]) * cfg.audio.hop_size


def test_tacotron_batcher(moon_subset):
    cfg, out_dir, _ = moon_subset
    # relax length filters: bundled clips are short
    cfg2 = overlay(cfg, tacotron={
        "min_iters": 1, "min_tokens": 5, "batch_size": 2})
    b = D.TacotronBatcher([out_dir], cfg2, "train", batch_size=2,
                          batches_per_group=2)
    it = iter(b)
    batch = next(it)
    r = cfg2.tacotron.reduction_factor
    assert batch.inputs.shape[0] == 2
    assert batch.mel_targets.shape[2] == cfg2.audio.num_mels
    assert batch.linear_targets.shape[2] == cfg2.audio.num_freq
    assert batch.mel_targets.shape[1] % r == 0
    assert batch.inputs.shape[1] % 16 == 0  # token bucket
    assert batch.input_lengths.max() <= batch.inputs.shape[1]
    # PAD rows after length are zero
    i = int(np.argmin(batch.input_lengths))
    assert np.all(batch.inputs[i, batch.input_lengths[i]:] == 0)

    # shape bucketing: a handful of distinct shapes across many batches
    shapes = {next(it).mel_targets.shape for _ in range(6)}
    assert len(shapes) <= 4


def test_tacotron_batcher_test_mode(moon_subset):
    cfg, out_dir, _ = moon_subset
    cfg2 = overlay(cfg, tacotron={"min_iters": 1, "min_tokens": 5})
    b = D.TacotronBatcher([out_dir], cfg2, "test", batch_size=2)
    it = iter(b)
    b1, b2 = next(it), next(it)
    assert np.array_equal(b1.inputs, b2.inputs)  # static test batches


@pytest.mark.slow
def test_wavenet_batcher_heldout_split(moon_subset):
    """train/test streams are disjoint and deterministic: the last
    num_test_per_speaker clips (sorted) are held out for eval — the eval
    stream the reference's WaveNet feeder lacks."""
    cfg, out_dir, _ = moon_subset
    cfg2 = overlay(cfg, wavenet={
        "sample_size": 9000, "dilations": [1, 2, 4, 8, 16, 32, 64, 128] * 2,
        "initial_filter_width": 32})
    tr = D.WaveNetBatcher([out_dir], cfg2, batch_size=2)
    te = D.WaveNetBatcher([out_dir], cfg2, batch_size=2, data_type="test")
    tr_paths = set(tr.path_dict[out_dir])
    te_paths = set(te.path_dict[out_dir])
    assert len(te_paths) == cfg2.train.num_test_per_speaker
    assert not (tr_paths & te_paths)
    # eval step consumes a held-out batch
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask, wavenet_batch_to_dict)
    import jax
    small = overlay(cfg2, wavenet={
        "sample_size": 3000, "dilations": [1, 2, 4, 8] * 2,
        "residual_channels": 4, "dilation_channels": 4, "skip_channels": 8,
        "initial_filter_width": 8})
    te2 = D.WaveNetBatcher([out_dir], small, batch_size=2, data_type="test")
    task = WaveNetTask(small)
    batch = next(iter(te2))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    out = task.jit_eval_step()(state, wavenet_batch_to_dict(batch))
    assert np.isfinite(float(out["loss"]))


def test_wavenet_batcher_splits_at_exactly_2x_heldout(moon_subset):
    """Boundary regression: with usable clips == 2*n_test the split must
    still happen (the old `>= 2*n_test + 1` silently served training clips
    as the test stream); below 2x a warning must fire."""
    cfg, out_dir, _ = moon_subset
    wn = {"sample_size": 9000, "dilations": [1, 2, 4, 8, 16, 32, 64, 128] * 2,
          "initial_filter_width": 32}
    probe = D.WaveNetBatcher([out_dir], overlay(cfg, wavenet=wn),
                             batch_size=2)
    usable = len(probe.path_dict[out_dir]) + cfg.train.num_test_per_speaker
    n_test = usable // 2
    cfg2 = overlay(cfg, wavenet=wn,
                   train={"num_test_per_speaker": n_test})
    tr = D.WaveNetBatcher([out_dir], cfg2, batch_size=2)
    te = D.WaveNetBatcher([out_dir], cfg2, batch_size=2, data_type="test")
    assert len(te.path_dict[out_dir]) == n_test
    assert not (set(tr.path_dict[out_dir]) & set(te.path_dict[out_dir]))
    # below the 2x threshold: no split, loud warning
    import warnings as _w
    cfg3 = overlay(cfg, wavenet=wn,
                   train={"num_test_per_speaker": usable})
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        te3 = D.WaveNetBatcher([out_dir], cfg3, batch_size=2,
                               data_type="test")
    assert len(te3.path_dict[out_dir]) == usable  # served everything
    assert any("test stream serves" in str(r.message) for r in rec)


def test_wavenet_batcher_rejects_input_type_mismatch(moon_subset):
    """A float corpus (raw/mulaw preprocess) must not silently train a
    mulaw-quantize model: the batcher fails fast on the stored audio dtype
    (corpus.py compands at preprocess time — reference keeps companding in
    the graph, wavenet/model.py:253, so it can't have this mismatch)."""
    cfg, out_dir, _ = moon_subset
    quant = overlay(cfg, wavenet={
        "input_type": "mulaw-quantize", "quantize_channels": 256,
        "scalar_input": False, "out_channels": 256, "sample_size": 9000})
    with pytest.raises(ValueError, match="input_type"):
        D.WaveNetBatcher([out_dir], quant, batch_size=2)
    # the matching float config still loads
    ok = overlay(cfg, wavenet={"sample_size": 9000})
    D.WaveNetBatcher([out_dir], ok, batch_size=2)


def test_wavenet_batcher(moon_subset):
    cfg, out_dir, _ = moon_subset
    # bundled clips are ~2s; shrink sample_size so crops fit
    cfg2 = overlay(cfg, wavenet={
        "sample_size": 9000, "dilations": [1, 2, 4, 8, 16, 32, 64, 128] * 2,
        "initial_filter_width": 32})
    b = D.WaveNetBatcher([out_dir], cfg2, batch_size=2, gc_enable=True)
    batch = next(iter(b))
    assert batch.input_wav.shape == (2, 9000, 1)
    assert batch.local_condition.shape == (2, 9000 // cfg2.audio.hop_size,
                                           cfg2.audio.num_mels)
    assert batch.speaker_id.shape == (2,)
    assert np.all(batch.speaker_id == 0)


def test_device_prefetcher(moon_subset):
    cfg, out_dir, _ = moon_subset
    cfg2 = overlay(cfg, tacotron={"min_iters": 1, "min_tokens": 5})
    b = D.TacotronBatcher([out_dir], cfg2, "train", batch_size=2,
                          batches_per_group=2)
    import jax.numpy as jnp
    pf = D.DevicePrefetcher(
        b, put_fn=lambda x: jnp.asarray(x.inputs))
    out = next(iter(pf))
    assert out.shape[0] == 2
    pf.stop()


def test_round_up():
    assert D.round_up(7, 5) == 10
    assert D.round_up(10, 5) == 10


def test_device_prefetcher_propagates_errors():
    """Feeder-thread exceptions must surface in the consumer
    (reference coord.request_stop semantics, datafeeder_tacotron.py:185-191)."""
    def bad_batcher():
        yield 1
        raise RuntimeError("disk on fire")

    pf = D.DevicePrefetcher(bad_batcher(), put_fn=lambda x: x)
    it = iter(pf)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="disk on fire"):
        next(it)


def test_batcher_skips_corrupt_npz(moon_subset, tmp_path):
    """A truncated npz must be dropped, not crash the epoch (reference
    deletes corrupt files, datafeeder_tacotron.py:242-249)."""
    import shutil as sh
    cfg, out_dir, _ = moon_subset
    work = tmp_path / "data"
    sh.copytree(out_dir, work)
    # corrupt one file
    victims = [f for f in os.listdir(work) if f.endswith(".npz")]
    with open(work / victims[0], "wb") as f:
        f.write(b"not an npz")
    cfg2 = overlay(cfg, tacotron={"min_iters": 1, "min_tokens": 5})
    b = D.TacotronBatcher([str(work)], cfg2, "train", batch_size=2,
                          batches_per_group=2, apply_filter=False)
    batch = next(iter(b))
    assert batch.inputs.shape[0] == 2


def test_device_store_batches_match_host_path(moon_subset):
    """device_store=True yields the same batch stream as the host path
    (same seed): identical selection/bucketing, targets equal up to the f16
    storage quantization."""
    cfg, out_dir, _ = moon_subset
    cfg2 = overlay(cfg, tacotron={
        "min_iters": 1, "min_tokens": 5, "batch_size": 2})
    host = D.TacotronBatcher([out_dir], cfg2, "train", batch_size=2,
                             batches_per_group=2, seed=7)
    dev = D.TacotronBatcher([out_dir], cfg2, "train", batch_size=2,
                            batches_per_group=2, seed=7, device_store=True)
    assert dev.store_bytes > 0
    hit, dit = iter(host), iter(dev)
    for _ in range(5):
        hb = next(hit)
        db = next(dit)                      # dict of device arrays
        assert np.array_equal(np.asarray(db["inputs"]), hb.inputs)
        assert np.array_equal(np.asarray(db["input_lengths"]),
                              hb.input_lengths)
        assert np.array_equal(np.asarray(db["speaker_id"]), hb.speaker_id)
        assert db["mel_targets"].shape == hb.mel_targets.shape
        assert db["linear_targets"].shape == hb.linear_targets.shape
        # f16 storage: equal to host f32 within half-precision quantization
        np.testing.assert_allclose(
            np.asarray(db["linear_targets"], np.float32), hb.linear_targets,
            atol=4e-3, rtol=2e-3)
        np.testing.assert_allclose(
            np.asarray(db["mel_targets"], np.float32), hb.mel_targets,
            atol=4e-3, rtol=2e-3)


@pytest.mark.slow
def test_device_store_train_step(moon_subset):
    """A jitted train step consumes device-store batches directly."""
    import jax
    from tacotron_wavenet_vocoder_korean_tpu.train.tacotron_task import (
        TacotronTask)
    cfg, out_dir, _ = moon_subset
    cfg2 = overlay(cfg, tacotron={
        "min_iters": 1, "min_tokens": 5, "batch_size": 2,
        "enc_bank_size": 2, "enc_bank_channel_size": 16, "enc_rnn_size": 16,
        "enc_prenet_sizes": (16,), "enc_proj_sizes": (16, 16),
        "attention_size": 16, "attention_state_size": 16,
        "dec_rnn_size": 16, "dec_prenet_sizes": (16,),
        "post_bank_size": 2, "post_bank_channel_size": 16,
        "post_rnn_size": 16, "post_proj_sizes": (16, 80),
        "embedding_size": 16, "initial_phase_step": 0})
    dev = D.TacotronBatcher([out_dir], cfg2, "train", batch_size=2,
                            batches_per_group=2, seed=7, device_store=True)
    task = TacotronTask(cfg2, is_randomly_initialized=True)
    it = iter(dev)
    batch = next(it)
    rng = jax.random.PRNGKey(0)

    class _B:  # init_state expects attribute access
        inputs = np.asarray(batch["inputs"])
        input_lengths = np.asarray(batch["input_lengths"])
        loss_coeff = np.asarray(batch["loss_coeff"])
        mel_targets = np.asarray(batch["mel_targets"], np.float32)
        linear_targets = np.asarray(batch["linear_targets"], np.float32)
        speaker_id = np.asarray(batch["speaker_id"])

    state = task.init_state(rng, _B)
    step = task.jit_train_step()
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_device_store_mesh_train_step(moon_subset):
    """Mesh-sharded corpus store: the example dim is sharded over the data
    axis, the batch gather yields batch-sharded dicts, and the SHARDED train
    step consumes them directly (no host-transfer fallback under --use_mesh).
    Stream content equals the unsharded store's."""
    import jax
    from tacotron_wavenet_vocoder_korean_tpu.parallel import make_mesh
    from tacotron_wavenet_vocoder_korean_tpu.train.tacotron_task import (
        TacotronTask)
    cfg, out_dir, _ = moon_subset
    cfg2 = overlay(cfg, tacotron={
        "min_iters": 1, "min_tokens": 5, "batch_size": 8,
        "enc_bank_size": 2, "enc_bank_channel_size": 16, "enc_rnn_size": 16,
        "enc_prenet_sizes": (16,), "enc_proj_sizes": (16, 16),
        "attention_size": 16, "attention_state_size": 16,
        "dec_rnn_size": 16, "dec_prenet_sizes": (16,),
        "post_bank_size": 2, "post_bank_channel_size": 16,
        "post_rnn_size": 16, "post_proj_sizes": (16, 80),
        "embedding_size": 16, "initial_phase_step": 0})
    mesh = make_mesh()
    assert mesh.devices.size == 8
    plain = D.TacotronBatcher([out_dir], cfg2, "train", batch_size=8,
                              batches_per_group=2, seed=7,
                              device_store=True)
    dev = D.TacotronBatcher([out_dir], cfg2, "train", batch_size=8,
                            batches_per_group=2, seed=7, device_store=True,
                            mesh=mesh)
    pit, dit = iter(plain), iter(dev)
    pb, db = next(pit), next(dit)
    for k in pb:
        np.testing.assert_array_equal(np.asarray(pb[k]), np.asarray(db[k]))
    assert "data" in str(db["mel_targets"].sharding)

    task = TacotronTask(cfg2, is_randomly_initialized=True)
    rng = jax.random.PRNGKey(0)

    class _B:
        inputs = np.asarray(db["inputs"])
        input_lengths = np.asarray(db["input_lengths"])
        loss_coeff = np.asarray(db["loss_coeff"])
        mel_targets = np.asarray(db["mel_targets"], np.float32)
        linear_targets = np.asarray(db["linear_targets"], np.float32)
        speaker_id = np.asarray(db["speaker_id"])

    state = task.init_state(rng, _B)
    step = task.jit_train_step(mesh)
    state, metrics = step(state, db, rng)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_wavenet_device_store_mesh_train_step(moon_subset):
    """WaveNet mesh-sharded clip store feeds the sharded train step."""
    import jax
    from tacotron_wavenet_vocoder_korean_tpu.parallel import make_mesh
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask)
    cfg, out_dir, _ = moon_subset
    cfg2 = overlay(cfg, wavenet={
        "sample_size": 3000, "dilations": [1, 2, 4, 8] * 2,
        "residual_channels": 4, "dilation_channels": 4, "skip_channels": 8,
        "initial_filter_width": 8, "batch_size": 8})
    mesh = make_mesh()
    plain = D.WaveNetBatcher([out_dir], cfg2, batch_size=8, seed=11,
                             device_store=True)
    dev = D.WaveNetBatcher([out_dir], cfg2, batch_size=8, seed=11,
                           device_store=True, mesh=mesh)
    pb, db = next(iter(plain)), next(iter(dev))
    for k in pb:
        np.testing.assert_array_equal(np.asarray(pb[k]), np.asarray(db[k]))

    task = WaveNetTask(cfg2)
    state = task.init_state(jax.random.PRNGKey(0), db)
    step = task.jit_train_step(mesh)
    state, metrics = step(state, db)
    assert np.isfinite(float(metrics["loss"]))


def test_wavenet_device_store_matches_host_path(moon_subset):
    """WaveNetBatcher(device_store=True) picks the same clips/crops as the
    host path (same seed); audio crops are bit-exact, mel within f16."""
    cfg, out_dir, _ = moon_subset
    cfg2 = overlay(cfg, wavenet={
        "sample_size": 9000, "dilations": [1, 2, 4, 8, 16, 32, 64, 128] * 2,
        "initial_filter_width": 32})
    host = D.WaveNetBatcher([out_dir], cfg2, batch_size=2, gc_enable=True,
                            seed=11)
    dev = D.WaveNetBatcher([out_dir], cfg2, batch_size=2, gc_enable=True,
                           seed=11, device_store=True)
    assert dev.store_bytes > 0
    hit, dit = iter(host), iter(dev)
    for _ in range(4):
        hb = next(hit)
        db = next(dit)
        np.testing.assert_array_equal(np.asarray(db["input_wav"]),
                                      hb.input_wav)
        np.testing.assert_array_equal(np.asarray(db["speaker_id"]),
                                      hb.speaker_id)
        np.testing.assert_allclose(np.asarray(db["local_condition"]),
                                   hb.local_condition, atol=4e-3, rtol=2e-3)


def test_wavenet_device_store_train_step(moon_subset):
    """A jitted WaveNet train step consumes device-store batches directly."""
    import jax
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask)
    cfg, out_dir, _ = moon_subset
    cfg2 = overlay(cfg, wavenet={
        "sample_size": 3000, "dilations": [1, 2, 4, 8] * 2,
        "residual_channels": 4, "dilation_channels": 4, "skip_channels": 8,
        "initial_filter_width": 8})
    dev = D.WaveNetBatcher([out_dir], cfg2, batch_size=2, seed=11,
                           device_store=True)
    task = WaveNetTask(cfg2)
    batch = next(iter(dev))
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, batch)
    step = task.jit_train_step()
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
