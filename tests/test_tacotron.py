"""Tacotron model tests: shapes, attention types, speaker modes, training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron_wavenet_vocoder_korean_tpu.config import (
    Config, TacotronConfig, AudioConfig)
from tacotron_wavenet_vocoder_korean_tpu.models.tacotron import (
    Tacotron, tacotron_loss, learning_rate_schedule, scheduled_sampling_prob)
from tacotron_wavenet_vocoder_korean_tpu.models import attention as A
from tacotron_wavenet_vocoder_korean_tpu.train.tacotron_task import (
    TacotronTask, batch_to_dict)
from tacotron_wavenet_vocoder_korean_tpu.data.loader import TacotronBatch
from tacotron_wavenet_vocoder_korean_tpu.parallel import make_mesh, shard_batch


def tiny_cfg(**kw):
    base = dict(
        enc_bank_size=4, enc_bank_channel_size=32, enc_rnn_size=32,
        enc_prenet_sizes=(64, 32), enc_proj_sizes=(32, 32),
        attention_size=32, attention_state_size=32,
        dec_rnn_size=32, dec_prenet_sizes=(64, 32),
        post_bank_size=2, post_bank_channel_size=32, post_rnn_size=32,
        post_proj_sizes=(64, 80), embedding_size=32, max_iters=6)
    base.update(kw)
    return TacotronConfig(**base)


AUDIO = AudioConfig()
RNG = jax.random.PRNGKey(0)


def make_batch(B=2, T_in=16, T_out=20):
    rng = np.random.RandomState(0)
    return {
        "inputs": jnp.asarray(
            rng.randint(2, 70, size=(B, T_in)), jnp.int32),
        "input_lengths": jnp.asarray([T_in, T_in - 5], jnp.int32),
        "loss_coeff": jnp.ones(B, jnp.float32),
        "mel_targets": jnp.asarray(
            rng.randn(B, T_out, 80) * 0.1, jnp.float32),
        "linear_targets": jnp.asarray(
            rng.randn(B, T_out, 1025) * 0.1, jnp.float32),
        "speaker_id": jnp.zeros(B, jnp.int32),
    }


def _forward(cfg, batch, **kw):
    model = Tacotron(cfg=cfg, audio=AUDIO)
    variables = model.init({"params": RNG, "dropout": RNG},
                           batch["inputs"], batch["input_lengths"],
                           speaker_id=batch["speaker_id"],
                           mel_targets=batch["mel_targets"], train=True)
    out, _ = model.apply(variables, batch["inputs"], batch["input_lengths"],
                         speaker_id=batch["speaker_id"],
                         mel_targets=batch["mel_targets"], train=True,
                         rngs={"dropout": RNG}, mutable=["batch_stats"], **kw)
    return out


@pytest.mark.parametrize("attention_type", [
    "bah", "bah_norm", "bah_mon", "bah_mon_norm", "bah_mon_norm_hccho",
    "loc_sen", "gmm", "luong", "luong_scaled"])
def test_attention_types_forward(attention_type):
    cfg = tiny_cfg(attention_type=attention_type)
    batch = make_batch()
    out = _forward(cfg, batch)
    assert out["mel_outputs"].shape == (2, 20, 80)
    assert out["linear_outputs"].shape == (2, 20, 1025)
    assert out["alignments"].shape == (2, 16, 4)
    assert np.isfinite(np.asarray(out["mel_outputs"])).all()
    # padded encoder positions get (near-)zero attention for masked mechanisms
    a = np.asarray(out["alignments"])
    assert a[1, 11:, :].max() < 1e-3  # length 11 for 2nd example


def test_monotonic_attention_is_monotonic():
    """Expected attention centroid must move monotonically forward."""
    cfg = tiny_cfg(attention_type="bah_mon_norm")
    batch = make_batch(T_out=30)
    out = _forward(cfg, batch)
    a = np.asarray(out["alignments"])[0]          # [T_in, T_dec]
    centroid = (a * np.arange(a.shape[0])[:, None]).sum(0) / (a.sum(0) + 1e-9)
    assert np.all(np.diff(centroid) > -0.5)       # allows jitter, no jumps back


@pytest.mark.slow
def test_multispeaker_modes():
    for model_type in ("deepvoice", "simple"):
        cfg = tiny_cfg(model_type=model_type, num_speakers=2)
        batch = make_batch()
        batch["speaker_id"] = jnp.asarray([0, 1], jnp.int32)
        out = _forward(cfg, batch)
        assert out["mel_outputs"].shape == (2, 20, 80)
        # different speakers produce different outputs for identical text
        batch2 = dict(batch, speaker_id=jnp.asarray([0, 0], jnp.int32),
                      inputs=jnp.tile(batch["inputs"][:1], (2, 1)),
                      input_lengths=jnp.tile(batch["input_lengths"][:1], 2))
        out2 = _forward(cfg, batch2)
        assert out2["mel_outputs"].shape == (2, 20, 80)


def test_manual_attention_injection():
    cfg = tiny_cfg()
    batch = make_batch()
    T_dec = 4
    manual = np.zeros((2, T_dec, 16), np.float32)
    manual[:, :, 3] = 1.0  # force all attention onto position 3
    model = Tacotron(cfg=cfg, audio=AUDIO)
    variables = model.init({"params": RNG, "dropout": RNG},
                           batch["inputs"], batch["input_lengths"],
                           speaker_id=batch["speaker_id"],
                           mel_targets=batch["mel_targets"], train=True)
    out, _ = model.apply(variables, batch["inputs"], batch["input_lengths"],
                         speaker_id=batch["speaker_id"],
                         mel_targets=batch["mel_targets"],
                         manual_alignments=jnp.asarray(manual),
                         is_manual_attention=jnp.asarray(True),
                         train=True, rngs={"dropout": RNG},
                         mutable=["batch_stats"])
    a = np.asarray(out["alignments"])  # [B, T_in, T_dec]
    assert np.allclose(a[:, 3, :], 1.0)
    assert np.allclose(a[:, :3, :], 0.0)


def test_zero_pad_embedding_row():
    cfg = tiny_cfg()
    batch = make_batch()
    model = Tacotron(cfg=cfg, audio=AUDIO)
    variables = model.init({"params": RNG, "dropout": RNG},
                           batch["inputs"], batch["input_lengths"],
                           speaker_id=batch["speaker_id"],
                           mel_targets=batch["mel_targets"], train=True)

    def loss(params):
        out, _ = model.apply({**variables, "params": params},
                             batch["inputs"], batch["input_lengths"],
                             speaker_id=batch["speaker_id"],
                             mel_targets=batch["mel_targets"], train=True,
                             rngs={"dropout": RNG}, mutable=["batch_stats"])
        return jnp.mean(out["mel_outputs"] ** 2)

    g = jax.grad(loss)(variables["params"])
    # PAD row is pinned to zero -> no gradient reaches it
    assert np.allclose(np.asarray(g["char_embedding"])[0], 0.0)


def test_lr_schedule():
    sched = learning_rate_schedule(TacotronConfig())
    lr_early = float(sched(0))
    lr_peak = float(sched(40000 - 1))
    lr_late = float(sched(400000))
    assert lr_early < lr_peak
    assert lr_late < lr_peak
    assert abs(float(sched(39999)) - 1e-3) < 1e-4  # peak ~ initial LR


@pytest.mark.slow
def test_train_step_reduces_loss():
    cfg = Config(tacotron=tiny_cfg(initial_phase_step=0))
    task = TacotronTask(cfg, is_randomly_initialized=True)
    raw = make_batch()
    batch = TacotronBatch(
        inputs=np.asarray(raw["inputs"]),
        input_lengths=np.asarray(raw["input_lengths"]),
        loss_coeff=np.asarray(raw["loss_coeff"]),
        mel_targets=np.asarray(raw["mel_targets"]),
        linear_targets=np.asarray(raw["linear_targets"]),
        speaker_id=np.asarray(raw["speaker_id"]))
    state = task.init_state(RNG, batch)
    step = task.jit_train_step()
    b = batch_to_dict(batch)
    first = None
    for i in range(15):
        state, metrics = step(state, b, RNG)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert int(state.step) == 15
    assert np.isfinite(float(metrics["grad_norm"]))


@pytest.mark.slow
def test_sharded_train_step():
    """Data-parallel step over the virtual 8-device CPU mesh."""
    mesh = make_mesh()
    assert mesh.devices.size == 8
    cfg = Config(tacotron=tiny_cfg())
    task = TacotronTask(cfg)
    raw = make_batch(B=8)
    raw["input_lengths"] = jnp.asarray([16, 11, 16, 16, 12, 16, 14, 16],
                                       jnp.int32)
    batch = TacotronBatch(
        inputs=np.asarray(raw["inputs"]),
        input_lengths=np.asarray(raw["input_lengths"]),
        loss_coeff=np.ones(8, np.float32),
        mel_targets=np.asarray(jnp.tile(raw["mel_targets"][:1], (8, 1, 1))),
        linear_targets=np.asarray(jnp.tile(raw["linear_targets"][:1], (8, 1, 1))),
        speaker_id=np.zeros(8, np.int32))
    state = task.init_state(RNG, batch)
    step = task.jit_train_step(mesh)
    b = shard_batch(mesh, batch_to_dict(batch))
    state, metrics = step(state, b, RNG)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics2 = step(state, b, RNG)
    assert float(metrics2["loss"]) != float(metrics["loss"])


def test_eval_step_free_decode():
    """eval_step must FREE-RUN: its decode may not consume the teacher
    frames (reference train_tacotron.py:152-158 builds the test model with
    rnn_decoder_test_mode=True), so the gap metric measures exposure bias.
    Perturbing mel_targets changes the loss but NOT the decoded outputs."""
    cfg = Config(tacotron=tiny_cfg())
    task = TacotronTask(cfg)
    raw = make_batch()
    batch = TacotronBatch(
        inputs=np.asarray(raw["inputs"]),
        input_lengths=np.asarray(raw["input_lengths"]),
        loss_coeff=np.asarray(raw["loss_coeff"]),
        mel_targets=np.asarray(raw["mel_targets"]),
        linear_targets=np.asarray(raw["linear_targets"]),
        speaker_id=np.asarray(raw["speaker_id"]))
    state = task.init_state(RNG, batch)
    ev = task.jit_eval_step()
    d = batch_to_dict(batch)
    out = ev(state, d)
    assert np.isfinite(float(out["loss"]))
    assert out["alignments"].shape == (2, 16, 4)
    # same state + inputs, different teacher frames -> identical decode
    d2 = dict(d)
    d2["mel_targets"] = d["mel_targets"] + 1.0
    out2 = ev(state, d2)
    np.testing.assert_allclose(np.asarray(out["mel_outputs"]),
                               np.asarray(out2["mel_outputs"]), atol=1e-6)
    assert float(out2["loss"]) != float(out["loss"])


def test_luong_mismatched_query_dim():
    """Luong with attention_state_size != attention_size must still work
    (query projection; TF's LuongAttention would error — tacotron.py:127-146
    only runs because the reference keeps the dims equal)."""
    cfg = tiny_cfg(attention_type="luong", attention_state_size=48)
    out = _forward(cfg, make_batch())
    assert out["mel_outputs"].shape == (2, 20, 80)
    assert np.isfinite(np.asarray(out["mel_outputs"])).all()


def test_inference_prenet_dropout_gated_on_rng():
    """Reference tacotron.py:41 keeps decoder-prenet dropout live in test
    mode.  With dec_prenet_dropout_inference=True: rng-less apply stays
    deterministic; different dropout rngs give different free-run decodes."""
    cfg = tiny_cfg()
    assert cfg.dec_prenet_dropout_inference  # reference-parity default
    batch = make_batch()
    model = Tacotron(cfg=cfg, audio=AUDIO)
    variables = model.init({"params": RNG, "dropout": RNG},
                           batch["inputs"], batch["input_lengths"],
                           speaker_id=batch["speaker_id"],
                           mel_targets=batch["mel_targets"], train=True)

    def decode(rngs):
        out = model.apply(variables, batch["inputs"], batch["input_lengths"],
                          speaker_id=batch["speaker_id"],
                          train=False, free_run=True, max_iters=4, rngs=rngs)
        return np.asarray(out["mel_outputs"])

    a = decode(None)
    b = decode(None)
    np.testing.assert_allclose(a, b, atol=0)          # rng-less: exact
    c = decode({"dropout": jax.random.PRNGKey(1)})
    d = decode({"dropout": jax.random.PRNGKey(2)})
    assert np.abs(c - d).max() > 1e-6                 # dropout is live
    e = decode({"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(c, e, atol=0)          # and seeded


def test_monotonic_parallel_math():
    """Near-degenerate case: p~1 everywhere keeps attention on the previous
    position (can't move backwards).  Exact p=1 hits TF's 1e-10 clipping
    (bug-compatible), so use 0.999."""
    p = jnp.full((1, 5), 0.999)
    prev = jax.nn.one_hot(jnp.asarray([2]), 5)
    att = A.monotonic_attention_parallel(p, prev)
    assert np.allclose(np.asarray(att), np.asarray(prev), atol=2e-3)
    # p=0 everywhere -> no attention mass anywhere
    att0 = A.monotonic_attention_parallel(jnp.zeros((1, 5)), prev)
    assert float(att0.sum()) < 1e-6


def test_location_sensitive_cumulates():
    """loc_sen state must be the cumulative sum of alignments."""
    mech = A.LocationSensitiveAttention(16)
    B, T = 2, 10
    keys = jnp.zeros((B, T, 16))
    values = jnp.ones((B, T, 8))
    mask = jnp.ones((B, T), bool)
    q = jnp.ones((B, 16))
    state = mech.init_state(B, T)
    vars_ = mech.init(RNG, q, state, keys, values, mask)
    a1, s1 = mech.apply(vars_, q, state, keys, values, mask)
    a2, s2 = mech.apply(vars_, q, s1, keys, values, mask)
    assert np.allclose(np.asarray(s2), np.asarray(a2) + np.asarray(s1),
                       atol=1e-6)


def test_gmm_kappa_monotone():
    """GMM attention kappa (window position) can only move forward."""
    mech = A.GmmAttention(num_mixtures=8)
    B, T = 2, 12
    values = jnp.ones((B, T, 4))
    mask = jnp.ones((B, T), bool)
    state = mech.init_state(B, T)
    rngk = jax.random.PRNGKey(3)
    q = jax.random.normal(rngk, (B, 16))
    vars_ = mech.init(RNG, q, state, None, values, mask)
    _, s1 = mech.apply(vars_, q, state, None, values, mask)
    _, s2 = mech.apply(vars_, q, s1, None, values, mask)
    assert np.all(np.asarray(s1) >= 0)
    assert np.all(np.asarray(s2) >= np.asarray(s1))


def test_safe_cumprod_matches_naive():
    x = jnp.asarray([[0.9, 0.5, 0.2, 0.7]])
    got = np.asarray(A.safe_cumprod_exclusive(x))
    want = np.asarray([[1.0, 0.9, 0.45, 0.09]])
    assert np.allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_synthesize_long_splits(tmp_path):
    from tests.test_e2e import tiny_config, make_batch
    from tacotron_wavenet_vocoder_korean_tpu.train import (
        TacotronTask, CheckpointManager, prepare_run_dir, batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.synth import Synthesizer

    log_dir = str(tmp_path / "run")
    cfg = tiny_config()
    prepare_run_dir(log_dir, cfg)
    task = TacotronTask(cfg)
    batch = make_batch()
    state = task.init_state(RNG, batch)
    state, _ = task.jit_train_step()(state, batch_to_dict(batch), RNG)
    mgr = CheckpointManager(log_dir)
    mgr.save(1, state)
    mgr.close()

    synth = Synthesizer().load(log_dir)
    out = synth.synthesize_long(
        "첫 문장입니다. 두번째 문장입니다! 세번째?",
        base_path=str(tmp_path / "long"), max_iters=4)
    assert out["pieces"] == 3
    assert len(out["wav"]) > 0
    import os
    assert os.path.exists(out["wav_path"])
    assert os.path.exists(out["mel_path"])


@pytest.mark.slow
def test_bfloat16_mixed_precision_close_to_f32():
    """compute_dtype='bfloat16' keeps f32 params/attention and returns f32
    outputs close to the exact f32 forward; a bf16 train step optimizes."""
    batch = make_batch()
    out32 = _forward(tiny_cfg(), batch)
    out16 = _forward(tiny_cfg(compute_dtype="bfloat16"), batch)
    assert out16["mel_outputs"].dtype == jnp.float32
    m32 = np.asarray(out32["mel_outputs"])
    m16 = np.asarray(out16["mel_outputs"])
    assert np.isfinite(m16).all()
    # same params (param_dtype f32, same rng); bf16 rounding only
    assert np.abs(m32 - m16).mean() < 0.05 * (np.abs(m32).mean() + 1e-3)

    cfg = Config(tacotron=tiny_cfg(compute_dtype="bfloat16",
                                   initial_phase_step=0))
    task = TacotronTask(cfg, is_randomly_initialized=True)
    raw = make_batch()
    tb = TacotronBatch(
        inputs=np.asarray(raw["inputs"]),
        input_lengths=np.asarray(raw["input_lengths"]),
        loss_coeff=np.asarray(raw["loss_coeff"]),
        mel_targets=np.asarray(raw["mel_targets"]),
        linear_targets=np.asarray(raw["linear_targets"]),
        speaker_id=np.asarray(raw["speaker_id"]))
    state = task.init_state(RNG, tb)
    # master params stay f32 under mixed precision
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(state.params))
    step = task.jit_train_step()
    b = batch_to_dict(tb)
    first = None
    for _ in range(10):
        state, metrics = step(state, b, RNG)
        if first is None:
            first = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first


def test_scan_unroll_is_output_identical():
    """scan_unroll is a pure XLA scheduling knob: unroll=4 must produce the
    same outputs as unroll=1 (incl. a non-divisor of max_iters)."""
    batch = make_batch()
    out1 = _forward(tiny_cfg(scan_unroll=1), batch)
    out4 = _forward(tiny_cfg(scan_unroll=4), batch)
    np.testing.assert_allclose(np.asarray(out1["mel_outputs"]),
                               np.asarray(out4["mel_outputs"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1["alignments"]),
                               np.asarray(out4["alignments"]),
                               rtol=1e-5, atol=1e-5)


def test_fused_gru_cell_matches_flax_cell():
    """FusedGRUCell == flax GRUCell after fuse_gru_params conversion."""
    from tacotron_wavenet_vocoder_korean_tpu.models.modules import (
        FusedGRUCell, fuse_gru_params)
    import flax.linen as nn
    B, D, H = 3, 7, 5
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, D), jnp.float32)
    h = jnp.asarray(rng.randn(B, H), jnp.float32)
    ref_cell = nn.GRUCell(features=H)
    params = ref_cell.init(RNG, h, x)["params"]
    h_ref, _ = ref_cell.apply({"params": params}, h, x)
    fused = FusedGRUCell(features=H)
    fparams = fuse_gru_params({"cell": params})["cell"]
    h_fused, _ = fused.apply({"params": fparams}, h, x)
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_fused),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("model_type", ["single", "deepvoice"])
def test_fused_rnn_matches_after_param_conversion(model_type):
    """fused_rnn=True computes the same Tacotron function as the flax
    GRUCell path once params are converted with fuse_gru_params — incl. the
    deepvoice speaker-derived CBHG/decoder initial states."""
    from tacotron_wavenet_vocoder_korean_tpu.models.modules import (
        fuse_gru_params)
    kw = dict(model_type=model_type)
    if model_type == "deepvoice":
        kw["num_speakers"] = 2
    batch = make_batch()
    model = Tacotron(cfg=tiny_cfg(**kw), audio=AUDIO)
    fused_model = Tacotron(cfg=tiny_cfg(fused_rnn=True, **kw), audio=AUDIO)

    variables = model.init({"params": RNG, "dropout": RNG},
                           batch["inputs"], batch["input_lengths"],
                           speaker_id=batch["speaker_id"],
                           mel_targets=batch["mel_targets"], train=True)
    v = {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}
    vf = {"params": fuse_gru_params(variables["params"]),
          "batch_stats": variables.get("batch_stats", {})}

    def run(m, vars_):
        return m.apply(vars_, batch["inputs"], batch["input_lengths"],
                       speaker_id=batch["speaker_id"],
                       mel_targets=batch["mel_targets"], train=False)

    out_ref = run(model, v)
    out_fused = run(fused_model, vf)
    np.testing.assert_allclose(np.asarray(out_ref["mel_outputs"]),
                               np.asarray(out_fused["mel_outputs"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_ref["linear_outputs"]),
                               np.asarray(out_fused["linear_outputs"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_ref["alignments"]),
                               np.asarray(out_fused["alignments"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_rnn_train_step_optimizes():
    """A train step with fused_rnn=True runs and reduces the loss."""
    cfg = Config(tacotron=tiny_cfg(fused_rnn=True, initial_phase_step=0))
    task = TacotronTask(cfg, is_randomly_initialized=True)
    raw = make_batch()
    tb = TacotronBatch(
        inputs=np.asarray(raw["inputs"]),
        input_lengths=np.asarray(raw["input_lengths"]),
        loss_coeff=np.asarray(raw["loss_coeff"]),
        mel_targets=np.asarray(raw["mel_targets"]),
        linear_targets=np.asarray(raw["linear_targets"]),
        speaker_id=np.asarray(raw["speaker_id"]))
    state = task.init_state(RNG, tb)
    step = task.jit_train_step()
    b = batch_to_dict(tb)
    losses = []
    for _ in range(10):
        state, metrics = step(state, b, RNG)
        losses.append(float(metrics["loss"]))
    # Noam warmup keeps the LR tiny at first and dropout is live, so the
    # trajectory is noisy: assert it stays finite and moves below its start.
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0]


@pytest.mark.slow
def test_synthesizer_fused_load_matches_unfused(tmp_path):
    """Synthesizer.load(fused_rnn=True) converts an unfused checkpoint on
    the fly and synthesizes the same audio as the unfused path."""
    from tests.test_e2e import tiny_config, make_batch as e2e_batch
    from tacotron_wavenet_vocoder_korean_tpu.train import (
        TacotronTask, CheckpointManager, prepare_run_dir, batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.synth import Synthesizer

    log_dir = str(tmp_path / "run")
    cfg = tiny_config()
    prepare_run_dir(log_dir, cfg)
    task = TacotronTask(cfg)
    batch = e2e_batch()
    state = task.init_state(RNG, batch)
    state, _ = task.jit_train_step()(state, batch_to_dict(batch), RNG)
    mgr = CheckpointManager(log_dir)
    mgr.save(1, state)
    mgr.close()

    ref = Synthesizer().load(log_dir)
    fused = Synthesizer().load(log_dir, fused_rnn=True)
    assert fused.cfg.tacotron.fused_rnn
    text = "안녕하세요 테스트입니다"
    out_ref = ref.synthesize([text], max_iters=4)
    out_fused = fused.synthesize([text], max_iters=4)
    np.testing.assert_allclose(np.asarray(out_ref[0]["mel"]),
                               np.asarray(out_fused[0]["mel"]),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_float16_transfer_close_to_f32():
    """transfer_dtype='float16' quantizes targets by ~1e-3 (in [-4,4]);
    the train step upcasts on device and losses stay close to exact f32."""
    cfg = Config(tacotron=tiny_cfg(initial_phase_step=0))
    task = TacotronTask(cfg, is_randomly_initialized=True)
    raw = make_batch()
    tb = TacotronBatch(
        inputs=np.asarray(raw["inputs"]),
        input_lengths=np.asarray(raw["input_lengths"]),
        loss_coeff=np.asarray(raw["loss_coeff"]),
        mel_targets=np.asarray(raw["mel_targets"]),
        linear_targets=np.asarray(raw["linear_targets"]),
        speaker_id=np.asarray(raw["speaker_id"]))
    step = task.jit_train_step()
    b32 = batch_to_dict(tb)                      # exact
    b16 = batch_to_dict(tb, "float16")           # quantized transfer
    assert b16["linear_targets"].dtype == jnp.float16
    # jit_train_step donates the state: one fresh state per call
    _, m32 = step(task.init_state(RNG, tb), b32, RNG)
    _, m16 = step(task.init_state(RNG, tb), b16, RNG)
    assert abs(float(m16["loss"]) - float(m32["loss"])) < 5e-3


def test_teacher_forcing_is_causal():
    """Block t's output must not depend on block t's own target frames —
    teacher forcing feeds block t-1's LAST frame at step t (<GO> at step 0,
    reference helpers.py:36-47).  Perturbing block t's last target frame may
    only affect outputs of blocks > t."""
    cfg = tiny_cfg(dropout_prob=0.0)     # deterministic
    batch = make_batch()                 # T_out=20, r=5 -> 4 blocks
    r = cfg.reduction_factor
    model = Tacotron(cfg=cfg, audio=AUDIO)
    variables = model.init({"params": RNG, "dropout": RNG},
                           batch["inputs"], batch["input_lengths"],
                           speaker_id=batch["speaker_id"],
                           mel_targets=batch["mel_targets"], train=True)
    v = {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}

    def run(mel_t):
        out = model.apply(v, batch["inputs"], batch["input_lengths"],
                          speaker_id=batch["speaker_id"], mel_targets=mel_t,
                          train=False)
        return np.asarray(out["mel_outputs"])

    base = run(batch["mel_targets"])
    perturbed = np.asarray(batch["mel_targets"]).copy()
    t_block = 1
    perturbed[:, t_block * r + r - 1, :] += 10.0   # block 1's last frame
    got = run(jnp.asarray(perturbed))
    # blocks 0 and 1 (frames < 2r) must be unchanged
    np.testing.assert_allclose(got[:, :2 * r], base[:, :2 * r],
                               rtol=1e-5, atol=1e-5)
    # the perturbation must reach later blocks (teacher input at step 2)
    assert np.abs(got[:, 2 * r:] - base[:, 2 * r:]).max() > 1e-3


def test_scheduled_sampling_prob_ramp():
    """1.0 before ss_start_step, linear to ss_final_prob, constant after."""
    cfg = TacotronConfig(scheduled_sampling=True, ss_final_prob=0.7,
                         ss_start_step=100, ss_ramp_steps=200)
    assert float(scheduled_sampling_prob(cfg, 0)) == 1.0
    assert float(scheduled_sampling_prob(cfg, 100)) == 1.0
    mid = float(scheduled_sampling_prob(cfg, 200))
    assert abs(mid - 0.85) < 1e-6
    assert abs(float(scheduled_sampling_prob(cfg, 300)) - 0.7) < 1e-6
    assert abs(float(scheduled_sampling_prob(cfg, 10 ** 6)) - 0.7) < 1e-6


def test_scheduled_sampling_boundary_probs_match_reference_paths():
    """p=1.0 must reproduce exact teacher forcing; p=0.0 must reproduce the
    free-running decode — the scheduled-sampling mix (models/tacotron.py
    _ScanDecoderStep) degenerates to the two reference paths
    (helpers.py:36-47 teacher / helpers.py:84-88 free-run) at the
    endpoints, so checkpoints are interchangeable across the flag."""
    cfg = tiny_cfg(dropout_prob=0.0)
    batch = make_batch()
    model = Tacotron(cfg=cfg, audio=AUDIO)
    variables = model.init({"params": RNG, "dropout": RNG},
                           batch["inputs"], batch["input_lengths"],
                           speaker_id=batch["speaker_id"],
                           mel_targets=batch["mel_targets"], train=True)
    v = {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}

    def run(**kw):
        out = model.apply(v, batch["inputs"], batch["input_lengths"],
                          speaker_id=batch["speaker_id"],
                          mel_targets=batch["mel_targets"],
                          train=False, **kw)
        return np.asarray(out["mel_outputs"])

    base_tf = run()
    ss_rngs = {"ss": jax.random.PRNGKey(3)}
    got_p1 = run(teacher_force_prob=jnp.asarray(1.0), rngs=ss_rngs)
    np.testing.assert_allclose(got_p1, base_tf, atol=0)

    base_free = run(free_run=True)
    got_p0 = run(teacher_force_prob=jnp.asarray(0.0), rngs=ss_rngs)
    np.testing.assert_allclose(got_p0, base_free, atol=0)

    # intermediate p actually mixes: differs from both endpoints
    got_mid = run(teacher_force_prob=jnp.asarray(0.5), rngs=ss_rngs)
    assert np.abs(got_mid - base_tf).max() > 1e-6
    assert np.abs(got_mid - base_free).max() > 1e-6


def test_scheduled_sampling_train_step():
    """A train step with scheduled_sampling=True optimizes, reports the
    ramped teacher_force_prob, and leaves the param tree unchanged (no new
    params -> checkpoints interchangeable)."""
    cfg = Config(tacotron=tiny_cfg(
        scheduled_sampling=True, ss_final_prob=0.5,
        ss_start_step=0, ss_ramp_steps=2, initial_phase_step=0))
    task = TacotronTask(cfg, is_randomly_initialized=True)
    raw = make_batch()
    tb = TacotronBatch(
        inputs=np.asarray(raw["inputs"]),
        input_lengths=np.asarray(raw["input_lengths"]),
        loss_coeff=np.asarray(raw["loss_coeff"]),
        mel_targets=np.asarray(raw["mel_targets"]),
        linear_targets=np.asarray(raw["linear_targets"]),
        speaker_id=np.asarray(raw["speaker_id"]))
    state = task.init_state(RNG, tb)
    # same param tree as the vanilla config (no extra params)
    vanilla = TacotronTask(Config(tacotron=tiny_cfg(initial_phase_step=0)),
                           is_randomly_initialized=True)
    assert (jax.tree_util.tree_structure(vanilla.init_state(RNG, tb).params)
            == jax.tree_util.tree_structure(state.params))
    step = task.jit_train_step()
    b = batch_to_dict(tb)
    probs = []
    for _ in range(3):
        state, metrics = step(state, b, RNG)
        assert np.isfinite(float(metrics["loss"]))
        probs.append(float(metrics["teacher_force_prob"]))
    # ramp 1.0 -> 0.5 over 2 steps from step 0
    np.testing.assert_allclose(probs, [1.0, 0.75, 0.5], atol=1e-6)


def test_abstract_state_matches_init_state():
    """abstract_state (the zero-device-work resume skeleton) agrees with
    init_state on tree structure, shapes, and dtypes."""
    cfg = Config(tacotron=tiny_cfg())
    task = TacotronTask(cfg, is_randomly_initialized=True)
    batch = make_batch()
    concrete = task.init_state(RNG, batch)
    abstract = task.abstract_state(RNG, batch)
    cl, ct = jax.tree_util.tree_flatten(concrete)
    al, at = jax.tree_util.tree_flatten(abstract)
    assert ct == at
    for c, a in zip(cl, al):
        assert isinstance(a, jax.ShapeDtypeStruct)
        assert c.shape == a.shape and c.dtype == a.dtype
