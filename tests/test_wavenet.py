"""WaveNet tests: shapes, loss, incremental==parallel equivalence, sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron_wavenet_vocoder_korean_tpu.config import WaveNetConfig
from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import (
    WaveNet, Upsampler, wavenet_loss, incremental_generate,
    teacher_forced_incremental, init_gen_state)
from tacotron_wavenet_vocoder_korean_tpu.models import mixture as M

RNG = jax.random.PRNGKey(0)

# tiny stack: rf = 1*sum(d)+1 + (ifw-1) = (1+2+4+1+2+4)+1+7 = 22
TINY = WaveNetConfig(
    dilations=(1, 2, 4, 1, 2, 4), residual_channels=8, dilation_channels=8,
    skip_channels=16, out_channels=12, initial_filter_width=8,
    upsample_factor=(2, 5), sample_size=100, batch_size=2)
HOP = 10  # prod(upsample_factor)


def make_inputs(B=2, frames=12):
    rng = np.random.RandomState(0)
    T = frames * HOP
    audio = jnp.asarray(rng.uniform(-0.9, 0.9, (B, T, 1)), jnp.float32)
    mel = jnp.asarray(rng.randn(B, frames, 80), jnp.float32)
    return audio, mel


def test_receptive_field_tiny():
    assert TINY.receptive_field == 22


def test_upsampler_shape():
    _, mel = make_inputs()
    up = Upsampler(TINY)
    vars_ = up.init(RNG, mel)
    lc = up.apply(vars_, mel)
    assert lc.shape == (2, 12 * HOP, 80)


def test_training_forward_and_loss():
    audio, mel = make_inputs()
    model = WaveNet(TINY)
    vars_ = model.init(RNG, audio, mel)
    out = model.apply(vars_, audio, mel)
    T = audio.shape[1]
    assert out["raw_output"].shape == (2, T - TINY.receptive_field, 12)
    assert out["target"].shape == (2, T - TINY.receptive_field, 1)
    losses = wavenet_loss(TINY, out)
    assert np.isfinite(float(losses["loss"]))


@pytest.mark.slow
def test_training_gradient_flows():
    audio, mel = make_inputs()
    model = WaveNet(TINY)
    vars_ = model.init(RNG, audio, mel)

    def loss(params):
        out = model.apply({"params": params}, audio, mel)
        return wavenet_loss(TINY, out)["loss"]

    g = jax.grad(loss)(vars_["params"])
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.9


def test_incremental_equals_parallel():
    """The ring-buffer scan must reproduce the parallel training graph's
    logits exactly once the buffers are warm (the Fast WaveNet invariant the
    reference never tests, SURVEY.md §4)."""
    audio, mel = make_inputs()
    model = WaveNet(TINY)
    vars_ = model.init(RNG, audio, mel)
    params = vars_["params"]
    out = model.apply(vars_, audio, mel)
    parallel_logits = np.asarray(out["raw_output"])    # [B, T-rf, C]

    lc_full = np.asarray(out["local_condition"])       # [B, T, mels]
    x = audio[:, :-1, :]
    lc = jnp.asarray(lc_full[:, :-1, :])
    inc_logits = np.asarray(
        teacher_forced_incremental(TINY, params, x, lc))  # [B, T-1, C]

    rf = TINY.receptive_field
    # incremental step t consumed inputs [0..t]; aligns with parallel j at
    # t = rf-1+j
    inc_aligned = inc_logits[:, rf - 1:, :]
    n = parallel_logits.shape[1]
    err = np.abs(inc_aligned[:, :n] - parallel_logits).max()
    assert err < 2e-4, f"incremental/parallel mismatch: {err}"


def test_incremental_generate_shapes_and_range():
    _, mel = make_inputs(frames=6)
    model = WaveNet(TINY)
    audio, _ = make_inputs(frames=6)
    vars_ = model.init(RNG, audio, mel)
    up = Upsampler(TINY)
    lc = up.apply({"params": vars_["params"]["upsampler"]}, mel)
    samples = incremental_generate(TINY, vars_["params"], lc, RNG)
    assert samples.shape == (2, 60)
    s = np.asarray(samples)
    assert np.all(s >= -1) and np.all(s <= 1)
    assert np.isfinite(s).all()
    assert s.std() > 0  # not stuck at a constant


def test_quantized_mode():
    cfg = WaveNetConfig(
        input_type="mulaw-quantize", scalar_input=False,
        dilations=(1, 2, 4), residual_channels=8, dilation_channels=8,
        skip_channels=16, quantization_channels=64, out_channels=12,
        upsample_factor=(2, 5), sample_size=100, batch_size=2)
    audio, mel = make_inputs()
    model = WaveNet(cfg)
    vars_ = model.init(RNG, audio, mel)
    out = model.apply(vars_, audio, mel)
    T = audio.shape[1]
    assert out["raw_output"].shape[-1] == 64
    assert out["target"].shape == (2, T - cfg.receptive_field)
    losses = wavenet_loss(cfg, out)
    assert np.isfinite(float(losses["loss"]))


def test_global_conditioning_changes_output():
    cfg = WaveNetConfig(
        dilations=(1, 2), residual_channels=8, dilation_channels=8,
        skip_channels=16, out_channels=12, initial_filter_width=4,
        upsample_factor=(2, 5), sample_size=60, batch_size=2, num_speakers=3)
    audio, mel = make_inputs(frames=8)
    model = WaveNet(cfg)
    sid = jnp.asarray([0, 1], jnp.int32)
    vars_ = model.init(RNG, audio, mel, sid)
    out0 = model.apply(vars_, audio, mel, jnp.asarray([0, 0], jnp.int32))
    out1 = model.apply(vars_, audio, mel, jnp.asarray([1, 1], jnp.int32))
    assert not np.allclose(np.asarray(out0["raw_output"]),
                           np.asarray(out1["raw_output"]))


@pytest.mark.slow
def test_mixture_loss_and_sampling():
    rng = np.random.RandomState(0)
    y_hat = jnp.asarray(rng.randn(4, 50, 30), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (4, 50, 1)), jnp.float32)
    nll = M.discretized_mix_logistic_loss(y_hat, y, reduce=False)
    assert nll.shape == (4, 50)
    assert np.isfinite(np.asarray(nll)).all()

    # peaked mixture: mean 0.5, tiny scale -> samples concentrate there
    peaked = np.zeros((1, 1000, 30), np.float32)
    peaked[..., 10:20] = 0.5        # means
    peaked[..., 20:30] = -7.0       # log scales
    s = M.sample_from_discretized_mix_logistic(RNG, jnp.asarray(peaked))
    assert abs(float(s.mean()) - 0.5) < 0.01

    # edge targets hit the edge-case branches without inf/nan
    y_edge = jnp.concatenate([jnp.full((1, 5, 1), -1.0),
                              jnp.full((1, 5, 1), 1.0)], axis=1)
    nll_edge = M.discretized_mix_logistic_loss(
        jnp.asarray(peaked[:, :10]), y_edge, reduce=False)
    assert np.isfinite(np.asarray(nll_edge)).all()


def test_gen_state_shapes():
    st = init_gen_state(TINY, 3, RNG)
    assert st.causal_buf.shape == (3, 8, 1)
    assert len(st.layer_bufs) == 6
    assert st.layer_bufs[2].shape == (3, 4, 8)


@pytest.mark.slow
def test_pallas_generate_matches_scan_deterministic():
    """The persistent Pallas kernel must equal the scan sampler exactly in
    deterministic mode (argmax mixture mean, no noise)."""
    from jax.experimental.pallas import tpu as pltpu
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pallas_incremental_generate)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import Upsampler

    audio, mel = make_inputs(B=1, frames=16)  # T=160
    model = WaveNet(TINY)
    vars_ = model.init(RNG, audio, mel)
    params = vars_["params"]
    lc = Upsampler(TINY).apply({"params": params["upsampler"]}, mel)

    scan_out = np.asarray(incremental_generate(
        TINY, params, lc, RNG, deterministic=True))[0]

    with pltpu.force_tpu_interpret_mode():
        pallas_out = np.asarray(pallas_incremental_generate(
            TINY, params, lc, RNG, chunk=32, deterministic=True,
            weight_dtype=jnp.float32))[0]

    err = np.abs(pallas_out - scan_out).max()
    assert err < 1e-4, f"pallas/scan mismatch: {err}"
    assert np.std(scan_out) > 0


def test_pallas_bf16_weights_close_to_f32_scan():
    """The production generation path defaults to bfloat16 weights
    (ops/wavenet_pallas.py pallas_incremental_generate); the exactness
    tests above pin float32, so this bounds the bf16 drift over the full
    autoregressive chain against the f32 scan sampler in deterministic
    mode.  Tolerance is loose (bf16 has ~3 decimal digits) but the signal
    must stay strongly correlated with the f32 rollout."""
    from jax.experimental.pallas import tpu as pltpu
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pallas_incremental_generate)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import Upsampler

    audio, mel = make_inputs(B=1, frames=16)  # T=160
    model = WaveNet(TINY)
    params = model.init(RNG, audio, mel)["params"]
    lc = Upsampler(TINY).apply({"params": params["upsampler"]}, mel)

    scan_out = np.asarray(incremental_generate(
        TINY, params, lc, RNG, deterministic=True))[0]
    with pltpu.force_tpu_interpret_mode():
        bf16_out = np.asarray(pallas_incremental_generate(
            TINY, params, lc, RNG, chunk=32, deterministic=True,
            weight_dtype=jnp.bfloat16))[0]

    err = np.abs(bf16_out - scan_out)
    denom = np.abs(scan_out).mean() + 1e-8
    rel = err.mean() / denom
    corr = np.corrcoef(bf16_out.ravel(), scan_out.ravel())[0, 1]
    assert corr > 0.99, f"bf16 rollout decorrelated from f32: corr={corr}"
    assert rel < 0.15, f"bf16 mean drift too large: rel={rel}"


@pytest.mark.parametrize("fuse_block", [1, 4])
def test_pallas_fuse_block_variants_match_scan(fuse_block):
    """The fused residual chain must be exact for any block size: 1 (the
    unfused degenerate layout) and 4 (ragged last block for L=6)."""
    from jax.experimental.pallas import tpu as pltpu
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pallas_incremental_generate)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import Upsampler

    audio, mel = make_inputs(B=1, frames=10)
    model = WaveNet(TINY)
    vars_ = model.init(RNG, audio, mel)
    params = vars_["params"]
    lc = Upsampler(TINY).apply({"params": params["upsampler"]}, mel)

    scan_out = np.asarray(incremental_generate(
        TINY, params, lc, RNG, deterministic=True))[0]
    with pltpu.force_tpu_interpret_mode():
        pallas_out = np.asarray(pallas_incremental_generate(
            TINY, params, lc, RNG, chunk=20, deterministic=True,
            fuse_block=fuse_block, weight_dtype=jnp.float32))[0]
    err = np.abs(pallas_out - scan_out).max()
    assert err < 1e-4, f"fuse_block={fuse_block} mismatch: {err}"


def test_pallas_generate_gc_matches_scan():
    """Global (speaker) conditioning folds into the lc bias in the kernel;
    must still match the scan sampler."""
    from jax.experimental.pallas import tpu as pltpu
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pallas_incremental_generate)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import Upsampler

    cfg = WaveNetConfig(
        dilations=(1, 2, 4, 1, 2, 4), residual_channels=8,
        dilation_channels=8, skip_channels=16, out_channels=12,
        initial_filter_width=8, upsample_factor=(2, 5), sample_size=100,
        batch_size=1, num_speakers=3, gc_channels=4)
    audio, mel = make_inputs(B=1, frames=10)
    model = WaveNet(cfg)
    sid = jnp.zeros((1,), jnp.int32)
    vars_ = model.init(RNG, audio, mel, sid)
    params = vars_["params"]
    lc = Upsampler(cfg).apply({"params": params["upsampler"]}, mel)
    gc = params["gc_embedding"][jnp.asarray([1])]   # speaker 1 embedding

    scan_out = np.asarray(incremental_generate(
        cfg, params, lc, RNG, gc=gc, deterministic=True))[0]
    with pltpu.force_tpu_interpret_mode():
        pallas_out = np.asarray(pallas_incremental_generate(
            cfg, params, lc, RNG, gc=gc, chunk=20, deterministic=True,
            weight_dtype=jnp.float32))[0]
    err = np.abs(pallas_out - scan_out).max()
    assert err < 1e-4, f"gc pallas/scan mismatch: {err}"

    # and conditioning actually matters: different speaker -> different audio
    gc0 = params["gc_embedding"][jnp.asarray([0])]
    scan0 = np.asarray(incremental_generate(
        cfg, params, lc, RNG, gc=gc0, deterministic=True))[0]
    assert np.abs(scan0 - scan_out).max() > 1e-6


def test_pallas_batched_generation_matches_per_stream():
    """B=2 batched kernel == running each stream through the scan sampler."""
    from jax.experimental.pallas import tpu as pltpu
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pallas_incremental_generate)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import Upsampler

    audio, mel = make_inputs(B=2, frames=12)   # two different mels
    model = WaveNet(TINY)
    vars_ = model.init(RNG, audio[:1], mel[:1])
    params = vars_["params"]
    lc = Upsampler(TINY).apply({"params": params["upsampler"]}, mel)

    scan0 = np.asarray(incremental_generate(
        TINY, params, lc[0:1], RNG, deterministic=True))[0]
    scan1 = np.asarray(incremental_generate(
        TINY, params, lc[1:2], RNG, deterministic=True))[0]

    import jax.numpy as jnp2
    with pltpu.force_tpu_interpret_mode():
        batched = np.asarray(pallas_incremental_generate(
            TINY, params, lc, RNG, chunk=24, deterministic=True,
            weight_dtype=jnp2.float32))
    assert batched.shape == (2, 120)
    assert np.abs(batched[0] - scan0).max() < 1e-4
    assert np.abs(batched[1] - scan1).max() < 1e-4
    # the two streams genuinely differ
    assert np.abs(scan0 - scan1).max() > 1e-4


def test_pallas_primed_matches_scan_seeded():
    """In-kernel wav_seed priming (teacher-forced warm-up) must equal the
    scan sampler's seed_audio path sample-for-sample (deterministic mode).
    Reference: generate.py:66,168-192 primes the queues from a seed wav."""
    from jax.experimental.pallas import tpu as pltpu
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pallas_incremental_generate)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import Upsampler

    audio, mel = make_inputs(B=1, frames=10)   # T=100
    model = WaveNet(TINY)
    vars_ = model.init(RNG, audio, mel)
    params = vars_["params"]
    lc = Upsampler(TINY).apply({"params": params["upsampler"]}, mel)
    seed_audio = audio[:, :37, :]               # ragged vs chunk=20

    scan_out = np.asarray(incremental_generate(
        TINY, params, lc, RNG, seed_audio=seed_audio, deterministic=True))[0]
    unseeded = np.asarray(incremental_generate(
        TINY, params, lc, RNG, deterministic=True))[0]
    with pltpu.force_tpu_interpret_mode():
        pallas_out = np.asarray(pallas_incremental_generate(
            TINY, params, lc, RNG, chunk=20, deterministic=True,
            weight_dtype=jnp.float32, seed_audio=seed_audio))[0]
    err = np.abs(pallas_out - scan_out).max()
    assert err < 1e-4, f"primed pallas/scan mismatch: {err}"
    # priming genuinely changes the trajectory
    assert np.abs(scan_out - unseeded).max() > 1e-4


def _quantized_gen_cfg():
    return WaveNetConfig(
        input_type="mulaw-quantize", scalar_input=False,
        dilations=(1, 2, 4, 1, 2, 4), residual_channels=8,
        dilation_channels=8, skip_channels=16, quantization_channels=64,
        out_channels=64, upsample_factor=(2, 5), sample_size=100,
        batch_size=1)


def test_pallas_quantized_matches_scan():
    """The softmax (mulaw-quantize) kernel head must equal the scan sampler
    in deterministic mode, including the one-hot front conv and the
    'no sample yet' window init.  Reference wavenet/model.py:225-244 treats
    the quantized path as first-class."""
    from jax.experimental.pallas import tpu as pltpu
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pallas_incremental_generate)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import Upsampler

    cfg = _quantized_gen_cfg()
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(1, 10, 80), jnp.float32)
    audio_cls = rng.randint(0, 64, size=(1, 100))
    audio = jax.nn.one_hot(jnp.asarray(audio_cls), 64)
    model = WaveNet(cfg)
    vars_ = model.init(RNG, audio, mel)
    params = vars_["params"]
    lc = Upsampler(cfg).apply({"params": params["upsampler"]}, mel)

    scan_out = np.asarray(incremental_generate(
        cfg, params, lc, RNG, deterministic=True))[0]
    with pltpu.force_tpu_interpret_mode():
        pallas_out = np.asarray(pallas_incremental_generate(
            cfg, params, lc, RNG, chunk=20, deterministic=True,
            weight_dtype=jnp.float32))[0]
    assert scan_out.shape == pallas_out.shape
    match = (pallas_out == scan_out).mean()
    assert match == 1.0, f"quantized pallas/scan class match only {match:.3f}"
    assert len(np.unique(scan_out)) > 1        # not a constant class


def test_pallas_quantized_primed_and_temperature():
    """Quantized kernel: wav_seed priming matches the scan path, and the
    temperature knob reaches the in-kernel softmax (runs, finite, classes in
    range) — reference generate.py:55,216-231."""
    from jax.experimental.pallas import tpu as pltpu
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pallas_incremental_generate)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import Upsampler

    cfg = _quantized_gen_cfg()
    rng = np.random.RandomState(2)
    mel = jnp.asarray(rng.randn(1, 10, 80), jnp.float32)
    seed_cls = jnp.asarray(rng.randint(0, 64, size=(1, 33)))
    seed_oh = jax.nn.one_hot(seed_cls, 64)
    model = WaveNet(cfg)
    audio = jax.nn.one_hot(jnp.asarray(rng.randint(0, 64, (1, 100))), 64)
    vars_ = model.init(RNG, audio, mel)
    params = vars_["params"]
    lc = Upsampler(cfg).apply({"params": params["upsampler"]}, mel)

    scan_out = np.asarray(incremental_generate(
        cfg, params, lc, RNG, seed_audio=seed_oh, deterministic=True))[0]
    with pltpu.force_tpu_interpret_mode():
        pallas_out = np.asarray(pallas_incremental_generate(
            cfg, params, lc, RNG, chunk=20, deterministic=True,
            weight_dtype=jnp.float32, seed_audio=seed_oh))[0]
        assert (pallas_out == scan_out).all()
        # stochastic + temperature: verify the knob is plumbed end-to-end
        hot = np.asarray(pallas_incremental_generate(
            cfg, params, lc, jax.random.PRNGKey(7), chunk=20,
            weight_dtype=jnp.float32, temperature=2.0))[0]
    assert np.isfinite(hot).all()
    assert hot.min() >= 0 and hot.max() < 64


def test_pallas_fuse_block_mismatch_guarded():
    """pack_params(fuse_block=X) + pallas_generate(fuse_block=Y) must fail
    loudly, not silently mis-slice the packed blocks."""
    from jax.experimental.pallas import tpu as pltpu
    from tacotron_wavenet_vocoder_korean_tpu.ops.wavenet_pallas import (
        pack_params, pallas_generate, precompute_lc_proj)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import Upsampler

    audio, mel = make_inputs(B=1, frames=4)
    model = WaveNet(TINY)
    vars_ = model.init(RNG, audio, mel)
    params = vars_["params"]
    lc = Upsampler(TINY).apply({"params": params["upsampler"]}, mel)
    packed = pack_params(TINY, params, fuse_block=4)
    proj = precompute_lc_proj(packed, lc[0])
    seed = jnp.asarray([0, 0], jnp.int32)
    with pytest.raises(AssertionError, match="fuse_block"):
        with pltpu.force_tpu_interpret_mode():
            pallas_generate(TINY, packed, (proj,), seed, chunk=20,
                            deterministic=True, fuse_block=2)


@pytest.mark.slow
def test_bfloat16_mixed_precision_close_to_f32():
    """compute_dtype='bfloat16' computes the dilated stack in bf16 with f32
    params and f32 logits close to the exact forward; gradients flow."""
    import dataclasses
    audio, mel = make_inputs()
    cfg16 = dataclasses.replace(TINY, compute_dtype="bfloat16")
    model32, model16 = WaveNet(TINY), WaveNet(cfg16)
    params = model32.init(RNG, audio, mel)["params"]
    out32 = model32.apply({"params": params}, audio, mel)
    out16 = model16.apply({"params": params}, audio, mel)
    assert out16["raw_output"].dtype == jnp.float32
    r32 = np.asarray(out32["raw_output"])
    r16 = np.asarray(out16["raw_output"])
    assert np.isfinite(r16).all()
    assert np.abs(r32 - r16).mean() < 0.05 * (np.abs(r32).mean() + 1e-3)
    # loss finite + grads flow in bf16
    def loss(p):
        return wavenet_loss(cfg16, model16.apply({"params": p}, audio, mel))["loss"]
    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.9


def test_weight_norm_materializes_to_standard_model():
    """wavenet.weight_normalization trains with (v, g) pairs; folding them
    via materialize_wn_params must reproduce the EXACT standard-layout
    forward (generation consumers are WN-agnostic).  Also checks the
    analytic g init keeps the initial output scale close to the plain
    parameterization's."""
    import dataclasses
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import (
        materialize_wn_params)

    audio, mel = make_inputs()
    cfg_wn = dataclasses.replace(TINY, weight_normalization=True)
    wn_model = WaveNet(cfg_wn)
    wn_params = wn_model.init(RNG, audio, mel)["params"]
    assert any(k.endswith("_g") for k in wn_params)  # WN layout in effect

    out_wn = wn_model.apply({"params": wn_params}, audio, mel)

    flat = materialize_wn_params(cfg_wn, wn_params)
    assert not any(k.endswith("_g") or k.endswith("_v") for k in flat)
    assert "kernel" in flat["post_1"]
    std_model = WaveNet(TINY)
    out_std = std_model.apply({"params": flat}, audio, mel)
    np.testing.assert_allclose(np.asarray(out_wn["raw_output"]),
                               np.asarray(out_std["raw_output"]),
                               rtol=1e-5, atol=1e-5)

    # init-scale sanity: WN initial logits within ~3x of the plain init's
    plain_params = std_model.init(RNG, audio, mel)["params"]
    out_plain = std_model.apply({"params": plain_params}, audio, mel)
    s_wn = float(np.std(np.asarray(out_wn["raw_output"])))
    s_plain = float(np.std(np.asarray(out_plain["raw_output"]))) + 1e-9
    assert 1 / 3 < s_wn / s_plain < 3, (s_wn, s_plain)


def test_weight_norm_train_step_and_generation():
    """A WN training step runs (grads flow through v AND g) and the scan
    sampler generates from the materialized params."""
    import dataclasses
    from tacotron_wavenet_vocoder_korean_tpu.config import (
        Config, AudioConfig)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import (
        materialize_wn_params, Upsampler)
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask)

    audio, mel = make_inputs()
    cfg_wn = dataclasses.replace(TINY, weight_normalization=True)
    cfg = Config(wavenet=cfg_wn,
                 audio=AudioConfig(hop_size=HOP))
    task = WaveNetTask(cfg)

    class _B:
        input_wav = np.asarray(audio)
        local_condition = np.asarray(mel)
        speaker_id = np.zeros((2,), np.int32)

    state = task.init_state(RNG, _B)
    step = jax.jit(task.train_step)
    batch = {"input_wav": np.asarray(audio),
             "local_condition": np.asarray(mel),
             "speaker_id": np.zeros((2,), np.int32)}
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    assert np.isfinite(float(m2["loss"]))
    g_key = next(k for k in state.params if k.endswith("_g"))
    assert not np.allclose(np.asarray(s2.params[g_key]),
                           np.asarray(state.params[g_key])), \
        "g scales did not train"

    flat = materialize_wn_params(cfg_wn, s2.ema_params)
    lc = Upsampler(cfg_wn).apply(
        {"params": flat["upsampler"]}, mel[:1])
    wav = incremental_generate(cfg_wn, flat, lc, RNG, deterministic=True)
    assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.slow
def test_tensor_parallel_train_step_matches_unsharded():
    """MODEL_AXIS carries real tensor parallelism: with n_model=2 the skip
    projections are column-parallel and post_1 row-parallel
    (train/wavenet_task.py WAVENET_TP_RULES).  The sharded step must (a)
    produce the same loss as the unsharded step and (b) leave the skip/post
    weights physically sharded over the model axis after the update."""
    from tacotron_wavenet_vocoder_korean_tpu.config import Config, AudioConfig
    from tacotron_wavenet_vocoder_korean_tpu.parallel import (
        MODEL_AXIS, make_mesh, shard_batch)
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask)

    cfg = Config(wavenet=TINY, audio=AudioConfig(hop_size=HOP))
    audio, mel = make_inputs(B=4)
    batch = {"input_wav": np.asarray(audio),
             "local_condition": np.asarray(mel),
             "speaker_id": np.zeros((4,), np.int32)}

    class _B:
        input_wav = np.asarray(audio)
        local_condition = np.asarray(mel)
        speaker_id = np.zeros((4,), np.int32)

    task = WaveNetTask(cfg)
    state = task.init_state(RNG, _B)

    # unsharded single-device reference (no donation: state reused below)
    _, ref_metrics = jax.jit(task.train_step)(state, batch)
    ref_loss = float(ref_metrics["loss"])

    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape[MODEL_AXIS] == 2
    tp_state = task.shard_state(mesh, state)
    # shard_state placed the TP params before the step ran
    assert tp_state.params["layer_0_skip_kernel"].sharding.spec[-1] == \
        MODEL_AXIS
    step = task.jit_train_step(mesh)
    new_state, tp_metrics = step(tp_state, shard_batch(mesh, batch))

    assert abs(float(tp_metrics["loss"]) - ref_loss) < 1e-4, \
        (float(tp_metrics["loss"]), ref_loss)
    # updated params kept the column/row layout (not resharded to replicated)
    spec = new_state.params["layer_0_skip_kernel"].sharding.spec
    assert tuple(spec)[-1] == MODEL_AXIS, spec
    pspec = new_state.params["post_1"]["kernel"].sharding.spec
    assert tuple(pspec)[:1] == (MODEL_AXIS,), pspec


def test_abstract_state_matches_init_state():
    """abstract_state (the zero-device-work resume skeleton) agrees with
    init_state on tree structure, shapes, and dtypes."""
    from tacotron_wavenet_vocoder_korean_tpu.config import (
        AudioConfig, Config)
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask)

    audio, mel = make_inputs()
    cfg = Config(wavenet=TINY, audio=AudioConfig(hop_size=HOP))
    task = WaveNetTask(cfg)

    class _B:
        input_wav = np.asarray(audio)
        local_condition = np.asarray(mel)
        speaker_id = np.zeros((2,), np.int32)

    concrete = task.init_state(RNG, _B)
    abstract = task.abstract_state(RNG, _B)
    cl, ct = jax.tree_util.tree_flatten(concrete)
    al, at = jax.tree_util.tree_flatten(abstract)
    assert ct == at
    for c, a in zip(cl, al):
        assert isinstance(a, jax.ShapeDtypeStruct)
        assert c.shape == a.shape and c.dtype == a.dtype
