"""Training-health diagnostic for a WaveNet run: one-step-ahead accuracy.

Free-run WaveNet output stays noise-like for the first couple hundred
thousand steps (reference ReadMe.md:111,115), which makes it hard to tell a
healthy-but-young model from a broken generation path.  This separates the
two: teacher-forced (one-step-ahead) prediction on held-out crops uses the
TRUE history, so it isolates the learned conditional p(x_t | x_<t, mel) from
autoregressive drift.  A healthy run shows correlation near 1 long before
free-run audio is speech; a generation-path bug does not.

Usage:
  python scripts/wavenet_diagnose.py --wavenet logs/wn_moon \
      --data workdir/moon/data [--platform cpu] [--n_crops 4]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wavenet", required=True, help="wavenet run dir")
    p.add_argument("--data", required=True, help="preprocessed corpus dir")
    p.add_argument("--n_crops", type=int, default=4)
    p.add_argument("--seed", type=int, default=7)
    from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
        add_platform_arg, set_platform)
    add_platform_arg(p)
    args = p.parse_args()

    import jax
    set_platform(args.platform)
    import numpy as np

    from tacotron_wavenet_vocoder_korean_tpu.models.mixture import (
        sample_from_discretized_mix_logistic)
    from tacotron_wavenet_vocoder_korean_tpu.models.wavenet import WaveNet
    from tacotron_wavenet_vocoder_korean_tpu.synth.generator import (
        WaveNetGenerator)
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        wavenet_batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.data.loader import WaveNetBatcher

    # reuse the generator's restore path (cfg + EMA params + step)
    gen = WaveNetGenerator().load(args.wavenet)
    cfg, params = gen.cfg, gen.params
    model = WaveNet(cfg.wavenet)
    batcher = WaveNetBatcher([args.data], cfg, batch_size=1,
                             data_type="test", seed=args.seed)
    it = iter(batcher)

    apply_fn = jax.jit(lambda params, wav, lc: model.apply(
        {"params": params}, wav, lc, None))

    corrs, maes = [], []
    for i in range(args.n_crops):
        bd = wavenet_batch_to_dict(next(it))
        out = apply_fn(params, bd["input_wav"], bd["local_condition"])
        pred = np.asarray(sample_from_discretized_mix_logistic(
            jax.random.PRNGKey(i + 1), out["raw_output"]))
        tgt = np.asarray(out["target"])
        if tgt.ndim == 3:
            tgt = tgt[..., 0]
        n = min(pred.shape[-1], tgt.shape[-1])
        a, b = pred[0, -n:].ravel(), tgt[0, -n:].ravel()
        corrs.append(float(np.corrcoef(a, b)[0, 1]))
        maes.append(float(np.abs(a - b).mean()))

    result = {
        "step": gen.step,
        "n_crops": args.n_crops,
        "one_step_ahead_corr": round(float(np.mean(corrs)), 4),
        "one_step_ahead_mae": round(float(np.mean(maes)), 4),
        "per_crop_corr": [round(c, 4) for c in corrs],
        "healthy": bool(np.mean(corrs) > 0.9),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
