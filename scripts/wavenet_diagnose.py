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
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from tacotron_wavenet_vocoder_korean_tpu.config import load_config
    from tacotron_wavenet_vocoder_korean_tpu.models.mixture import (
        sample_from_discretized_mix_logistic)
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        WaveNetTask, wavenet_batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.train.checkpoints import (
        CheckpointManager)
    from tacotron_wavenet_vocoder_korean_tpu.data.loader import WaveNetBatcher

    cfg = load_config(args.wavenet)
    task = WaveNetTask(cfg)
    batcher = WaveNetBatcher([args.data], cfg, batch_size=1,
                             data_type="test", seed=args.seed)
    it = iter(batcher)
    first = next(it)
    state = task.init_state(jax.random.PRNGKey(0), first)
    mgr = CheckpointManager(args.wavenet)
    restored = mgr.restore(jax.tree.map(np.asarray, state))
    mgr.close()

    apply_fn = jax.jit(lambda params, wav, lc: task.model.apply(
        {"params": params}, wav, lc, None))

    corrs, maes = [], []
    batch = first
    for i in range(args.n_crops):
        bd = wavenet_batch_to_dict(batch)
        out = apply_fn(restored.ema_params, bd["input_wav"],
                       bd["local_condition"])
        y = out["raw_output"]
        pred = np.asarray(sample_from_discretized_mix_logistic(
            jax.random.PRNGKey(i + 1), y))
        tgt = np.asarray(out["target"])[..., 0] \
            if np.asarray(out["target"]).ndim == 3 else np.asarray(out["target"])
        n = min(pred.shape[-1], tgt.shape[-1])
        a, b = pred[0, -n:].ravel(), tgt[0, -n:].ravel()
        corrs.append(float(np.corrcoef(a, b)[0, 1]))
        maes.append(float(np.abs(a - b).mean()))
        batch = next(it)

    result = {
        "step": int(restored.step),
        "n_crops": args.n_crops,
        "one_step_ahead_corr": round(float(np.mean(corrs)), 4),
        "one_step_ahead_mae": round(float(np.mean(maes)), 4),
        "per_crop_corr": [round(c, 4) for c in corrs],
        "healthy": bool(np.mean(corrs) > 0.9),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
