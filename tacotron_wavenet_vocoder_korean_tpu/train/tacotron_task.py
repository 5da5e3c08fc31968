"""Tacotron training task: state, jitted train/eval steps, mesh sharding.

TPU-native counterpart of reference train_tacotron.py:110-253's graph-building
section: optax Adam + global-norm clip 1.0 + Noam warmup (reference
tacotron/tacotron.py:285-313), batch-stats threading for the CBHG batchnorms,
and a free-running eval model sharing the same params (reference
train_tacotron.py:152-158).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..config import Config
from ..models.tacotron import (Tacotron, tacotron_loss,
                               learning_rate_schedule,
                               scheduled_sampling_prob)
from ..parallel.mesh import Mesh, batch_sharding, replicated


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class TacotronTask:
    def __init__(self, cfg: Config, vocab_size: int = 80,
                 is_randomly_initialized: bool = False):
        self.cfg = cfg
        self.model = Tacotron(cfg=cfg.tacotron, audio=cfg.audio,
                              vocab_size=vocab_size)
        self.lr_schedule = learning_rate_schedule(
            cfg.tacotron, is_randomly_initialized)
        self.tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(self.lr_schedule, b1=cfg.tacotron.adam_beta1,
                       b2=cfg.tacotron.adam_beta2),
        )

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch) -> TrainState:
        # accept either a TacotronBatch or a batch dict (device store path)
        get = (example_batch.__getitem__ if isinstance(example_batch, dict)
               else lambda k: getattr(example_batch, k))
        variables = self.model.init(
            {"params": rng, "dropout": rng},
            jnp.asarray(get("inputs")),
            jnp.asarray(get("input_lengths")),
            speaker_id=jnp.asarray(get("speaker_id")),
            mel_targets=jnp.asarray(get("mel_targets"), jnp.float32),
            train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )

    def abstract_state(self, rng: jax.Array, example_batch):
        """Shape/dtype skeleton of :meth:`init_state` via ``jax.eval_shape``
        — zero device work.  A resuming run restores a checkpoint into this
        skeleton (restore_into_state builds host templates from metadata),
        so restarts skip the eager on-device init entirely."""
        get = (example_batch.__getitem__ if isinstance(example_batch, dict)
               else lambda k: getattr(example_batch, k))

        def _init(rng, inputs, input_lengths, speaker_id, mel_targets):
            variables = self.model.init(
                {"params": rng, "dropout": rng}, inputs, input_lengths,
                speaker_id=speaker_id,
                mel_targets=mel_targets.astype(jnp.float32), train=True)
            params = variables["params"]
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=variables.get("batch_stats", FrozenDict()),
                opt_state=self.tx.init(params))

        return jax.eval_shape(
            _init, rng, get("inputs"), get("input_lengths"),
            get("speaker_id"), get("mel_targets"))

    # ------------------------------------------------------------------
    def loss_fn(self, params, batch_stats, batch, rng,
                teacher_force_prob=None):
        variables = {"params": params, "batch_stats": batch_stats}
        # targets may arrive as f16 (transfer_dtype — the tunnel is
        # bandwidth-bound); upcast on device, loss math stays f32
        mel_t = batch["mel_targets"].astype(jnp.float32)
        lin_t = batch["linear_targets"].astype(jnp.float32)
        rngs = {"dropout": rng}
        if teacher_force_prob is not None:
            # scheduled sampling: independent stream so the dropout draw
            # (and thus the exact reference path when disabled) is unchanged
            rngs["ss"] = jax.random.fold_in(rng, 7)
        outputs, mutated = self.model.apply(
            variables,
            batch["inputs"], batch["input_lengths"],
            speaker_id=batch["speaker_id"],
            mel_targets=mel_t,
            train=True,
            teacher_force_prob=teacher_force_prob,
            rngs=rngs,
            mutable=["batch_stats"],
        )
        losses = tacotron_loss(outputs, mel_t,
                               lin_t, batch["loss_coeff"],
                               self.cfg.tacotron, self.cfg.audio)
        return losses["loss"], (losses, outputs,
                                mutated.get("batch_stats", batch_stats))

    # ------------------------------------------------------------------
    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(rng, state.step)
        tf_prob = None
        if self.cfg.tacotron.scheduled_sampling:
            tf_prob = scheduled_sampling_prob(self.cfg.tacotron, state.step)
        grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
        (loss, (losses, _, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, step_rng, tf_prob)
        updates, new_opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["learning_rate"] = self.lr_schedule(state.step)
        metrics["grad_norm"] = optax.global_norm(grads)
        if tf_prob is not None:
            metrics["teacher_force_prob"] = tf_prob
        return TrainState(state.step + 1, new_params, new_stats,
                          new_opt_state), metrics

    def eval_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                  rng: Optional[jax.Array] = None
                  ) -> Dict[str, jnp.ndarray]:
        """FREE-RUNNING decode against targets: the decoder feeds its own
        outputs for targets-length steps, so the train/test gap measures
        exposure bias (reference train_tacotron.py:152-158 builds the test
        model with rnn_decoder_test_mode=True; helpers.py:84-88 feeds
        previous outputs).  ``rng`` drives the live decoder-prenet dropout
        (tacotron.py:41 keeps it on in test mode); defaults to a fixed key so
        eval curves are comparable across steps."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        mel_t = batch["mel_targets"].astype(jnp.float32)
        lin_t = batch["linear_targets"].astype(jnp.float32)
        outputs = self.model.apply(
            variables, batch["inputs"], batch["input_lengths"],
            speaker_id=batch["speaker_id"],
            mel_targets=mel_t,
            train=False, free_run=True,
            rngs={"dropout": rng})
        losses = tacotron_loss(outputs, mel_t,
                               lin_t, batch["loss_coeff"],
                               self.cfg.tacotron, self.cfg.audio)
        losses["alignments"] = outputs["alignments"]
        losses["linear_outputs"] = outputs["linear_outputs"]
        losses["mel_outputs"] = outputs["mel_outputs"]
        return losses

    # ------------------------------------------------------------------
    def jit_train_step(self, mesh: Optional[Mesh] = None):
        """jit the train step; with a mesh, shard batch over the data axis and
        replicate state — XLA inserts the gradient psums over ICI."""
        if mesh is None:
            return jax.jit(self.train_step, donate_argnums=0)
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        batch_shardings = {k: data for k in
                           ("inputs", "input_lengths", "loss_coeff",
                            "mel_targets", "linear_targets", "speaker_id")}
        return jax.jit(
            self.train_step,
            in_shardings=(None, batch_shardings, repl),
            out_shardings=(None, None),
            donate_argnums=0,
        )

    def jit_eval_step(self):
        return jax.jit(self.eval_step)


def batch_to_dict(batch, transfer_dtype: str = "float32"
                  ) -> Dict[str, jnp.ndarray]:
    """TacotronBatch dataclass -> plain dict of arrays for the jit boundary.

    ``transfer_dtype='float16'`` sends the bulky spectrogram targets over the
    host->device link as f16 (4x fewer bytes — the tunneled chip moves only
    ~30 MB/s, so f32 linear targets dominate the train step); the task
    upcasts them to f32 on device.  Quantization is ~1e-3 in the [-4,4]
    normalized spectrogram range, far below the L1 losses it feeds."""
    import numpy as np
    cast = ((lambda a: np.asarray(a, np.float16))
            if transfer_dtype == "float16" else (lambda a: a))
    return {
        "inputs": jnp.asarray(batch.inputs),
        "input_lengths": jnp.asarray(batch.input_lengths),
        "loss_coeff": jnp.asarray(batch.loss_coeff),
        "mel_targets": jnp.asarray(cast(batch.mel_targets)),
        "linear_targets": jnp.asarray(cast(batch.linear_targets)),
        "speaker_id": jnp.asarray(batch.speaker_id),
    }
