"""WaveNet training task: exp-decay Adam + EMA shadow params.

Reference semantics (wavenet/model.py:314-346, wavenet/ops.py:3-21):
exponential-decay learning rate (0.5 per 300k steps), Adam (or sgd/rmsprop via
the optimizer factory), optional global-norm clip, and an exponential moving
average (decay 0.9999) maintained as shadow parameters — here stored in the
TrainState and updated with ``optax.incremental_update`` after each step.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.wavenet import WaveNet, wavenet_loss
from ..parallel.mesh import (
    MODEL_AXIS, Mesh, P, batch_sharding, shard_tree, tree_shardings)

# Tensor parallelism over the model axis: the skip/post stack carries the
# wide (skip_channels=512) matmuls, so it gets the classic Megatron
# column->row pair — every layer's skip projection is column-parallel
# (outputs sharded over skip channels), the relu between is elementwise on
# the sharded accumulator, and post_1 is row-parallel (contracting dim
# sharded; XLA's sharding propagation inserts the single all-reduce).
# post_2 and the thin (32-channel) dilated stack stay replicated — sharding
# them would trade one cheap all-reduce for per-layer latency on ICI.
# Shape-validated regex rules (tree_shardings) also catch the
# weight-normalized `_v`/`_g` companions and the Adam/EMA moment trees.
WAVENET_TP_RULES = (
    (r"layer_\d+_skip_kernel", P(None, MODEL_AXIS)),
    (r"layer_\d+_skip_bias", P(MODEL_AXIS)),
    (r"post_1.*kernel|post_1_kernel", P(MODEL_AXIS, None)),
)


class WaveNetTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    w = cfg.wavenet
    schedule = optax.exponential_decay(
        init_value=w.learning_rate,
        transition_steps=w.decay_steps,
        decay_rate=w.decay_rate)
    opts = {
        "adam": lambda: optax.adam(schedule),
        "sgd": lambda: optax.sgd(schedule, momentum=w.momentum),
        "rmsprop": lambda: optax.rmsprop(schedule, momentum=w.momentum),
    }
    if w.optimizer not in opts:
        raise KeyError(f"unknown optimizer {w.optimizer!r}")
    tx = opts[w.optimizer]()
    if w.clip_gradients:
        tx = optax.chain(optax.clip_by_global_norm(1.0), tx)
    return tx


class WaveNetTask:
    def __init__(self, cfg: Config, gc_enable: bool = False):
        self.cfg = cfg
        self.gc_enable = gc_enable
        self.model = WaveNet(cfg.wavenet)
        self.tx = make_optimizer(cfg)
        self.lr_schedule = optax.exponential_decay(
            cfg.wavenet.learning_rate, cfg.wavenet.decay_steps,
            cfg.wavenet.decay_rate)

    def init_state(self, rng: jax.Array, example_batch) -> WaveNetTrainState:
        # accept either a WaveNetBatch or a batch dict (device store path)
        get = (example_batch.__getitem__ if isinstance(example_batch, dict)
               else lambda k: getattr(example_batch, k))
        sid = jnp.asarray(get("speaker_id")) if self.gc_enable else None
        variables = self.model.init(
            rng, jnp.asarray(get("input_wav")),
            jnp.asarray(get("local_condition")), sid)
        params = variables["params"]
        return WaveNetTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            # distinct buffers: params and ema_params are both donated by the
            # jitted step; aliasing them trips "donate the same buffer twice"
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=self.tx.init(params),
        )

    def abstract_state(self, rng: jax.Array, example_batch):
        """Shape/dtype skeleton of :meth:`init_state` via ``jax.eval_shape``
        — zero device work.  A resuming run restores a checkpoint into this
        skeleton (restore_into_state builds host templates from metadata),
        so restarts skip the ~5 min eager on-device init entirely."""
        get = (example_batch.__getitem__ if isinstance(example_batch, dict)
               else lambda k: getattr(example_batch, k))
        sid = get("speaker_id") if self.gc_enable else None

        def _init(rng, wav, lc, sid):
            params = self.model.init(rng, wav, lc, sid)["params"]
            return WaveNetTrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                ema_params=jax.tree.map(jnp.copy, params),
                opt_state=self.tx.init(params))

        return jax.eval_shape(_init, rng, get("input_wav"),
                              get("local_condition"), sid)

    def loss_fn(self, params, batch):
        sid = batch["speaker_id"] if self.gc_enable else None
        out = self.model.apply({"params": params}, batch["input_wav"],
                               batch["local_condition"], sid)
        l2_pairs = None
        if self.cfg.wavenet.l2_regularization_strength > 0:
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            l2_pairs = [(jax.tree_util.keystr(k), v) for k, v in flat]
        losses = wavenet_loss(self.cfg.wavenet, out, l2_pairs)
        return losses["loss"], losses

    def train_step(self, state: WaveNetTrainState,
                   batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[WaveNetTrainState, Dict[str, jnp.ndarray]]:
        (loss, losses), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(state.params, batch)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = optax.incremental_update(
            new_params, state.ema_params,
            1.0 - self.cfg.wavenet.ema_decay)
        metrics = dict(losses)
        metrics["learning_rate"] = self.lr_schedule(state.step)
        metrics["grad_norm"] = optax.global_norm(grads)
        return WaveNetTrainState(state.step + 1, new_params, new_ema,
                                 new_opt), metrics

    def eval_step(self, state: WaveNetTrainState,
                  batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Held-out teacher-forced loss, evaluated with the EMA shadow
        params (the weights generation actually uses) — the eval stream the
        reference's WaveNet trainer lacks (SURVEY §5 observability)."""
        _, losses = self.loss_fn(state.ema_params, batch)
        return losses

    def jit_eval_step(self):
        return jax.jit(self.eval_step)

    def state_shardings(self, mesh: Mesh, state: WaveNetTrainState):
        """Sharding tree for the whole train state: TP rules over the model
        axis where it has extent, replicated otherwise."""
        rules = WAVENET_TP_RULES if mesh.shape[MODEL_AXIS] > 1 else ()
        return tree_shardings(mesh, state, rules)

    def shard_state(self, mesh: Mesh,
                    state: WaveNetTrainState) -> WaveNetTrainState:
        """Device-put the state with its TP/replicated shardings (call once
        after init or restore; the jitted step then preserves placement)."""
        return shard_tree(mesh, state, self.state_shardings(mesh, state))

    def jit_train_step(self, mesh: Optional[Mesh] = None):
        if mesh is None:
            return jax.jit(self.train_step, donate_argnums=0)
        data = batch_sharding(mesh)
        shardings = {k: data for k in
                     ("input_wav", "local_condition", "speaker_id")}
        tp = mesh.shape[MODEL_AXIS] > 1

        def step(state, batch):
            if tp:
                # Pin the param layout so the partitioner can't undo the
                # column/row split when propagating from replicated inputs.
                state = state._replace(params=jax.lax.with_sharding_constraint(
                    state.params,
                    tree_shardings(mesh, state.params, WAVENET_TP_RULES)))
            return self.train_step(state, batch)

        return jax.jit(step,
                       in_shardings=(None, shardings),
                       out_shardings=(None, None),
                       donate_argnums=0)


def wavenet_batch_to_dict(batch) -> Dict[str, jnp.ndarray]:
    return {
        "input_wav": jnp.asarray(batch.input_wav),
        "local_condition": jnp.asarray(batch.local_condition),
        "speaker_id": jnp.asarray(batch.speaker_id),
    }
