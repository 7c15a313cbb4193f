"""FP8 fine-tuning trainer.

TPU-native counterpart of the reference's two trainers (single-GPU
``train_fp8.py:168-405``, distributed ``train_multi_gpu.py:517-962``). One
trainer covers both: distribution is a mesh argument, not a different class —
the jitted train step is sharded by GSPMD from the param/batch specs.

Feature parity checklist (reference cites):
  * AdamW with no-decay param groups for bias/norm  (train_multi_gpu.py:540-575)
  * linear-warmup (train_fp8.py:206-210) and cosine (train_multi_gpu.py:577-596)
    schedules
  * gradient accumulation                            (train_fp8.py:281)
  * grad-clip 1.0                                    (train_fp8.py:288)
  * non-finite loss guard                            (train_fp8.py:282-284;
    here: skip-step instead of abort, the distributed trainer's behavior)
  * token-weighted eval loss → perplexity            (train_fp8.py:316-356)
  * FP8 delayed-scaling state updated inside the step (replaces fp8_autocast)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import optax

from llm_fp8_tpu.models.config import ModelConfig
from llm_fp8_tpu.models.llama import (
    forward, forward_fp8_train, lm_head_weight, _lm_head,
)
from llm_fp8_tpu.quant import RecipeSet, recipe_set_by_name
from .losses import causal_lm_loss, chunked_causal_lm_loss
from .quant_state import (
    init_train_quant_state,
    forward_scales,
    make_sinks,
    update_quant_state,
)

__all__ = ["TrainConfig", "TrainState", "Trainer", "make_optimizer"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Run hyperparameters (the reference's ``TrainingConfig``, config.py:5-48)."""

    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    warmup_steps: int = 100
    total_steps: int = 10_000
    schedule: str = "linear"  # "linear" | "cosine" | "constant"
    grad_clip: float = 1.0
    grad_accum: int = 1
    recipes: str = "bf16"  # recipe-set name: default|hybrid|mxfp8|bf16
    z_loss: float = 0.0
    label_smoothing: float = 0.0
    unroll: int = 1
    # Per-layer rematerialization: False/'none' (off), True/'full' (save
    # nothing), or 'dots' (save matmul outputs, recompute elementwise only —
    # near-zero recompute tax; see models.llama._remat_policy).
    remat: bool | str = False
    # Dtype for AdamW's first moment (None = fp32). bf16 halves the largest
    # optimizer buffer — the single-chip memory knob standing in for the
    # reference's FSDP MixedPrecision policy (train_multi_gpu.py:414-419).
    adam_mu_dtype: str | None = None
    # Attention dropout on softmax weights (flash_attn_func's dropout_p);
    # seed varies with the step counter. bf16 recipe path only.
    attention_dropout: float = 0.0
    # >1: fuse the lm_head projection into a chunked cross-entropy so the
    # [B, S, vocab] fp32 logits never materialize (the reference's fused
    # xentropy role, csrc/xentropy). Llama-family forwards only.
    ce_chunks: int = 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    qstate: Any  # delayed-scaling state ({} when recipes disabled)
    step: jax.Array


def _no_decay(path_leaf_names: str) -> bool:
    # Norm weights and biases are excluded from weight decay
    # (reference train_multi_gpu.py:540-575).
    return any(t in path_leaf_names for t in ("norm", "bqkv", "bias"))


def make_optimizer(config: TrainConfig, params) -> optax.GradientTransformation:
    if config.schedule == "linear":
        # Linear warmup then linear decay to 0 at total_steps — the actual
        # trajectory of the reference's get_linear_schedule_with_warmup
        # (train_fp8.py:206-210), not constant-after-warmup.
        lr = optax.schedules.join_schedules(
            [
                optax.schedules.linear_schedule(
                    0.0, config.learning_rate, config.warmup_steps
                ),
                optax.schedules.linear_schedule(
                    config.learning_rate,
                    0.0,
                    max(config.total_steps - config.warmup_steps, 1),
                ),
            ],
            [config.warmup_steps],
        )
    elif config.schedule == "cosine":
        lr = optax.schedules.warmup_cosine_decay_schedule(
            0.0, config.learning_rate, config.warmup_steps, config.total_steps
        )
    else:
        lr = config.learning_rate

    def decay_mask(tree):
        def walk(t, name=""):
            if isinstance(t, dict):
                return {k: walk(v, k) for k, v in t.items()}
            return jax.tree_util.tree_map(lambda _: not _no_decay(name), t)

        return walk(tree)

    tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(
            lr,
            b1=config.adam_b1,
            b2=config.adam_b2,
            eps=config.adam_eps,
            weight_decay=config.weight_decay,
            mask=decay_mask,
            mu_dtype=config.adam_mu_dtype,
        ),
    )
    if config.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.grad_accum)
    return tx


class Trainer:
    """Owns the jitted step functions; orchestration stays in Python."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        *,
        attn_impl: str = "auto",
        cp_mesh=None,
        forward_fn=None,
    ):
        """``forward_fn``: the family forward (default: the Llama family's).
        Any zoo decoder with the shared signature
        ``fn(params, tokens, cfg, attn_impl=, remat=, unroll=, dropout_p=,
        dropout_seed=) -> logits`` trains through the same Trainer — the
        reference's one-training-harness-for-the-zoo contract
        (``flash-attention-2.8.0/training/``). The FP8 recipe path
        (``forward_fp8_train``) currently implements the Llama/Qwen stack;
        train other families with ``recipes="bf16"``."""
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.recipes: RecipeSet = recipe_set_by_name(train_cfg.recipes)
        self._fwd = forward_fn if forward_fn is not None else forward
        if self.recipes.enabled and self._fwd is not forward:
            raise ValueError(
                "FP8 recipe training implements the Llama/Qwen family "
                "stack; train other zoo families with recipes='bf16'"
            )
        self.attn_impl = attn_impl
        # Context parallelism: a mesh whose "cp" axis is >1 turns every
        # training attention into the ring island (parallel/mesh.py AXIS_CP).
        self.cp_mesh = cp_mesh
        self.cp_axis = None
        if cp_mesh is not None:
            shape = dict(zip(cp_mesh.axis_names, cp_mesh.devices.shape))
            if shape.get("cp", 1) > 1:
                self.cp_axis = "cp"
        self.tx = None  # built at init_state
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # ---- state ----

    def init_state(self, params) -> TrainState:
        self.tx = make_optimizer(self.cfg, params)
        qstate = (
            init_train_quant_state(self.model_cfg, self.recipes)
            if self.recipes.enabled
            else {}
        )
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            qstate=qstate,
            step=jnp.zeros((), jnp.int32),
        )

    # ---- steps ----

    def _forward_loss(self, params, sinks, batch, qstate, step=0):
        tokens = batch["input_ids"]
        mask = batch.get("attention_mask")
        # Chunked CE skips the in-model lm_head and fuses the projection
        # into the loss (Llama-family forwards only — the zoo families fall
        # back to the materialized-logits path).
        chunked = self.cfg.ce_chunks > 1 and self._fwd is forward
        router_aux = None
        # Llama-family forwards always return the final-norm hidden states:
        # the trainer computes the activation mean/std series on them (the
        # reference feeds hidden_states[-1] to StabilityExperiment,
        # train_fp8.py:295-299) and applies the same _lm_head the model
        # would (bit-identical — both the bf16 and fp8-train forwards route
        # the vocab projection through the unquantized _lm_head).
        want_hidden = self._fwd is forward
        if self.recipes.enabled:
            scales = forward_scales(qstate, self.model_cfg)
            logits, amaxes = forward_fp8_train(
                params, tokens, self.model_cfg, self.recipes, scales, sinks,
                attn_impl=self.attn_impl, unroll=self.cfg.unroll,
                remat=self.cfg.remat,
                cp_axis=self.cp_axis, cp_mesh=self.cp_mesh,
                return_hidden=want_hidden,
            )
        else:
            kw = dict(
                attn_impl=self.attn_impl, unroll=self.cfg.unroll,
                remat=self.cfg.remat,
                dropout_p=self.cfg.attention_dropout, dropout_seed=step,
            )
            if self._fwd is forward:
                kw.update(cp_axis=self.cp_axis, cp_mesh=self.cp_mesh,
                          return_hidden=want_hidden)
            # MoE family: thread the router's load-balancing auxiliary loss
            # out of the forward (Switch/Mixtral E·Σf·P; the coefficient is
            # applied below, matching HF's router_aux_loss_coef treatment).
            is_moe = hasattr(self.model_cfg, "router_aux_coef")
            if is_moe:
                # token_mask keeps padding out of expert capacity and the
                # aux statistics (HF masks both, modeling_mixtral.py:524+).
                kw.update(return_router_aux=True, token_mask=mask)
            out = self._fwd(params, tokens, self.model_cfg, **kw)
            # Llama-family forward returns (logits, cache); the zoo
            # forwards return bare logits when no cache is passed.
            logits = out[0] if isinstance(out, tuple) else out
            router_aux = out[2] if is_moe else None
            amaxes = {}
        if want_hidden:
            hidden32 = logits.astype(jnp.float32)  # final-norm hidden states
            act_stats = (jnp.mean(hidden32), jnp.std(hidden32))
            if not chunked:
                logits = _lm_head(params, logits, self.model_cfg)
        else:
            # Zoo families don't expose hidden states — no activation series
            # (the reference likewise skips when hidden_states is absent).
            act_stats = (jnp.full((), jnp.nan), jnp.full((), jnp.nan))
        if chunked:
            loss, n_tokens = chunked_causal_lm_loss(
                logits, lm_head_weight(params, self.model_cfg), tokens, mask,
                num_chunks=self.cfg.ce_chunks,
                z_loss=self.cfg.z_loss,
                label_smoothing=self.cfg.label_smoothing,
            )
        else:
            loss, n_tokens = causal_lm_loss(
                logits, tokens, mask,
                z_loss=self.cfg.z_loss,
                label_smoothing=self.cfg.label_smoothing,
            )
        if router_aux is not None:
            loss = loss + self.model_cfg.router_aux_coef * router_aux
        return loss, (n_tokens, amaxes, act_stats)

    def _train_step_impl(self, state: TrainState, batch):
        sinks = make_sinks(self.model_cfg)

        (loss, (n_tokens, amaxes, act_stats)), grads = jax.value_and_grad(
            self._forward_loss, argnums=(0, 1), has_aux=True
        )(state.params, sinks, batch, state.qstate, state.step)
        pgrads, g_amaxes = grads

        # Non-finite guard: skip the update, keep the step counter moving
        # (reference aborts single-GPU, zeroes NaN distributed — skip-step is
        # the safe middle ground and keeps jit shape-static).
        finite = jnp.isfinite(loss)
        gnorm = optax.global_norm(pgrads)
        finite &= jnp.isfinite(gnorm)

        updates, new_opt = self.tx.update(pgrads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def keep(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new, old
            )

        new_params = keep(new_params, state.params)
        new_opt = keep(new_opt, state.opt_state)

        if state.qstate:
            # Gate the delayed-scaling history on the same finite flag as
            # params: an inf/NaN amax entering the history makes the scale
            # inf, dequant then yields NaN, and with amax_compute='max' the
            # poisoned history regenerates itself — one overflow step would
            # otherwise permanently kill FP8 training (the reference aborts
            # instead, train_fp8.py:282-284).
            new_qstate = keep(
                update_quant_state(
                    state.qstate, amaxes, g_amaxes, self.recipes
                ),
                state.qstate,
            )
        else:
            new_qstate = state.qstate

        metrics = {
            "loss": loss,
            "grad_norm": gnorm,
            "tokens": n_tokens,
            "finite": finite.astype(jnp.int32),
            "activation_mean": act_stats[0],
            "activation_std": act_stats[1],
        }
        return (
            TrainState(new_params, new_opt, new_qstate, state.step + 1),
            metrics,
        )

    def _eval_step_impl(self, params, batch):
        chunked = self.cfg.ce_chunks > 1 and self._fwd is forward
        kw = dict(attn_impl=self.attn_impl, unroll=self.cfg.unroll)
        if self._fwd is forward:
            kw.update(cp_axis=self.cp_axis, cp_mesh=self.cp_mesh,
                      return_hidden=chunked)
        out = self._fwd(params, batch["input_ids"], self.model_cfg, **kw)
        logits = out[0] if isinstance(out, tuple) else out
        if chunked:
            loss, n = chunked_causal_lm_loss(
                logits, lm_head_weight(params, self.model_cfg),
                batch["input_ids"], batch.get("attention_mask"),
                num_chunks=self.cfg.ce_chunks,
            )
        else:
            loss, n = causal_lm_loss(
                logits, batch["input_ids"], batch.get("attention_mask")
            )
        return loss * n, n

    # ---- loops ----

    def train_step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        return self._train_step(state, batch)

    def evaluate(self, params, batches: Iterable[Dict]) -> Dict[str, float]:
        """Token-weighted eval loss → perplexity (train_fp8.py:316-356)."""
        total_loss, total_tokens = 0.0, 0
        for batch in batches:
            l, n = self._eval_step(params, batch)
            total_loss += float(l)
            total_tokens += int(n)
        mean = total_loss / max(total_tokens, 1)
        # Perplexity exp capped like the reference (train_multi_gpu.py:853).
        import math

        return {
            "eval_loss": mean,
            "perplexity": math.exp(min(mean, 20.0)),
            "eval_tokens": total_tokens,
        }
