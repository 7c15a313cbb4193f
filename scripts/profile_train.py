"""Op-level decomposition of the train step (PERF_NOTES round-2 agenda #1).

Times, in one process/session (same-run ratios only, scan-loop discipline):
  fwd_only    - forward to logits, no CE
  fwd_loss    - forward + CE loss, no backward
  grad        - value_and_grad (fwd+bwd), no optimizer
  head_ce     - lm_head matmul + CE fwd+bwd on random hidden states
  adam        - clip + AdamW update alone (fixed grads, carried opt state)
  full        - the real train step: fwd + bwd + clip + AdamW + guard

Every phase is made loop-dependent (inputs perturbed by the scan carry,
grads consumed via carry-indexed dynamic slices) so XLA cannot hoist the
body out of the timing scan as loop-invariant — with a constant batch the
whole fwd/bwd is otherwise computed once per dispatch, not once per step.

Usage: python scripts/profile_train.py [--model llama-3.2-1b] [--batch 8]
       [--seq 512] [--remat dots]
Prints one JSON line.
"""
import argparse
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

# After jax: a PYTHONPATH=/root/repo env var shadows the axon PJRT plugin's
# registration — insert the repo root post-import instead (house pattern,
# scripts/sweep_train.py).
sys.path.insert(0, "/root/repo")

from llm_fp8_tpu.models import get_config, init_params  # noqa: E402
from llm_fp8_tpu.training import TrainConfig, Trainer
from llm_fp8_tpu.training.losses import causal_lm_loss

STEPS = 8
TRIALS = 3


def _sync(x):
    import numpy as np

    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.reshape(leaf, (-1))[:1])


def _time(fn, *args):
    out = fn(*args)  # compile + warm
    _sync(out)
    times = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[TRIALS // 2] / STEPS


def _perturb_tokens(tokens, c):
    # Data-dependence on the carry; never actually changes the tokens
    # (c stays finite) but XLA cannot prove that, so nothing downstream
    # is loop-invariant.
    return jnp.where(jnp.isfinite(c), tokens, tokens + 1)


def _pick(tree, c):
    # Consume every leaf through a carry-dependent dynamic index: forces the
    # full computation (a static slice would let XLA narrow the producing
    # matmuls) at O(leaves) cost instead of a full read pass.
    idx = (jnp.isfinite(c)).astype(jnp.int32)  # dynamic 0/1
    return sum(
        jax.lax.dynamic_index_in_dim(
            jnp.reshape(g, (-1,)), idx, 0, keepdims=False
        ).astype(jnp.float32)
        for g in jax.tree_util.tree_leaves(tree)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-3.2-1b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--remat", default="dots", choices=["full", "dots", "none"])
    ap.add_argument("--unroll", type=int, default=1)
    args = ap.parse_args()

    cfg = get_config(args.model)
    remat = {"full": True, "dots": "dots", "none": False}[args.remat]
    trainer = Trainer(
        cfg,
        TrainConfig(recipes="bf16", warmup_steps=1, total_steps=1000,
                    remat=remat, adam_mu_dtype="bfloat16",
                    unroll=args.unroll),
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    batch = {
        "input_ids": jnp.ones((args.batch, args.seq), jnp.int32),
        "attention_mask": jnp.ones((args.batch, args.seq), jnp.int32),
    }
    results = {}

    from llm_fp8_tpu.models.llama import forward

    # -- fwd only (no CE) -------------------------------------------------
    @jax.jit
    def fwd_only(params, batch):
        def body(c, _):
            tok = _perturb_tokens(batch["input_ids"], c)
            out = forward(params, tok, cfg, remat=trainer.cfg.remat,
                          unroll=trainer.cfg.unroll)
            logits = out[0] if isinstance(out, tuple) else out
            return _pick(logits, c), None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)[0]

    results["fwd_only"] = _time(fwd_only, params, batch)

    # -- fwd + loss -------------------------------------------------------
    @jax.jit
    def fwd_loss(params, batch):
        def body(c, _):
            b = dict(batch, input_ids=_perturb_tokens(batch["input_ids"], c))
            loss, _ = trainer._forward_loss(params, {}, b, {}, 0)
            return loss, None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)[0]

    results["fwd_loss"] = _time(fwd_loss, params, batch)

    # -- grad (fwd + bwd) ---------------------------------------------------
    gfn = jax.value_and_grad(trainer._forward_loss, has_aux=True)

    @jax.jit
    def grad_only(params, batch):
        def body(c, _):
            b = dict(batch, input_ids=_perturb_tokens(batch["input_ids"], c))
            (loss, _), grads = gfn(params, {}, b, {}, 0)
            return loss + _pick(grads, c), None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)[0]

    results["grad"] = _time(grad_only, params, batch)

    # -- lm_head + CE in isolation (fwd+bwd) --------------------------------
    h = jax.random.normal(jax.random.PRNGKey(1),
                          (args.batch, args.seq, cfg.hidden_size),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2),
                          (cfg.hidden_size, cfg.vocab_size),
                          jnp.bfloat16) * 0.02

    def head_ce_loss(h, w, batch):
        logits = (h @ w).astype(jnp.float32)
        loss, _ = causal_lm_loss(logits, batch["input_ids"],
                                 batch["attention_mask"])
        return loss

    hgfn = jax.value_and_grad(head_ce_loss, argnums=(0, 1))

    @jax.jit
    def head_ce(h, w, batch):
        def body(c, _):
            h2 = jnp.where(jnp.isfinite(c), h, h + 1)
            loss, (dh, dw) = hgfn(h2, w, batch)
            return loss + _pick((dh, dw), c), None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)[0]

    results["head_ce"] = _time(head_ce, h, w, batch)
    del h, w

    # -- optimizer update alone ---------------------------------------------
    # Carried opt state makes this naturally loop-dependent (mu/nu evolve).
    state = trainer.init_state(params)
    del params
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full(p.shape, 1e-4, p.dtype), state.params
    )

    @partial(jax.jit, donate_argnums=(0,))
    def adam_only(carry, grads):
        def body(carry, _):
            params, opt = carry
            updates, opt = trainer.tx.update(grads, opt, params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), params, updates
            )
            return (params, opt), None

        return jax.lax.scan(body, carry, None, length=STEPS)[0]

    carry = adam_only((state.params, state.opt_state), grads)
    _sync(carry)
    times = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        carry = adam_only(carry, grads)
        _sync(carry)
        times.append(time.perf_counter() - t0)
    results["adam"] = sorted(times)[TRIALS // 2] / STEPS
    state = None

    # -- full step (fresh state from the adam carry's params) ---------------
    trainer2 = Trainer(cfg, trainer.cfg)
    state = trainer2.init_state(carry[0])
    del carry, grads

    @partial(jax.jit, donate_argnums=(0,))
    def full(state, batch):
        def body(s, _):
            # Naturally loop-dependent through the carried params/opt state.
            s, m = trainer2._train_step_impl(s, batch)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=STEPS)

    state, losses = full(state, batch)
    _sync(losses)
    times = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        state, losses = full(state, batch)
        _sync(losses)
        times.append(time.perf_counter() - t0)
    results["full"] = sorted(times)[TRIALS // 2] / STEPS
    del state

    results_ms = {k: round(v * 1e3, 2) for k, v in results.items()}
    derived = {
        "bwd_ms": round((results["grad"] - results["fwd_loss"]) * 1e3, 2),
        "ce_fwd_ms": round((results["fwd_loss"] - results["fwd_only"]) * 1e3, 2),
        "full_minus_grad_adam_ms": round(
            (results["full"] - results["grad"] - results["adam"]) * 1e3, 2),
    }
    print(json.dumps({"components_ms": results_ms, "derived_ms": derived,
                      "batch": args.batch, "seq": args.seq,
                      "remat": args.remat,
                      "device": jax.devices()[0].device_kind}), flush=True)


if __name__ == "__main__":
    main()
