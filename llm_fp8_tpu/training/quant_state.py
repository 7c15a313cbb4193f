"""Per-layer delayed-scaling state for FP8 training.

The functional replacement for TE's per-module amax/scale buffers
(``amax_history_len=16, amax_compute_algo="max"``, reference
``train_fp8.py:159-165``): one :class:`ScaleState` per (layer, GEMM site,
tensor class), stacked over layers, stored in the train state, and updated
once per step from the amaxes the forward/backward pass reports.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from llm_fp8_tpu.models.config import ModelConfig
from llm_fp8_tpu.models.llama import DOT_SITES, SITE_ROLE
from llm_fp8_tpu.quant import RecipeSet
from llm_fp8_tpu.quant.delayed import ScaleState, observe_amax
from llm_fp8_tpu.quant.dot import DotAmaxes

__all__ = [
    "init_train_quant_state",
    "forward_scales",
    "make_sinks",
    "update_quant_state",
]


def _stacked_state(num_layers: int, history_len: int) -> ScaleState:
    return ScaleState(
        history=jnp.zeros((num_layers, history_len), jnp.float32),
        scale=jnp.ones((num_layers,), jnp.float32),
    )


def init_train_quant_state(
    cfg: ModelConfig, recipes: RecipeSet
) -> Dict[str, Dict[str, ScaleState]]:
    """{site: {"x"/"w"/"g": stacked ScaleState}} for every quantized site."""
    state: Dict[str, Dict[str, ScaleState]] = {}
    for site in DOT_SITES:
        recipe = recipes.for_role(SITE_ROLE[site])
        if recipe is None or recipe.granularity != "tensor":
            # Only per-tensor recipes carry delayed state; block (MX) and
            # per-channel scales are just-in-time per step.
            continue
        state[site] = {
            t: _stacked_state(cfg.num_layers, recipe.amax_history_len)
            for t in ("x", "w", "g")
        }
    return state


def forward_scales(
    qstate: Dict[str, Dict[str, ScaleState]], cfg: ModelConfig
) -> Dict[str, Tuple[jax.Array, jax.Array]]:
    """Per-site (x_scale [L], w_scale [L]) to feed ``forward_fp8_train``."""
    ones = jnp.ones((cfg.num_layers,), jnp.float32)
    out = {}
    for site in DOT_SITES:
        if site in qstate:
            out[site] = (qstate[site]["x"].scale, qstate[site]["w"].scale)
        else:
            out[site] = (ones, ones)
    return out


def make_sinks(cfg: ModelConfig) -> Dict[str, jax.Array]:
    """Zero-valued amax sinks; their gradients carry backward amaxes out."""
    return {s: jnp.zeros((cfg.num_layers,), jnp.float32) for s in DOT_SITES}


def update_quant_state(
    qstate: Dict[str, Dict[str, ScaleState]],
    amaxes: Dict[str, DotAmaxes],
    g_amaxes: Dict[str, jax.Array],
    recipes: RecipeSet,
) -> Dict[str, Dict[str, ScaleState]]:
    """Fold this step's amax observations into the delayed state.

    ``amaxes[site]`` are stacked [L] (from the forward scan);
    ``g_amaxes[site]`` [L] are the sink gradients (backward amaxes).
    """
    new = {}

    def _finite(a):
        # A non-finite amax would make the scale inf and dequant NaN; with
        # amax_compute='max' the poisoned history then regenerates itself.
        # Dropping the observation (0 never wins the max) is the safe fold.
        return jnp.where(jnp.isfinite(a), a, 0.0)

    for site, st in qstate.items():
        recipe = recipes.for_role(SITE_ROLE[site])
        obs = {
            "x": _finite(amaxes[site].x),
            "w": _finite(amaxes[site].w),
            "g": _finite(g_amaxes[site]),
        }
        fmts = {"x": recipe.fmt_fwd, "w": recipe.fmt_fwd, "g": recipe.fmt_bwd}
        new[site] = {
            t: jax.vmap(
                lambda s_hist, s_scale, a, fmt=fmts[t]: observe_amax(
                    ScaleState(s_hist, s_scale), a, fmt,
                    amax_compute=recipe.amax_compute, margin=recipe.margin,
                )
            )(st[t].history, st[t].scale, obs[t])
            for t in ("x", "w", "g")
        }
    return new
