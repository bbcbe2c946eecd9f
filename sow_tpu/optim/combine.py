"""Optimizer combinator: route top-level subtrees to different optimizers.

Used by the trainer's ``galore_embeddings`` option: embed/lm_head moments —
~90% of a SoW model's remaining optimizer HBM — go through GaLore's rank-r
projection while everything else keeps grouped AdamW. Generic over any
top-level key split.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence


class SplitState(NamedTuple):
    main: Any
    routed: Any


class SplitOptimizer(NamedTuple):
    init: Callable
    update: Callable
    reset_group: Callable


def split_optimizer(main_opt, routed_opt, routed_keys: Sequence[str]) -> SplitOptimizer:
    """``routed_keys`` (top-level dict keys) go to ``routed_opt``; the rest
    to ``main_opt``. ``main_opt`` must still see the full tree with routed
    leaves labeled frozen (zero updates + placeholder state) — the caller
    arranges its labels accordingly."""
    routed_keys = tuple(k for k in routed_keys)

    def _split(tree):
        routed = {k: tree[k] for k in routed_keys if k in tree}
        return tree, routed

    def init(params):
        full, routed = _split(params)
        return SplitState(main=main_opt.init(full), routed=routed_opt.init(routed))

    def update(grads, state: SplitState, params):
        g_full, g_routed = _split(grads)
        p_full, p_routed = _split(params)
        u_main, s_main = main_opt.update(g_full, state.main, p_full)
        u_routed, s_routed = routed_opt.update(g_routed, state.routed, p_routed)
        merged = dict(u_main)
        for k in u_routed:
            merged[k] = u_routed[k]
        return merged, SplitState(main=s_main, routed=s_routed)

    def reset_group(state: SplitState, group: str = "sow") -> SplitState:
        return SplitState(main=main_opt.reset_group(state.main, group), routed=state.routed)

    return SplitOptimizer(init=init, update=update, reset_group=reset_group)
