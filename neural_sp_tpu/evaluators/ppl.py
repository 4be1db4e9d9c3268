"""LM perplexity evaluation over a BPTT stream (reference
``neural_sp/evaluators/ppl.py:32-110``), including the cache-model variant."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def eval_ppl(lm, params, dataset, batch_size_hint: int | None = None) -> dict:
    """Stream XE over the LMDataset; state carried across BPTT windows."""
    call = jax.jit(lambda p, xi, xo, st: lm.apply({"params": p}, xi, xo, st))
    state = None
    total_nll, total_tok = 0.0, 0
    for ys_in, ys_out in dataset:
        loss, state, obs = call(params, jnp.asarray(ys_in),
                                jnp.asarray(ys_out), state)
        n = int(np.sum(ys_out != 3))
        total_nll += float(jnp.log(obs["ppl"])) * n
        total_tok += n
    ppl = float(np.exp(total_nll / max(total_tok, 1)))
    return {"ppl": ppl, "n_tokens": total_tok}


def eval_ppl_cache(lm_session, token_stream: list[int]) -> dict:
    """Cache-model PPL on a flat token stream (reference ppl.py cache path)."""
    ppl = lm_session.ppl_with_cache(token_stream)
    return {"ppl": ppl, "n_tokens": len(token_stream)}
