"""Teacher-forcing accuracy evaluator (reference
``neural_sp/evaluators/accuracy.py``)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def eval_accuracy(model, params, loader) -> dict:
    call = jax.jit(lambda xs, xlens, ys, ylens: model.apply(
        {"params": params}, xs, xlens, ys, ylens))
    accs, n = [], 0
    for batch in loader:
        _, obs = call(jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"]),
                      jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"]))
        if "acc_att" in obs:
            accs.append(float(obs["acc_att"]))
        n += len(batch["utt_ids"])
    return {"accuracy": float(np.mean(accs)) if accs else 0.0, "n_utts": n}
