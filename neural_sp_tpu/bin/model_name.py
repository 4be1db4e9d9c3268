"""Deterministic experiment dir names from hyperparameters (reference
``neural_sp/bin/model_name.py:64+``)."""
from __future__ import annotations


def set_asr_model_name(args) -> str:
    g = lambda k, d=None: getattr(args, k, d)
    parts = [g("enc_type", "enc")]
    if g("conv_channels") and "conv" in str(g("enc_type", "")):
        parts.append("conv" + str(g("conv_channels")).replace("_", ""))
    parts += [f"{g('enc_n_layers', 0)}L",
              f"{g('transformer_d_model') or g('enc_n_units', 0)}d"]
    parts.append(str(g("dec_type", "dec")))
    if g("ctc_weight", 0) > 0:
        parts.append(f"ctc{g('ctc_weight')}")
    if g("lsm_prob", 0) > 0:
        parts.append(f"ls{g('lsm_prob')}")
    parts.append(str(g("optimizer", "opt")) + f"_lr{g('lr', 0)}")
    parts.append(f"bs{g('batch_size', 0)}")
    if g("n_freq_masks", 0) or g("n_time_masks", 0):
        parts.append(f"specaug_F{g('freq_width', 0)}T{g('time_width', 0)}")
    return "_".join(str(p) for p in parts)


def set_lm_name(args) -> str:
    g = lambda k, d=None: getattr(args, k, d)
    parts = [g("lm_type", "lm"), f"{g('n_layers', 0)}L"]
    if g("lm_type") in ("lstm", "gru"):
        parts.append(f"{g('n_units', 0)}u")
    else:
        parts.append(f"{g('transformer_d_model', 0)}d")
    parts.append(f"emb{g('emb_dim', 0)}")
    if g("tie_embedding", False):
        parts.append("tie")
    parts.append(f"bptt{g('bptt', 0)}")
    return "_".join(str(p) for p in parts)
