"""Deterministic experiment dir names from hyperparameters (reference
``neural_sp/bin/model_name.py:64-218``): the name encodes encoder/decoder
architecture, optimization, regularization, MTL weights, SpecAugment,
fusion, distillation, and MBR settings so experiment directories are
self-describing and collision-free.
"""
from __future__ import annotations


def _enc_tokens(g) -> list:
    enc = str(g("enc_type", "enc"))
    parts = [enc.replace("conv_", "")]
    if g("conv_channels") and enc.startswith("conv"):
        parts.append("conv" + str(g("conv_channels")).replace("_", ""))
    if "former" in enc or "transformer" in enc:
        parts += [f"{g('enc_n_layers', 0)}L",
                  f"{g('transformer_d_model', 0)}dmodel",
                  f"{g('transformer_d_ff', 0)}dff",
                  f"{g('transformer_n_heads', 0)}H",
                  str(g("transformer_enc_pe_type", "add")) + "pe"]
        if g("conformer_kernel_size", 0) and "conformer" in enc:
            parts.append(f"kernel{g('conformer_kernel_size')}")
        if g("transformer_enc_clamp_len", -1) not in (-1, None):
            parts.append(f"clamp{g('transformer_enc_clamp_len')}")
    else:
        parts += [f"{g('enc_n_layers', 0)}L", f"{g('enc_n_units', 0)}u"]
        if g("enc_n_projs", 0):
            parts.append(f"proj{g('enc_n_projs')}")
    if g("subsample") and any(int(s) > 1 for s in
                              str(g("subsample")).split("_") if s.isdigit()):
        parts.append(str(g("subsample_type", "drop")) +
                     str(g("subsample")).replace("_", ""))
    if g("lc_chunk_size_current", 0) or g("chunk_size_current", 0):
        parts.append(
            f"chunkL{g('lc_chunk_size_left', 0)}"
            f"C{g('lc_chunk_size_current', 0)}"
            f"R{g('lc_chunk_size_right', 0)}" +
            str(g("lc_type", "")))
    if g("n_stacks", 1) > 1:
        parts.append(f"stack{g('n_stacks')}")
    if g("n_splices", 1) > 1:
        parts.append(f"splice{g('n_splices')}")
    if g("sequence_summary_network", False):
        parts.append("ssn")
    return parts


def _dec_tokens(g) -> list:
    dec = str(g("dec_type", "lstm"))
    parts = [dec]
    if "transformer" in dec:
        parts += [f"{g('dec_n_layers', 0)}L"]
        if g("mocha_first_layer", 0):
            parts.append(f"mma{g('mocha_first_layer')}")
    else:
        parts += [f"{g('dec_n_layers', 0)}L", f"{g('dec_n_units', 0)}u"]
        at = g("attn_type", "location")
        parts.append(str(at))
        if at == "mocha":
            parts.append(f"w{g('mocha_chunk_size', 1)}"
                         f"H{g('mocha_n_heads_mono', 1)}")
            if g("mocha_quantity_loss_weight", 0):
                parts.append(f"qua{g('mocha_quantity_loss_weight')}")
            if g("mocha_latency_metric", "") or g("latency_metric", ""):
                parts.append(str(g("mocha_latency_metric", "") or
                                 g("latency_metric", "")) +
                             str(g("mocha_latency_loss_weight", 0) or
                                 g("latency_loss_weight", 0)))
    if g("ss_prob", 0) > 0:
        parts.append(f"ss{g('ss_prob')}")
    if g("zoneout", 0) > 0:
        parts.append(f"zoneout{g('zoneout')}")
    return parts


def set_asr_model_name(args) -> str:
    g = lambda k, d=None: getattr(args, k, d)
    parts = _enc_tokens(g)
    if g("ctc_weight", 0) < 1:
        parts += _dec_tokens(g)
    # optimization
    opt = str(g("optimizer", "adam"))
    parts.append(opt + ("_lr" + str(g("lr_factor", 0)) if opt == "noam"
                        else "_lr" + str(g("lr", 0))))
    parts.append(f"bs{g('batch_size', 0)}" + str(g("batch_size_type", ""))
                 if g("batch_size_type", "seq") != "seq"
                 else f"bs{g('batch_size', 0)}")
    if g("train_dtype", "float32") in ("bfloat16", "bf16"):
        parts.append("bf16")
    # regularization
    if g("lsm_prob", 0) > 0:
        parts.append(f"ls{g('lsm_prob')}")
    if g("warmup_n_steps", 0) > 0:
        parts.append(f"warmup{g('warmup_n_steps')}")
    if g("accum_grad_n_steps", 1) > 1:
        parts.append(f"accum{g('accum_grad_n_steps')}")
    # LM integration
    if g("lm_fusion", ""):
        parts.append(str(g("lm_fusion")))
    # MTL
    if g("ctc_weight", 0) > 0:
        parts.append(f"ctc{g('ctc_weight')}")
    if g("bwd_weight", 0) > 0:
        parts.append(f"bwd{g('bwd_weight')}")
    for sub in ("sub1", "sub2"):
        if g(f"{sub}_weight", 0) > 0:
            tok = f"{g(f'unit_{sub}', '')}{g(f'vocab_{sub}', 0)}"
            if g(f"ctc_weight_{sub}", 0) > 0:
                tok += f"ctc{g(f'ctc_weight_{sub}')}"
            if g(f"{sub}_weight", 0) - g(f"ctc_weight_{sub}", 0) > 0:
                tok += "fwd"
            parts.append(tok)
    # SpecAugment
    if g("n_freq_masks", 0) > 0:
        parts.append(f"{g('freq_width', 0)}FM{g('n_freq_masks')}")
    if g("n_time_masks", 0) > 0:
        if g("adaptive_number_ratio", 0) > 0:
            parts.append(f"pnum{g('adaptive_number_ratio')}")
        else:
            parts.append(f"{g('time_width', 0)}TM{g('n_time_masks')}")
        if g("adaptive_size_ratio", 0) > 0:
            parts.append(f"psize{g('adaptive_size_ratio')}")
    if g("input_noise_std", 0) > 0:
        parts.append("Inoise")
    if g("weight_noise_std", 0) > 0:
        parts.append("Wnoise")
    # contextualization
    if g("rsp_prob", 0) > 0:
        parts.append(f"rsp{g('rsp_prob')}")
    if g("mem_len", 0) > 0:
        parts.append(f"mem{g('mem_len')}")
    # pre-training / transfer
    if g("lm_init", ""):
        parts.append("lminit")
    if g("teacher", ""):
        parts.append(f"KD{g('distillation_weight', 0.5)}")
    if g("mbr_training", False):
        parts.append(f"MBR{g('mbr_nbest', 4)}best_ce{g('mbr_ce_weight', 0.01)}")
    return "_".join(str(p) for p in parts)


def set_lm_name(args) -> str:
    g = lambda k, d=None: getattr(args, k, d)
    parts = [g("lm_type", "lm"), f"{g('n_layers', 0)}L"]
    if g("lm_type") in ("lstm", "gru"):
        parts.append(f"{g('n_units', 0)}u")
        if g("n_projs", 0):
            parts.append(f"proj{g('n_projs')}")
        if g("residual", False):
            parts.append("residual")
        if g("use_glu", False):
            parts.append("glu")
    else:
        parts += [f"{g('transformer_d_model', 0)}dmodel",
                  f"{g('transformer_n_heads', 0)}H"]
        if g("mem_len", 0) > 0:
            parts.append(f"mem{g('mem_len')}")
    parts.append(f"emb{g('emb_dim', 0)}")
    if g("adaptive_softmax", False):
        parts.append("adaptiveSM")
    if g("tie_embedding", False):
        parts.append("tie")
    opt = str(g("optimizer", "adam"))
    parts.append(opt + "_lr" + str(g("lr_factor" if opt == "noam" else "lr",
                                     0)))
    parts.append(f"bs{g('batch_size', 0)}")
    parts.append(f"bptt{g('bptt', 0)}")
    if g("lsm_prob", 0) > 0:
        parts.append(f"ls{g('lsm_prob')}")
    if g("warmup_n_steps", 0) > 0:
        parts.append(f"warmup{g('warmup_n_steps')}")
    if g("backward", False):
        parts.append("bwd")
    if g("serialize", False):
        parts.append("serialize")
    if g("cache_size", 0) > 0:
        parts.append(f"cache{g('cache_size')}")
    return "_".join(str(p) for p in parts)
