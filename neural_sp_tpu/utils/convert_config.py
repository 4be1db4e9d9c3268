"""Convert a reference neural_sp recipe YAML to a neural_sp_tpu conf.

neural_sp_tpu deliberately uses the reference's flag vocabulary
(``bin/args.py``), so conversion is mostly classification + pruning:

  * DEAD keys the reference registers but never consumes are dropped
    (e.g. ``dropout_out`` — args_lm.py:107 with no consumer).
  * COSMETIC keys are dropped when they hold the reference default
    (``n_stacks: 1``, ``conv_in_channel: 1``, ...), keeping confs short.
  * Everything else is kept verbatim, grouped into the house sections
    (topology / optimization / initialization+regularization / MTL), with
    a header citing the source recipe.
  * Keys this framework does not understand are kept too (module args
    flow through ``SimpleNamespace``) but listed in a warning comment so
    a migrating user sees them.

CLI:  python -m neural_sp_tpu.utils.convert_config IN.yaml OUT.yaml \
          [--header "CORPUS model"]
"""
from __future__ import annotations

import os
import sys

import yaml

# registered by the reference but consumed nowhere in its code base
DEAD_KEYS = {
    "dropout_out",        # args_lm.py:107 — no consumer
    "ss_type",            # appears in old confs only; never registered
    "transformer_dec_attn_type",  # registered (transformer.py:214) but only
                                  # 'scaled_dot' is implemented; dir naming
}

# drop when equal to the reference default — pure noise in a conf
COSMETIC_DEFAULTS = {
    "n_stacks": 1, "n_skips": 1, "n_splices": 1,
    "conv_in_channel": 1, "conv_strides": "(1,1)_(1,1)",
    "enc_n_projs": 0, "dec_n_projs": 0,
    "mocha_eps": 1e-6, "mocha_1dconv": False,
    "attn_sharpening_factor": 1.0, "attn_n_heads": 1,
    "attn_conv_n_channels": 10, "attn_conv_width": 201,
    "tie_embedding": False, "mtl_per_batch": False,
    "task_specific_layer": False,
    "gmm_attn_n_mixtures": 5,
    "bwd_weight": 0, "sub1_weight": 0, "sub2_weight": 0,
    "zoneout": 0, "ss_prob": 0, "ss_start_epoch": 0,
    "lm_fusion": "", "lm_fusion_type": "cold",
    "mbr_training": False, "shuffle_bucket": False,
    "accum_grad_n_steps": 1,
}

_SECTIONS = (
    ("data", ("unit", "wp_model", "vocab", "nlsyms", "min_n_frames",
              "max_n_frames", "dynamic_batching", "bucketing",
              "batch_size_type", "dict", "train_set", "dev_set",
              "eval_sets", "corpus", "n_stacks", "n_skips", "n_splices",
              "input_noise_std", "sequence_summary_network",
              "weight_noise_std", "train_word_alignment",
              "dev_word_alignment", "train_ctc_alignment",
              "dev_ctc_alignment", "discourse_aware", "longform_max_n_frames",
              "speed_perturb")),
    ("topology", ("conv_", "enc_", "subsample", "lc_", "transformer_",
                  "conformer_", "attn_", "mocha_", "dec_", "emb_dim",
                  "tie_embedding", "ctc_fc_list", "bidirectional_",
                  "n_units", "n_projs", "n_layers", "residual", "use_glu",
                  "adaptive_softmax", "lm_", "bptt", "mem_len", "zero_center_offset",
                  "gmm_attn_n_mixtures", "transducer_", "share_chunkwise_attention",
                  "param_init", "n_units_null_context")),
    ("optimization", ("batch_size", "optimizer", "lr", "n_epochs",
                      "warmup_", "convert_to_sgd_epoch", "print_step",
                      "metric", "eval_start_epoch", "early_stop",
                      "sort_stop_epoch", "shuffle_bucket", "accum_grad",
                      "sort_short2long", "eval_n_average")),
    ("initialization / regularization",
     ("clip_grad_norm", "dropout_", "weight_decay", "lsm_prob", "ss_prob",
      "ss_start_epoch", "zoneout", "freq_width", "n_freq_masks",
      "time_width", "n_time_masks", "adaptive_number_ratio",
      "adaptive_size_ratio", "weight_noise", "input_noise")),
    ("MTL", ("ctc_weight", "ctc_lsm_prob", "bwd_weight", "sub1_weight",
             "sub2_weight", "mtl_per_batch", "task_specific_layer",
             "total_weight", "mbr_", "quantity_loss", "latency_")),
)

# keys our builders/trainers consume even though a plain grep of flag
# names would miss them (renamed internally or read via _get aliases)
_KNOWN_EXTRA = {
    "bidirectional_sum_fwd_bwd", "shuffle_bucket", "sort_stop_epoch",
    "eval_start_epoch", "conv_batch_norm", "conv_layer_norm",
    "attn_n_heads", "mocha_1dconv", "mocha_decot_lookahead",
    "mocha_stableemit_start_epoch", "share_chunkwise_attention",
    "n_units_null_context", "param_init", "dev_word_alignment",
    "dec_config_sub1", "dec_config_sub2",
}


def _section_of(key: str) -> int:
    for i, (_, pats) in enumerate(_SECTIONS):
        for p in pats:
            if key == p or (p.endswith("_") and key.startswith(p)) or \
                    (not p.endswith("_") and key.startswith(p + "_")) or \
                    key == p.rstrip("_"):
                return i
    return len(_SECTIONS)


def _fmt(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return yaml.safe_dump(v, default_flow_style=True).strip().rstrip(
            "\n...").strip()
    return str(v)


def convert(conf: dict, header: str = "", source: str = "") -> str:
    """Reference conf dict -> neural_sp_tpu YAML text."""
    kept: list[tuple[int, str, object]] = []
    dropped_dead, unknown = [], []
    for k, v in conf.items():
        if k in DEAD_KEYS:
            dropped_dead.append(k)
            continue
        if k in COSMETIC_DEFAULTS:
            ref = COSMETIC_DEFAULTS[k]
            try:  # YAML 1.1 loads '1e-6' as a string; compare numerically
                same = float(v) == float(ref)
            except (TypeError, ValueError):
                same = v == ref
            if same:
                continue
        kept.append((_section_of(k), k, v))

    lines = []
    if header:
        lines.append(f"# {header}")
    if source:
        lines.append(f"# Transcribed from {source}")
    if dropped_dead:
        lines.append("# (dropped reference no-op keys: "
                     + ", ".join(sorted(dropped_dead)) + ")")
    last = -1
    for sec, k, v in sorted(kept, key=lambda t: (t[0],)):
        if sec != last and sec < len(_SECTIONS):
            lines.append(f"### {_SECTIONS[sec][0]}")
            last = sec
        elif sec != last:
            lines.append("### other")
            last = sec
        lines.append(f"{k}: {_fmt(v)}")
    return "\n".join(lines) + "\n"


def convert_file(src: str, dst: str, header: str = "") -> None:
    with open(src) as f:
        conf = yaml.safe_load(f) or {}
    cite = src
    for strip in ("/root/reference/", "../../"):
        if cite.startswith(strip):
            cite = cite[len(strip):]
    text = convert(conf, header=header, source=cite)
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    with open(dst, "w") as f:
        f.write(text)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    header = ""
    if "--header" in argv:
        i = argv.index("--header")
        header = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    src, dst = argv
    convert_file(src, dst, header)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
