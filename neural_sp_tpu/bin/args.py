"""Config/flag system (reference ``neural_sp/bin/args_asr.py``,
``args_lm.py``, ``args_common.py``): YAML config + overlay + CLI overrides,
using the reference's flag names so its recipe YAMLs translate directly.

Implementation: PyYAML + argparse (configargparse/OmegaConf-free). Any
``--key value`` pair overrides the YAML; unknown keys are kept (module-
specific args don't need pre-registration). Training saves ``conf.yml`` next
to checkpoints; eval reloads it and overlays ``recog_*`` flags
(reference args_asr.py:57-84).
"""
from __future__ import annotations

import os
import re
from types import SimpleNamespace

import yaml


def load_config(path: str) -> dict:
    """YAML 1.1 parses dot-less exponent literals (``1e-3``, common in the
    reference's recipe confs) as STRINGS; coerce number-like scalars so
    ``lr: 1e-3`` reaches the trainer as a float."""
    with open(path) as f:
        conf = yaml.safe_load(f) or {}
    exp = re.compile(r"^-?\d+(\.\d+)?[eE][+-]?\d+$")
    return {k: float(v) if isinstance(v, str) and exp.match(v) else v
            for k, v in conf.items()}


def save_config(conf: dict, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(
            {k: v for k, v in conf.items() if not k.startswith("_")}, f,
            default_flow_style=False)


def _parse_value(v: str):
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def parse_cli(argv: list[str], defaults: dict | None = None) -> SimpleNamespace:
    """--config base.yml [--config2 overlay.yml] [--key value ...]"""
    from ..utils.compile_cache import enable_compile_cache, preflight_or_exit
    enable_compile_cache()   # every CLI run after the first starts warm
    preflight_or_exit()      # NSP_PREFLIGHT=1: bail out of hung workers
    conf = dict(defaults or {})
    i = 0
    pending: dict = {}
    while i < len(argv):
        tok = argv[i]
        assert tok.startswith("--"), f"expected --flag, got {tok}"
        key = tok[2:].replace("-", "_")
        vals = []
        i += 1
        while i < len(argv) and not argv[i].startswith("--"):
            vals.append(_parse_value(argv[i]))
            i += 1
        if not vals:
            val = True           # bare flag
        elif len(vals) == 1:
            val = vals[0]
        else:
            val = vals           # multi-value flag (e.g. --recog_sets a b)
        pending[key] = val
    for ckey in ("config", "config2"):
        if ckey in pending:
            conf.update(load_config(str(pending.pop(ckey))))
    conf.update(pending)
    return SimpleNamespace(**conf)


TRAIN_DEFAULTS = dict(
    # data
    unit="wp", batch_size=32, batch_size_type="seq", dynamic_batching=False,
    bucketing="shuffle", min_n_frames=40, max_n_frames=2000,
    sort_stop_epoch=100,
    # model (encoder/decoder flags mirror the reference; see build_*)
    enc_type="conv_blstm", dec_type="lstm", input_dim=80,
    ctc_weight=0.0, bwd_weight=0.0, sub1_weight=0.0, sub2_weight=0.0,
    lsm_prob=0.1, ss_prob=0.0,
    # optim
    optimizer="adam", lr=1e-3, weight_decay=1e-6, clip_grad_norm=5.0,
    accum_grad_n_steps=1, n_epochs=25, warmup_n_steps=0,
    lr_factor=5.0, transformer_d_model=256,
    lr_decay_type="always", lr_decay_rate=0.9, lr_decay_start_epoch=10,
    lr_decay_patient_n_epochs=0, early_stop_patient_n_epochs=-1,
    print_step=100, metric="edit_distance",
    # mixed precision (reference AMP/apex O-levels, train.py:235-254):
    # "bfloat16" casts params+activations inside the loss; masters stay f32
    train_dtype="float32",
    # checkpointing
    n_keep_best_checkpoints=5, seed=1, resume="",
)


def parse_args_train(argv: list[str]) -> SimpleNamespace:
    return parse_cli(argv, TRAIN_DEFAULTS)


EVAL_DEFAULTS = dict(
    recog_beam_width=10, recog_max_len_ratio=1.0, recog_min_len_ratio=0.0,
    recog_length_penalty=0.0, recog_length_norm=False,
    recog_coverage_penalty=0.0, recog_coverage_threshold=0.0,
    recog_eos_threshold=1.5, recog_ctc_weight=0.0, recog_lm_weight=0.0,
    recog_ilm_weight=0.0, recog_softmax_smoothing=1.0,
    recog_n_average=1, recog_batch_size=1,
    # 'timit_39'/'timit_48': reduce phone hyps+refs to TIMIT scoring
    # classes before PER (reference examples/timit/s5/score.sh)
    recog_phone_map="",
)


def parse_args_eval(argv: list[str]) -> SimpleNamespace:
    """Loads the training conf.yml next to --recog_model, then overlays
    recog_* flags."""
    args = parse_cli(argv, EVAL_DEFAULTS)
    model_path = getattr(args, "recog_model", None)
    if model_path:
        conf_path = os.path.join(os.path.dirname(model_path), "conf.yml")
        if os.path.exists(conf_path):
            train_conf = load_config(conf_path)
            for k, v in train_conf.items():
                if not hasattr(args, k):
                    setattr(args, k, v)
    return args
