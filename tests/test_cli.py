"""CLI integration: train/eval for ASR and LM on the ci corpus, resume,
checkpoint averaging — the reference's test_training.sh analog."""
import os

import numpy as np
import pytest
import yaml

from neural_sp_tpu.bin.asr import train as asr_train
from neural_sp_tpu.bin.asr import eval as asr_eval
from neural_sp_tpu.bin.lm import train as lm_train
from neural_sp_tpu.bin.lm import eval as lm_eval


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from neural_sp_tpu.utils.ci_corpus import make_ci_corpus
    root = tmp_path_factory.mktemp("cli")
    return make_ci_corpus(str(root), n_train=16, n_dev=4, n_test=4,
                          max_words=3, seed=9)


@pytest.fixture(scope="module")
def asr_exp(corpus, tmp_path_factory):
    exp = str(tmp_path_factory.mktemp("exp_asr"))
    conf = dict(enc_type="blstm", enc_n_units=24, enc_n_layers=1,
                dec_type="lstm", dec_n_units=24, dec_n_layers=1, emb_dim=12,
                dec_bottleneck_dim=24, attn_dim=24, attn_conv_width=9,
                ctc_weight=0.3, lsm_prob=0.0, unit="char",
                batch_size=16, bucketing="sort", n_epochs=2,
                optimizer="adam", lr=3e-3, print_step=5,
                min_n_frames=1, max_n_frames=10000)
    conf_path = os.path.join(exp, "base.yml")
    os.makedirs(exp, exist_ok=True)
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    save_dir = asr_train.main([
        "--config", conf_path,
        "--train_set", corpus["train"], "--dev_set", corpus["dev"],
        "--dict", corpus["dict_char"], "--model_save_dir", exp])
    return save_dir


@pytest.mark.slow
def test_asr_train_cli_artifacts(asr_exp):
    assert os.path.exists(os.path.join(asr_exp, "conf.yml"))
    assert os.path.exists(os.path.join(asr_exp, "ckpt.epoch-2"))
    assert os.path.exists(os.path.join(asr_exp, "history.csv"))
    assert os.path.exists(os.path.join(asr_exp, "loss.png"))


@pytest.mark.slow
def test_asr_resume(asr_exp, corpus):
    save_dir = asr_train.main([
        "--config", os.path.join(asr_exp, "conf.yml"),
        "--train_set", corpus["train"], "--dev_set", corpus["dev"],
        "--dict", corpus["dict_char"], "--model_save_dir", asr_exp,
        "--resume", os.path.join(asr_exp, "ckpt.epoch-2"),
        "--n_epochs", "3"])
    assert os.path.exists(os.path.join(save_dir, "ckpt.epoch-3"))


@pytest.mark.slow
def test_asr_eval_cli(asr_exp, corpus, tmp_path):
    results = asr_eval.main([
        "--recog_model", asr_exp,
        "--recog_sets", corpus["test"],
        "--recog_beam_width", "2",
        "--recog_ctc_weight", "0.3",
        "--recog_n_average", "2",
        "--recog_dir", str(tmp_path)])
    m = list(results.values())[0]
    assert m["n_utts"] == 4 and 0 <= m["wer"]
    assert m["rtf"] > 0


@pytest.fixture(scope="module")
def lm_exp(corpus, tmp_path_factory):
    exp = str(tmp_path_factory.mktemp("exp_lm"))
    return lm_train.main([
        "--train_set", corpus["train_word"], "--dev_set", corpus["dev_word"],
        "--dict", corpus["dict_word"], "--model_save_dir", exp,
        "--lm_type", "lstm", "--unit", "word", "--n_units", "24",
        "--n_layers", "1", "--emb_dim", "12", "--batch_size", "4",
        "--bptt", "10", "--n_epochs", "2", "--lr", "3e-3"])


@pytest.mark.slow
def test_lm_train_and_eval_cli(lm_exp, corpus):
    assert os.path.exists(os.path.join(lm_exp, "ckpt.epoch-2"))
    results = lm_eval.main([
        "--recog_model", lm_exp, "--recog_sets", corpus["test_word"]])
    m = list(results.values())[0]
    assert m["ppl"] > 0 and np.isfinite(m["ppl"])


def test_model_name():
    from types import SimpleNamespace
    from neural_sp_tpu.bin.model_name import set_asr_model_name, set_lm_name
    name = set_asr_model_name(SimpleNamespace(
        enc_type="conv_conformer", conv_channels="32_32", enc_n_layers=12,
        transformer_d_model=512, dec_type="lstm", ctc_weight=0.3,
        lsm_prob=0.1, optimizer="noam", lr=5.0, batch_size=24000,
        n_freq_masks=2, freq_width=27, time_width=100, n_time_masks=2))
    assert "conformer" in name and "ctc0.3" in name
    assert "27FM2" in name and "100TM2" in name  # SpecAugment tokens
    assert set_lm_name(SimpleNamespace(lm_type="lstm", n_layers=2,
                                       n_units=1024, emb_dim=1024,
                                       bptt=64))


def test_parse_cli_multi_value_and_bare_flags():
    from neural_sp_tpu.bin.args import parse_cli
    args = parse_cli(["--recog_sets", "a.tsv", "b.tsv", "--recog_length_norm",
                      "--beam", "4"])
    assert args.recog_sets == ["a.tsv", "b.tsv"]
    assert args.recog_length_norm is True
    assert args.beam == 4


@pytest.mark.slow
def test_distillation_pipeline(asr_exp, corpus, tmp_path):
    """Teacher-student training (reference speech2text.py:347-367 +
    train.py teacher args): a fresh student trains against the asr_exp
    teacher's soft targets; loss stays finite and checkpoints appear."""
    exp = str(tmp_path / "student")
    save_dir = asr_train.main([
        "--config", os.path.join(asr_exp, "conf.yml"),
        "--train_set", corpus["train"], "--dev_set", corpus["dev"],
        "--dict", corpus["dict_char"], "--model_save_dir", exp,
        "--teacher", asr_exp, "--distillation_weight", "0.5",
        "--n_epochs", "1", "--resume", ""])
    assert os.path.exists(os.path.join(save_dir, "ckpt.epoch-1"))
    import csv
    with open(os.path.join(save_dir, "history.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows and np.isfinite(float(rows[-1]["dev_loss_mean"]))


@pytest.mark.slow
def test_mbr_training_pipeline(asr_exp, corpus, tmp_path):
    """MBR fine-tuning (reference train.py:489-504 + las.py:507-616):
    resume the trained model, run one MBR epoch with n-best WER risks and
    sub-epoch checkpoints."""
    exp = str(tmp_path / "mbr")
    import shutil
    os.makedirs(exp, exist_ok=True)
    save_dir = asr_train.main([
        "--config", os.path.join(asr_exp, "conf.yml"),
        "--train_set", corpus["train"], "--dev_set", corpus["dev"],
        "--dict", corpus["dict_char"], "--model_save_dir", exp,
        "--resume", os.path.join(asr_exp, "ckpt.epoch-2"),
        "--n_epochs", "3", "--mbr_training", "true",
        "--mbr_start_epoch", "3", "--mbr_nbest", "2",
        "--mbr_ckpt_interval", "1"])
    assert os.path.exists(os.path.join(save_dir, "ckpt.epoch-3"))
    subs = [d for d in os.listdir(save_dir) if "-step-" in d]
    assert subs, "sub-epoch MBR checkpoints missing"


@pytest.mark.slow
def test_asr_eval_cli_second_pass_and_oracle(asr_exp, lm_exp, corpus,
                                             tmp_path):
    """Second-pass LM rescoring + oracle WER through the eval CLI
    (reference bin/asr/eval.py:64-79)."""
    corpus_char_lm = lm_train.main([
        "--train_set", corpus["train"], "--dev_set", corpus["dev"],
        "--dict", corpus["dict_char"], "--model_save_dir",
        str(tmp_path / "lm_char"), "--lm_type", "lstm", "--unit", "char",
        "--n_units", "24", "--n_layers", "1", "--emb_dim", "12",
        "--batch_size", "4", "--bptt", "10", "--n_epochs", "1",
        "--lr", "3e-3"])
    results = asr_eval.main([
        "--recog_model", asr_exp,
        "--recog_sets", corpus["test"],
        "--recog_beam_width", "3", "--recog_n_best", "3",
        "--recog_lm_second", corpus_char_lm,
        "--recog_lm_second_weight", "0.2",
        "--recog_lm_bwd", corpus_char_lm,
        "--recog_lm_bwd_weight", "0.1",
        "--recog_dir", str(tmp_path)])
    m = list(results.values())[0]
    assert m["n_utts"] == 4 and np.isfinite(m["wer"])
    oracle = asr_eval.main([
        "--recog_model", asr_exp,
        "--recog_sets", corpus["test"],
        "--recog_beam_width", "3", "--recog_oracle", "true",
        "--recog_dir", str(tmp_path)])
    mo = list(oracle.values())[0]
    assert mo["oracle_wer"] <= m["wer"] + 1e-9


@pytest.mark.slow
def test_asr_eval_cli_streaming(corpus, tmp_path):
    """--recog_streaming dispatch through the eval CLI (reference
    evaluators/wordpiece.py:80-84): train a tiny streaming CTC model and
    run the block-sync streaming evaluation end-to-end."""
    exp = str(tmp_path / "stream")
    save_dir = asr_train.main([
        "--train_set", corpus["train"], "--dev_set", corpus["dev"],
        "--dict", corpus["dict_char"], "--model_save_dir", exp,
        "--enc_type", "uni_transformer", "--enc_n_layers", "1",
        "--transformer_d_model", "32", "--transformer_d_ff", "64",
        "--transformer_n_heads", "2",
        "--transformer_enc_pe_type", "relative",
        "--lc_chunk_size_left", "16", "--lc_chunk_size_current", "8",
        "--lc_chunk_size_right", "0", "--lc_type", "mask",
        "--dec_type", "lstm", "--ctc_weight", "1.0", "--unit", "char",
        "--batch_size", "16", "--n_epochs", "1", "--optimizer", "adam",
        "--lr", "3e-3", "--min_n_frames", "1", "--lsm_prob", "0"])
    results = asr_eval.main([
        "--recog_model", save_dir,
        "--recog_sets", corpus["test"],
        "--recog_beam_width", "2", "--recog_streaming", "true",
        "--recog_dir", str(tmp_path)])
    m = list(results.values())[0]
    assert m["n_utts"] == 4 and np.isfinite(m["wer"])
    assert m["rtf"] > 0 and "quantity_rate" in m


@pytest.mark.slow
def test_asr_eval_cli_ensemble(asr_exp, corpus, tmp_path):
    """Ensemble decoding through the eval CLI (reference las.py:1219-1237
    + eval ensemble loading): a second model's per-step log-probs are
    averaged into the beam."""
    exp2 = str(tmp_path / "member2")
    asr_train.main([
        "--config", os.path.join(asr_exp, "conf.yml"),
        "--train_set", corpus["train"], "--dev_set", corpus["dev"],
        "--dict", corpus["dict_char"], "--model_save_dir", exp2,
        "--seed", "7", "--n_epochs", "1", "--resume", ""])
    results = asr_eval.main([
        "--recog_model", asr_exp,
        "--recog_sets", corpus["test"],
        "--recog_beam_width", "2",
        "--recog_ensemble", exp2,
        "--recog_dir", str(tmp_path)])
    m = list(results.values())[0]
    assert m["n_utts"] == 4 and np.isfinite(m["wer"])


@pytest.mark.slow
def test_mtl_per_batch_and_sub_task(corpus, tmp_path):
    """Hierarchical MTL with per-batch task rotation (reference
    mtl_per_batch): main wp-style head + char sub1 CTC head, one task per
    batch round-robin."""
    exp = str(tmp_path / "mtl")
    save_dir = asr_train.main([
        "--train_set", corpus["train"], "--dev_set", corpus["dev"],
        "--dict", corpus["dict_char"], "--model_save_dir", exp,
        "--enc_type", "blstm", "--enc_n_units", "24", "--enc_n_layers", "1",
        "--dec_type", "lstm", "--dec_n_units", "24", "--dec_n_layers", "1",
        "--emb_dim", "12", "--dec_bottleneck_dim", "24", "--attn_dim", "24",
        "--attn_conv_width", "9", "--unit", "char",
        "--ctc_weight", "0.3", "--sub1_weight", "0.3",
        "--ctc_weight_sub1", "0.3", "--dict_sub1", corpus["dict_char"],
        "--unit_sub1", "char", "--enc_n_layers_sub1", "1",
        "--mtl_per_batch", "true",
        "--batch_size", "8", "--n_epochs", "1", "--optimizer", "adam",
        "--lr", "3e-3", "--min_n_frames", "1", "--lsm_prob", "0"])
    assert os.path.exists(os.path.join(save_dir, "ckpt.epoch-1"))
    import csv
    with open(os.path.join(save_dir, "history.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows and np.isfinite(float(rows[-1]["dev_loss_mean"]))


@pytest.mark.slow
def test_lm_train_mesh_dp(corpus, tmp_path):
    """LM training over the 8-device mesh (BPTT rows sharded over `data`,
    params replicated — the DDP analog for LMs)."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    exp = str(tmp_path / "lm_dp")
    save_dir = lm_train.main([
        "--train_set", corpus["train_word"], "--dev_set", corpus["dev_word"],
        "--dict", corpus["dict_word"], "--model_save_dir", exp,
        "--lm_type", "lstm", "--unit", "word", "--n_units", "24",
        "--n_layers", "1", "--emb_dim", "12", "--batch_size", "8",
        "--bptt", "10", "--n_epochs", "1", "--lr", "3e-3"])
    assert os.path.exists(os.path.join(save_dir, "ckpt.epoch-1"))
