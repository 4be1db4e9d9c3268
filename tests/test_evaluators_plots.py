"""Evaluator long tail + plot/align CLIs + corpus prep utilities."""
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

RNG = jax.random.PRNGKey(0)


def test_corpus_bleu():
    from neural_sp_tpu.evaluators.bleu import corpus_bleu
    refs = [["the", "cat", "sat"], ["a", "dog", "ran", "far"]]
    assert corpus_bleu(refs, refs) == pytest.approx(100.0)
    assert corpus_bleu(refs, [["x"], ["y"]]) == 0.0
    mid = corpus_bleu(refs, [["the", "cat", "sat"], ["a", "dog", "ran"]])
    assert 0 < mid < 100


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from neural_sp_tpu.utils.ci_corpus import make_ci_corpus
    from neural_sp_tpu.datasets.asr.build import build_dataloader
    from neural_sp_tpu.models.speech2text import build_speech2text
    root = tmp_path_factory.mktemp("evals")
    paths = make_ci_corpus(str(root), n_train=8, n_dev=4, n_test=4,
                           max_words=2, seed=13)
    loader = build_dataloader(paths["dev"], paths["dict_char"], unit="char",
                              batch_size=4, is_test=True)
    args = SimpleNamespace(enc_type="blstm", input_dim=80, enc_n_units=16,
                           enc_n_layers=1, dec_type="lstm", dec_n_units=16,
                           dec_n_layers=1, emb_dim=8, dec_bottleneck_dim=16,
                           attn_dim=16, attn_conv_width=9,
                           vocab=loader.vocab, ctc_weight=0.3)
    model = build_speech2text(args)
    b = next(iter(loader))
    v = model.init(RNG, jnp.asarray(b["xs"]), jnp.asarray(b["xlens"]),
                   jnp.asarray(b["ys"]), jnp.asarray(b["ylens"]))
    return model, v["params"], loader, paths


def test_eval_accuracy(tiny_setup):
    from neural_sp_tpu.evaluators.accuracy import eval_accuracy
    model, params, loader, _ = tiny_setup
    m = eval_accuracy(model, params, loader)
    assert 0 <= m["accuracy"] <= 100 and m["n_utts"] == 4


def test_eval_oracle_and_length_bins(tiny_setup):
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    from neural_sp_tpu.evaluators.asr import (
        eval_oracle_wer, eval_wer_by_length, eval_unit)
    model, params, loader, _ = tiny_setup
    sess = Speech2TextSession(model, params,
                              DecodeConfig(beam_width=3, n_best=3))
    base = eval_unit(sess, loader, "char")
    oracle = eval_oracle_wer(sess, loader)
    assert oracle["oracle_wer"] <= base["wer"] + 1e-6
    bins = eval_wer_by_length(sess, loader, bins=(0, 5, 10**9))
    assert len(bins) == 2


def test_plot_clis(tiny_setup, tmp_path):
    from neural_sp_tpu.bin.asr.plot_attention import plot_attention_for_batch
    from neural_sp_tpu.bin.asr.plot_ctc import plot_ctc_for_batch
    model, params, loader, _ = tiny_setup
    batch = next(iter(loader))
    p1 = plot_attention_for_batch(model, params, batch, str(tmp_path / "att"))
    p2 = plot_ctc_for_batch(model, params, batch, str(tmp_path / "ctc"))
    import os
    assert all(os.path.exists(p) for p in p1 + p2) and len(p1) == 4


def test_make_dataset_pipeline(tmp_path):
    from neural_sp_tpu.utils.io import write_wav
    from neural_sp_tpu.utils.make_dataset import (
        extract_features, make_vocab, make_tsv, compute_oov_rate)
    from neural_sp_tpu.datasets.asr.build import build_dataloader
    rng = np.random.default_rng(0)
    wav_scp = {}
    utts = []
    for i in range(4):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, rng.standard_normal(8000).astype(np.float32) * 0.1)
        wav_scp[f"u{i}"] = p
        utts.append({"utt_id": f"u{i}", "speaker": "s0",
                     "text": ["ab cd", "cd ef", "ab ef", "ef ab"][i]})
    feat_paths, feat_lens, cmvn = extract_features(
        wav_scp, str(tmp_path / "feats"))
    dict_path = make_vocab([u["text"] for u in utts], "char",
                           str(tmp_path / "dict.txt"))
    tsv = make_tsv(utts, feat_paths, feat_lens, dict_path, "char",
                   str(tmp_path / "train.tsv"))
    loader = build_dataloader(tsv, dict_path, unit="char", batch_size=4)
    b = next(iter(loader))
    assert b["xs"].shape[0] >= 4 and b["xs"].shape[2] == 80
    word_dict = make_vocab([u["text"] for u in utts], "word",
                           str(tmp_path / "dict_word.txt"))
    oov = compute_oov_rate(["ab zz"], word_dict)
    assert oov == 50.0


def test_forced_align_cli_shape(tiny_setup, tmp_path):
    import jax.numpy as jnp
    model, params, loader, _ = tiny_setup
    batch = next(iter(loader))
    eouts, _ = model.apply({"params": params}, jnp.asarray(batch["xs"]),
                           jnp.asarray(batch["xlens"]), method=model.encode)
    trig = model.apply(
        {"params": params}, eouts["ys"]["xs"], eouts["ys"]["xlens"],
        jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"]),
        method=lambda m, *a: m.ctc.trigger_points(*a))
    assert trig.shape == batch["ys"].shape


def test_plot_cache_weights(tmp_path):
    from neural_sp_tpu.models.lm.rnnlm import RNNLM
    from neural_sp_tpu.models.lm.session import LMSession
    from neural_sp_tpu.bin.lm.plot_cache import plot_cache_weights
    lm = RNNLM(vocab=12, n_units=8, n_layers=1, emb_dim=8)
    ys = jnp.ones((1, 4), jnp.int32)
    v = lm.init(RNG, ys, ys)
    sess = LMSession(lm, v["params"], cache_size=8)
    p = plot_cache_weights(sess, [2, 4, 5, 6, 7, 4, 5, 6] * 3,
                           str(tmp_path / "cache.png"), n_tokens=16)
    import os
    assert os.path.exists(p)


def test_example_configs_parse_and_build():
    """Every example YAML must parse and build a model/LM."""
    import glob, yaml
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.lm.build import build_lm
    n_asr = n_lm = n_data = 0
    for path in glob.glob("examples/*/conf/**/*.yaml", recursive=True):
        with open(path) as f:
            conf = yaml.safe_load(f)
        conf["vocab"] = 50
        conf["input_dim"] = 80
        args = SimpleNamespace(**conf)
        if "lm_type" in conf or "/lm/" in path:
            conf.setdefault("lm_type", "lstm")
            lm = build_lm(SimpleNamespace(**conf))
            assert lm is not None, path
            n_lm += 1
        elif "enc_type" not in conf:
            # data/decoding overlays (conf/data/*.yaml): no model topology
            assert "/data/" in path or not any(
                k.startswith(("enc_", "dec_")) for k in conf), path
            n_data += 1
        else:
            model = build_speech2text(args)
            assert model is not None, path
            n_asr += 1
    assert n_asr > 100 and n_lm > 15 and n_data > 20, (n_asr, n_lm, n_data)
