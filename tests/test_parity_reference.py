"""Numerical parity vs the reference torch implementation (CPU).

Instantiates modules from /root/reference/neural_sp, copies converted
weights into the JAX modules, and asserts outputs match within tolerance —
the only WER-parity evidence obtainable without the corpora (VERDICT r2
next-step #2). Torch runs in eval mode, f32, dropout 0.
"""
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
torch = pytest.importorskip("torch")

RNG = jax.random.PRNGKey(0)
ATOL = 2e-4
RTOL = 2e-4


def t2np(x):
    return x.detach().cpu().numpy()


def lin(mod, has_bias=True):
    """torch nn.Linear -> flax Dense params."""
    p = {"kernel": t2np(mod.weight).T}
    if has_bias and mod.bias is not None:
        p["bias"] = t2np(mod.bias)
    return p


def ln(mod):
    return {"scale": t2np(mod.weight), "bias": t2np(mod.bias)}


def zeros_like_tree(tree):
    return jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), tree)


def merge(base, override):
    """Recursively overwrite entries of ``base`` with ``override``."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            out[k] = merge(base[k], v)
        else:
            out[k] = v
    return out


def rel_mha_params(ref, xl_like, base):
    """Map reference RelativeMultiheadAttentionMechanism weights onto our
    RelativeMultiheadAttention (biases zeroed — reference uses bias=False)."""
    p = zeros_like_tree(base)  # zero all (incl. our Dense biases)
    upd = {
        "w_query": lin(ref.w_query, False),
        "w_key": lin(ref.w_key, False),
        "w_value": lin(ref.w_value, False),
        "w_out": lin(ref.w_out, False),
    }
    if xl_like:
        upd["w_pos"] = lin(ref.w_pos, False)
    return merge(p, upd)


# --------------------------------------------------------------- rel-MHA --
@pytest.mark.parametrize("xl_like,clamp", [(False, 3), (False, -1),
                                           (True, 3), (True, -1)])
def test_rel_mha_parity(xl_like, clamp):
    from neural_sp.models.modules.relative_multihead_attention import (
        RelativeMultiheadAttentionMechanism as RefRelMHA)
    from neural_sp.models.modules.positional_embedding import (
        XLPositionalEmbedding)
    from neural_sp_tpu.models.modules.relative_multihead_attention import (
        RelativeMultiheadAttention)

    d, h, bs, t = 16, 4, 2, 10
    torch.manual_seed(0)
    ref = RefRelMHA(kdim=d, qdim=d, adim=d, odim=d, n_heads=h, dropout=0.0,
                    bias=False, param_init="xavier_uniform",
                    xl_like=xl_like, clamp_len=clamp).eval()
    pe = XLPositionalEmbedding(d, dropout=0.0).eval()

    x = torch.randn(bs, t, d)
    with torch.no_grad():
        _, pos_embs = pe(x, scale=False)
        if xl_like:
            u_bias = torch.randn(h, d // h) * 0.1
            v_bias = torch.randn(h, d // h) * 0.1
            cv_ref, aw_ref = ref(x, x, pos_embs, None, u_bias, v_bias)
        else:
            u_bias = v_bias = None
            cv_ref, aw_ref = ref(x, x, pos_embs, None)

    ours = RelativeMultiheadAttention(d_model=d, n_heads=h,
                                      clamp_len=clamp, xl_like=xl_like)
    xs = jnp.asarray(t2np(x))
    v0 = ours.init(RNG, xs)
    p = rel_mha_params(ref, xl_like, v0["params"])
    if xl_like:
        p["u_bias"] = t2np(u_bias)
        p["v_bias"] = t2np(v_bias)
    out, _, aws = ours.apply({"params": p}, xs, return_weights=True)
    np.testing.assert_allclose(np.asarray(out), t2np(cv_ref),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(aws), t2np(aw_ref),
                               rtol=RTOL, atol=ATOL)


def test_rel_mha_parity_streaming_cache():
    """qlen != klen (streaming with KV cache): same math as the reference's
    qlen!=klen rel-shift branch."""
    from neural_sp.models.modules.relative_multihead_attention import (
        RelativeMultiheadAttentionMechanism as RefRelMHA)
    from neural_sp.models.modules.positional_embedding import (
        XLPositionalEmbedding)
    from neural_sp_tpu.models.modules.relative_multihead_attention import (
        RelativeMultiheadAttention)

    d, h, bs, t, mlen = 16, 2, 1, 4, 6
    torch.manual_seed(1)
    ref = RefRelMHA(kdim=d, qdim=d, adim=d, odim=d, n_heads=h, dropout=0.0,
                    bias=False, param_init="xavier_uniform",
                    xl_like=False, clamp_len=-1).eval()
    pe = XLPositionalEmbedding(d, dropout=0.0).eval()

    cat = torch.randn(bs, mlen + t, d)  # memory + current
    with torch.no_grad():
        _, pos_embs = pe(cat[:, -t:], scale=False, n_cache=mlen)
        cv_ref, _ = ref(cat, cat[:, -t:], pos_embs, None)

    ours = RelativeMultiheadAttention(d_model=d, n_heads=h, clamp_len=-1,
                                      xl_like=False)
    xs_all = jnp.asarray(t2np(cat))
    v0 = ours.init(RNG, xs_all[:, -t:], key=xs_all)
    p = rel_mha_params(ref, False, v0["params"])
    out, _, _ = ours.apply({"params": p}, xs_all[:, -t:], key=xs_all)
    np.testing.assert_allclose(np.asarray(out), t2np(cv_ref),
                               rtol=RTOL, atol=ATOL)


# ------------------------------------------------------------------ FFN --
@pytest.mark.parametrize("act", ["relu", "swish"])
def test_ffn_parity(act):
    from neural_sp.models.modules.positionwise_feed_forward import (
        PositionwiseFeedForward as RefFFN)
    from neural_sp_tpu.models.modules.feed_forward import FFN

    d, dff = 12, 32
    torch.manual_seed(0)
    ref = RefFFN(d, dff, dropout=0.0, activation=act, param_init="").eval()
    x = torch.randn(2, 7, d)
    with torch.no_grad():
        y_ref = ref(x)
    ours = FFN(d, dff, activation=act)
    p = {"w1": lin(ref.w_1), "w2": lin(ref.w_2)}
    y = ours.apply({"params": p}, jnp.asarray(t2np(x)))
    np.testing.assert_allclose(np.asarray(y), t2np(y_ref),
                               rtol=RTOL, atol=ATOL)


# -------------------------------------------------------- conformer conv --
def conv_params(ref, base):
    p = zeros_like_tree(base)
    upd = {
        "pointwise1": {"kernel": t2np(ref.pointwise_conv1.weight)[:, :, 0].T,
                       "bias": t2np(ref.pointwise_conv1.bias)},
        "pointwise2": {"kernel": t2np(ref.pointwise_conv2.weight)[:, :, 0].T,
                       "bias": t2np(ref.pointwise_conv2.bias)},
        # torch depthwise [D,1,K] -> flax [K,1,D]
        "depthwise": {"kernel": t2np(ref.depthwise_conv.weight)
                      .transpose(2, 1, 0),
                      "bias": t2np(ref.depthwise_conv.bias)},
        "norm": ln(ref.norm),
    }
    return merge(p, upd)


@pytest.mark.parametrize("causal", [False, True])
def test_conformer_conv_parity(causal):
    from neural_sp.models.modules.conformer_convolution import (
        ConformerConvBlock as RefConv)
    from neural_sp_tpu.models.modules.conformer_convolution import (
        ConformerConvBlock)

    d, k = 12, 5
    torch.manual_seed(0)
    ref = RefConv(d, k, param_init="", normalization="layer_norm",
                  causal=causal).eval()
    x = torch.randn(2, 9, d)
    with torch.no_grad():
        y_ref = ref(x)
    ours = ConformerConvBlock(d_model=d, kernel_size=k, causal=causal,
                              normalization="layer_norm")
    xs = jnp.asarray(t2np(x))
    v0 = ours.init(RNG, xs)
    p = conv_params(ref, v0["params"])
    y, _ = ours.apply({"params": p}, xs)
    np.testing.assert_allclose(np.asarray(y), t2np(y_ref),
                               rtol=RTOL, atol=ATOL)


# ------------------------------------------------------- conformer block --
def test_conformer_block_parity():
    """Full pre-norm conformer block (macaron FFN -> rel-MHA -> conv ->
    FFN -> final LN) with copied weights — the flagship encoder layer."""
    from neural_sp.models.seq2seq.encoders.conformer_block import (
        ConformerEncoderBlock as RefBlock)
    from neural_sp.models.modules.positional_embedding import (
        XLPositionalEmbedding)
    from neural_sp_tpu.models.encoders.transformer import EncoderBlock

    d, dff, h, k, bs, t = 16, 32, 4, 5, 2, 10
    torch.manual_seed(0)
    ref = RefBlock(d, dff, h, k, dropout=0.0, dropout_att=0.0,
                   dropout_layer=0.0, layer_norm_eps=1e-6,
                   ffn_activation="swish", param_init="",
                   pe_type="relative", clamp_len=-1, ffn_bottleneck_dim=0,
                   unidirectional=False, normalization="layer_norm").eval()
    pe = XLPositionalEmbedding(d, dropout=0.0).eval()
    x = torch.randn(bs, t, d)
    with torch.no_grad():
        _, pos_embs = pe(x, scale=False)
        out = ref(x, xx_mask=None, pos_embs=pos_embs,
                  rel_bias=(None, None))
        y_ref = out[0] if isinstance(out, tuple) else out

    ours = EncoderBlock(d_model=d, d_ff=dff, n_heads=h, btype="conformer",
                        pe_type="relative", clamp_len=-1,
                        ffn_activation="swish", conv_kernel_size=k,
                        conv_normalization="layer_norm")
    xs = jnp.asarray(t2np(x))
    v0 = ours.init(RNG, xs)
    p = zeros_like_tree(v0["params"])
    upd = {
        "norm_ff_macaron": ln(ref.norm1),
        "ff_macaron": {"w1": lin(ref.feed_forward_macaron.w_1),
                       "w2": lin(ref.feed_forward_macaron.w_2)},
        "norm_mha": ln(ref.norm2),
        "mha": rel_mha_params(ref.self_attn, False,
                              p["mha"]),
        "norm_conv": ln(ref.norm3),
        "conv": conv_params(ref.conv, p["conv"]),
        "norm_ff": ln(ref.norm4),
        "ff": {"w1": lin(ref.feed_forward.w_1),
               "w2": lin(ref.feed_forward.w_2)},
        "norm_final": ln(ref.norm5),
    }
    p = merge(p, upd)
    y, _, _ = ours.apply({"params": p}, xs)
    np.testing.assert_allclose(np.asarray(y), t2np(y_ref),
                               rtol=1e-3, atol=1e-3)


# ------------------------------------------------------------- MoChA ----
def weight_norm_eff(v_mod):
    """Effective matrix of a torch weight-normed Linear: g * v/||v||."""
    g = t2np(v_mod.weight_g)           # [H, 1]
    vv = t2np(v_mod.weight_v)          # [H, A]
    return g * vv / np.linalg.norm(vv, axis=1, keepdims=True)


def mocha_params(ref, base, chunked):
    p = zeros_like_tree(base)
    me = {
        "w_key": lin(ref.monotonic_energy.w_key),
        "w_query": lin(ref.monotonic_energy.w_query, False),
        "v": weight_norm_eff(ref.monotonic_energy.v),
        "r": t2np(ref.monotonic_energy.r).reshape(-1),
    }
    upd = {"monotonic_energy": me}
    if hasattr(ref, "w_value"):  # multihead only
        upd["w_value"] = lin(ref.w_value)
        upd["w_out"] = lin(ref.w_out)
    if chunked:
        upd["chunk_energy"] = {
            "w_key": lin(ref.chunk_energy.w_key),
            "w_query": lin(ref.chunk_energy.w_query, False),
            "v": lin(ref.chunk_energy.v, False)["kernel"].T,
        }
    return merge(p, upd)


@pytest.mark.parametrize("w", [1, 4])
def test_mocha_parity_parallel_mode(w):
    """Training-mode MoChA (hard monotonic w=1 / chunkwise w=4): expected
    alignments, chunk weights and context match the reference over a
    sequence of decoder steps (reference hma_train.py:40-66,
    mocha_train.py:14-87, mocha.py:164-311)."""
    from neural_sp.models.modules.mocha.mocha import MoChA as RefMoChA
    from neural_sp_tpu.models.modules.mocha import MoChA

    kdim, qdim, adim, bs, t, steps = 10, 8, 12, 2, 9, 4
    torch.manual_seed(0)
    ref = RefMoChA(kdim=kdim, qdim=qdim, adim=adim, odim=kdim, atype="add",
                   chunk_size=w, init_r=-2, noise_std=0.0,
                   sharpening_factor=1.0).eval()
    key = torch.randn(bs, t, kdim)
    queries = torch.randn(bs, steps, qdim)

    ours = MoChA(kdim=kdim, qdim=qdim, adim=adim, chunk_size=w,
                 init_r=-2.0, noise_std=0.0)
    key_j = jnp.asarray(t2np(key))
    q0 = jnp.asarray(t2np(queries[:, 0]))
    # init params then overwrite with converted reference weights
    alpha0 = jnp.zeros((bs, 1, t)).at[:, :, 0].set(1.0)
    v0 = ours.init(RNG, key_j, method=MoChA.precompute)
    kc0 = ours.apply(v0, key_j, method=MoChA.precompute)
    v0 = ours.init(RNG, kc0, q0, alpha0)
    p = mocha_params(ref, v0["params"], chunked=(w != 1))
    kc = ours.apply({"params": p}, key_j, method=MoChA.precompute)

    aw_prev_ref = None
    alpha_j = alpha0
    for i in range(steps):
        with torch.no_grad():
            cv_ref, alpha_ref, state = ref(
                key, key, queries[:, i:i + 1], None, aw_prev_ref,
                mode="parallel", cache=False)
        aw_prev_ref = alpha_ref
        q = jnp.asarray(t2np(queries[:, i]))
        ctx, alpha_j, beta_j = ours.apply(
            {"params": p}, kc, q, alpha_j, mode="parallel")
        np.testing.assert_allclose(
            np.asarray(alpha_j), t2np(alpha_ref)[:, :, 0], rtol=2e-3,
            atol=2e-4, err_msg=f"alpha step {i}")
        np.testing.assert_allclose(
            np.asarray(ctx), t2np(cv_ref)[:, 0], rtol=2e-3, atol=2e-4,
            err_msg=f"context step {i}")


def test_mocha_parity_hard_mode():
    """Test-time hard monotonic boundaries match the reference
    (hma_test.py:12-67)."""
    from neural_sp.models.modules.mocha.mocha import MoChA as RefMoChA
    from neural_sp_tpu.models.modules.mocha import MoChA

    kdim, qdim, adim, bs, t, steps = 10, 8, 12, 2, 9, 3
    torch.manual_seed(3)
    ref = RefMoChA(kdim=kdim, qdim=qdim, adim=adim, odim=kdim, atype="add",
                   chunk_size=1, init_r=0.5, noise_std=0.0).eval()
    key = torch.randn(bs, t, kdim)
    queries = torch.randn(bs, steps, qdim)

    ours = MoChA(kdim=kdim, qdim=qdim, adim=adim, chunk_size=1,
                 init_r=0.5, noise_std=0.0)
    key_j = jnp.asarray(t2np(key))
    q0 = jnp.asarray(t2np(queries[:, 0]))
    alpha0 = jnp.zeros((bs, 1, t)).at[:, :, 0].set(1.0)
    kc_v = ours.init(RNG, key_j, method=MoChA.precompute)
    kc0 = ours.apply(kc_v, key_j, method=MoChA.precompute)
    v0 = ours.init(RNG, kc0, q0, alpha0)
    p = mocha_params(ref, v0["params"], chunked=False)
    kc = ours.apply({"params": p}, key_j, method=MoChA.precompute)

    aw_prev_ref = None
    alpha_j = alpha0
    for i in range(steps):
        with torch.no_grad():
            cv_ref, alpha_ref, _ = ref(
                key, key, queries[:, i:i + 1], None, aw_prev_ref,
                mode="hard", cache=False)
        aw_prev_ref = alpha_ref
        q = jnp.asarray(t2np(queries[:, i]))
        ctx, alpha_j, _ = ours.apply(
            {"params": p}, kc, q, alpha_j, mode="hard")
        np.testing.assert_allclose(
            np.asarray(alpha_j), t2np(alpha_ref)[:, :, 0], atol=1e-6,
            err_msg=f"hard boundary step {i}")
        # NOTE: after a step with no fired boundary the reference keeps the
        # previous context; compare contexts only when a boundary fired
        if float(jnp.sum(alpha_j)) > 0:
            np.testing.assert_allclose(
                np.asarray(ctx), t2np(cv_ref)[:, 0], rtol=2e-3, atol=2e-4)


# ------------------------------------------------- CTC prefix scorer -----
def test_ctc_prefix_scorer_parity():
    """Joint CTC/attention prefix scores match the reference CTCPrefixScore
    (ctc.py:756-871) for a growing hypothesis."""
    from neural_sp.models.seq2seq.decoders.ctc import (
        CTCPrefixScore as RefScorer)
    from neural_sp_tpu.models.decoders.ctc import CTCPrefixScorer
    from neural_sp_tpu import BLANK, EOS

    rng = np.random.default_rng(0)
    t_max, v = 12, 8
    lp = np.log(rng.dirichlet(np.ones(v), size=t_max)).astype(np.float32)

    ref = RefScorer(lp, blank=BLANK, eos=EOS)
    ours = CTCPrefixScorer(lp, blank=BLANK, eos=EOS)

    cands = np.arange(v)
    r_prev_ref = ref.initial_state()
    r_prev = ours.initial_state()
    hyp: list[int] = []
    for step in range(3):
        psi_ref, r_ref = ref([EOS] + hyp, cands, r_prev_ref)
        psi, r = ours(hyp, cands, r_prev)
        np.testing.assert_allclose(psi, np.asarray(psi_ref), rtol=1e-4,
                                   atol=1e-4, err_msg=f"step {step}")
        # extend with the best non-blank candidate
        nxt = int(np.argmax(np.where(cands == BLANK, -1e30, psi)))
        hyp.append(nxt)
        r_prev_ref = r_ref[nxt] if isinstance(r_ref, np.ndarray) else \
            np.asarray(r_ref)[nxt]
        r_prev = r[nxt]


# ------------------------------------------------------- LAS decoder -----
def lstm_cell_params(ref_cell):
    """torch nn.LSTMCell -> flax OptimizedLSTMCell params (gate order
    i,f,g,o on both sides; torch's two biases sum into the h-side)."""
    w_ih = t2np(ref_cell.weight_ih)   # [4H, in]
    w_hh = t2np(ref_cell.weight_hh)   # [4H, H]
    b = t2np(ref_cell.bias_ih) + t2np(ref_cell.bias_hh)
    hdim = w_hh.shape[1]
    out = {}
    for gi, g in enumerate(("i", "f", "g", "o")):
        sl = slice(gi * hdim, (gi + 1) * hdim)
        out[f"i{g}"] = {"kernel": w_ih[sl].T}
        out[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
    return out


def build_ref_las(vocab, enc_n_units, n_units, n_layers, emb_dim,
                  bottleneck, attn_dim, attn_type="location",
                  lsm_prob=0.0, ctc_weight=0.0, **kw):
    from neural_sp.models.seq2seq.decoders.las import RNNDecoder as RefLAS
    from neural_sp_tpu import BLANK, UNK, EOS, PAD
    special = {"blank": BLANK, "unk": UNK, "eos": EOS, "pad": PAD}
    return RefLAS(
        special_symbols=special, enc_n_units=enc_n_units,
        attn_type=attn_type, n_units=n_units, n_projs=0, n_layers=n_layers,
        bottleneck_dim=bottleneck, emb_dim=emb_dim, vocab=vocab,
        tie_embedding=False, attn_dim=attn_dim, attn_sharpening_factor=1.0,
        attn_sigmoid_smoothing=False, attn_conv_out_channels=4,
        attn_conv_kernel_size=5, attn_n_heads=1, dropout=0.0,
        dropout_emb=0.0, dropout_att=0.0, lsm_prob=lsm_prob, ss_prob=0.0,
        ctc_weight=ctc_weight, ctc_lsm_prob=0.0, ctc_fc_list="",
        mbr_training=False,
        mbr_ce_weight=0.0, external_lm=None, lm_fusion="", lm_init=False,
        backward=False, global_weight=1.0, mtl_per_batch=False,
        mocha_chunk_size=1, mocha_n_heads_mono=1,
        mocha_init_r=-4, mocha_eps=1e-6, mocha_std=1.0,
        mocha_no_denominator=False, mocha_1dconv=False,
        mocha_decot_lookahead=0, quantity_loss_weight=0.0,
        latency_metric="", latency_loss_weight=0.0,
        mocha_stableemit_weight=0.0, gmm_attn_n_mixtures=5,
        replace_sos=False, distillation_weight=0.0, discourse_aware=False,
        param_init=0.1, **kw)


def las_params(ref, base):
    p = zeros_like_tree(base)
    step = {
        "embed": {"embedding": t2np(ref.embed.weight)},
        "w_gen": lin(ref.output_bn),
        "output": lin(ref.output),
        "attn": {
            "w_query": lin(ref.score.w_query, False),
            "v": lin(ref.score.v, False),
            # Conv2d [ch, 1, 1, K] -> flax Conv1d [K, 1, ch]
            "conv": {"kernel": t2np(ref.score.conv.weight)[:, 0]
                     .transpose(2, 1, 0)},
            "w_conv": lin(ref.score.w_conv, False),
        },
    }
    for lth, cell in enumerate(ref.rnn):
        step[f"cells_{lth}"] = lstm_cell_params(cell)
    return merge(p, {"step": step, "key_proj": lin(ref.score.w_key)})


@pytest.mark.slow
def test_las_decoder_teacher_forced_parity():
    """Teacher-forced LAS decoder (LSTM + location attention + readout):
    per-step logits and the XE loss match the reference (las.py:640-790,
    recurrency :811-850, generate :852-881)."""
    from neural_sp_tpu.models.decoders.las import RNNDecoder
    from neural_sp_tpu import PAD

    vocab, enc, units, layers, emb, bn, adim = 9, 10, 12, 2, 8, 12, 11
    bs, t = 2, 7
    torch.manual_seed(0)
    ref = build_ref_las(vocab, enc, units, layers, emb, bn, adim).eval()

    eouts = torch.randn(bs, t, enc)
    elens = torch.IntTensor([t, t - 2])
    ys = [torch.LongTensor([4, 5, 6]), torch.LongTensor([7, 8])]
    with torch.no_grad():
        logits_ref = ref(eouts, elens, ys, task="all", return_logits=True) \
            if "return_logits" in ref.forward.__code__.co_varnames else None
        logits_ref = ref.forward_att(eouts, elens, ys, return_logits=True)

    ours = RNNDecoder(vocab=vocab, enc_n_units=enc, n_units=units,
                      n_projs=0, n_layers=layers, emb_dim=emb,
                      bottleneck_dim=bn, attn_type="location", attn_dim=adim,
                      attn_conv_n_channels=4, attn_conv_kernel_size=5,
                      lsm_prob=0.0)
    ys_pad = jnp.asarray(np.array([[4, 5, 6], [7, 8, PAD]], np.int32))
    ylens = jnp.asarray([3, 2])
    ej = jnp.asarray(t2np(eouts))
    elj = jnp.asarray([t, t - 2])
    v0 = ours.init(RNG, ej, elj, ys_pad, ylens)
    p = las_params(ref, v0["params"])
    loss, obs = ours.apply({"params": p}, ej, elj, ys_pad, ylens,
                           True, return_logits=True)
    logits = np.asarray(obs["logits"])
    lr = t2np(logits_ref)
    # valid steps: U+1 per utterance (incl. <eos>)
    np.testing.assert_allclose(logits[0, :4], lr[0, :4], rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(logits[1, :3], lr[1, :3], rtol=2e-3,
                               atol=2e-3)


@pytest.mark.slow
def test_las_greedy_beam_top1_parity():
    """Greedy decoding and beam(4) top-1 of a tiny converted LAS model
    match the reference (las.py greedy :883-1006, beam_search :1062+)."""
    from neural_sp_tpu.models.decoders.las import RNNDecoder
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)

    vocab, enc, units, layers, emb, bn, adim = 9, 10, 12, 1, 8, 12, 11
    bs, t = 2, 9
    torch.manual_seed(1)
    ref = build_ref_las(vocab, enc, units, layers, emb, bn, adim).eval()
    eouts = torch.randn(bs, t, enc)
    elens = torch.IntTensor([t, t])
    with torch.no_grad():
        best_hyps, _ = ref.greedy(eouts, elens, max_len_ratio=1.0,
                                  idx2token=None, exclude_eos=True)
        nbest, _, _ = ref.beam_search(
            eouts, elens, params={
                "recog_beam_width": 4, "recog_max_len_ratio": 1.0,
                "recog_min_len_ratio": 0.0, "recog_length_penalty": 0.0,
                "recog_length_norm": False, "recog_coverage_penalty": 0.0,
                "recog_coverage_threshold": 0.0, "recog_gnmt_decoding": False,
                "recog_eos_threshold": 1.0, "recog_lm_weight": 0.0,
                "recog_ilm_weight": 0.0, "recog_lm_second_weight": 0.0,
                "recog_lm_bwd_weight": 0.0, "recog_ctc_weight": 0.0,
                "recog_softmax_smoothing": 1.0, "recog_cache_embedding":
                False, "recog_mma_delay_threshold": -1}, idx2token=None)

    ours = RNNDecoder(vocab=vocab, enc_n_units=enc, n_units=units,
                      n_projs=0, n_layers=layers, emb_dim=emb,
                      bottleneck_dim=bn, attn_type="location", attn_dim=adim,
                      attn_conv_n_channels=4, attn_conv_kernel_size=5)
    ej = jnp.asarray(t2np(eouts))
    elj = jnp.asarray([t, t])
    ys0 = jnp.zeros((bs, 2), jnp.int32)
    v0 = ours.init(RNG, ej, elj, ys0, jnp.asarray([1, 1]))
    p = las_params(ref, v0["params"])

    toks, lens = ours.apply({"params": p}, ej, elj, t,
                            method=RNNDecoder.greedy_scan)
    for b in range(bs):
        got = [int(x) for x in np.asarray(toks[b][: int(lens[b])])]
        want = [int(x) for x in np.asarray(best_hyps[b]).reshape(-1)]
        assert got == want, (b, got, want)

    # beam top-1 via the session on a full Speech2Text whose dec_fwd params
    # are the converted reference weights; encode is stubbed to feed the
    # SAME eouts the reference beam saw
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    args = SimpleNamespace(
        enc_type="lstm", input_dim=4, enc_n_units=enc, enc_n_layers=1,
        dec_type="lstm", dec_n_units=units, dec_n_layers=layers,
        emb_dim=emb, dec_bottleneck_dim=bn, attn_type="location",
        attn_dim=adim, attn_conv_n_channels=4, attn_conv_width=5,
        vocab=vocab, ctc_weight=0.0, lsm_prob=0.0)
    model = build_speech2text(args)
    xs_d = jnp.zeros((bs, 12, 4))
    v_full = model.init(RNG, xs_d, jnp.asarray([12] * bs), ys0,
                        jnp.asarray([1, 1]))
    params_full = dict(v_full["params"])
    params_full["dec_fwd"] = p
    sess = Speech2TextSession(model, params_full,
                              DecodeConfig(beam_width=4, max_len_ratio=1.0,
                                           length_norm=False))
    sess.encode = lambda xs, xlens: {"ys": {"xs": ej, "xlens": elj}}
    hyps = sess.decode_attention_beam(np.zeros((bs, 12, 4), np.float32),
                                      np.asarray([12] * bs))
    for b in range(bs):
        want = [int(x) for x in np.asarray(nbest[b][0]).reshape(-1)]
        got = [int(x) for x in hyps[b]]
        if got and got[-1] == 2:  # strip eos if present
            got = got[:-1]
        if want and want[-1] == 2:
            want = want[:-1]
        assert got == want, (b, got, want)


# ------------------------------------------------------ TransformerLM ----
@pytest.mark.slow
def test_transformerlm_parity():
    """Full-sequence logits + incremental predict() of a converted
    TransformerLM match the reference (transformerlm.py:29-253)."""
    from types import SimpleNamespace
    from neural_sp.models.lm.transformerlm import TransformerLM as RefLM
    from neural_sp_tpu.models.lm.transformerlm import TransformerLM

    vocab, d, dff, h, layers = 13, 16, 32, 4, 2
    ref_args = SimpleNamespace(
        lm_type="transformer", n_layers=layers, transformer_d_model=d,
        transformer_d_ff=dff, transformer_n_heads=h,
        transformer_pe_type="add", transformer_layer_norm_eps=1e-6,
        transformer_ffn_activation="relu", transformer_param_init="",
        dropout_in=0.0, dropout_hidden=0.0, dropout_att=0.0,
        dropout_layer=0.0, mem_len=0, recog_mem_len=0, vocab=vocab,
        adaptive_softmax=False, tie_embedding=False, dropout_emb=0.0,
        lsm_prob=0.0)
    torch.manual_seed(0)
    ref = RefLM(ref_args).eval()

    ours = TransformerLM(vocab=vocab, d_model=d, d_ff=dff, n_heads=h,
                         n_layers=layers, pe_type="add")
    ys = torch.randint(4, vocab, (2, 6))
    with torch.no_grad():
        logits_ref, _, _ = ref.decode(ys)

    ys_j = jnp.asarray(t2np(ys).astype(np.int32))
    v0 = ours.init(RNG, ys_j, ys_j)
    p = zeros_like_tree(v0["params"])
    upd = {"embed": {"embedding": t2np(ref.embed.weight)},
           "norm_out": ln(ref.norm_out),
           "output": lin(ref.output)}
    for lth, blk in enumerate(ref.layers):
        upd[f"blocks_{lth}"] = {
            "norm_self": ln(blk.norm1),
            "self_attn": {"w_query": lin(blk.self_attn.w_query),
                          "w_key": lin(blk.self_attn.w_key),
                          "w_value": lin(blk.self_attn.w_value),
                          "w_out": lin(blk.self_attn.w_out)},
            "norm_ff": ln(blk.norm3),
            "ff": {"w1": lin(blk.feed_forward.w_1),
                   "w2": lin(blk.feed_forward.w_2)},
        }
    p = merge(p, upd)

    h_j, _ = ours.apply({"params": p}, ys_j, method=TransformerLM.decode)
    logits = np.asarray(ours.apply({"params": p}, h_j,
                                   method=TransformerLM._logits))
    np.testing.assert_allclose(logits, t2np(logits_ref), rtol=1e-3,
                               atol=1e-3)

    # incremental predict chain equals the full-sequence logits
    caches = ours.apply({"params": p}, 2, method=TransformerLM.init_cache)
    for i in range(ys_j.shape[1]):
        lp, caches, _ = ours.apply({"params": p}, ys_j[:, i], caches,
                                   method=TransformerLM.predict)
        full_lp = np.asarray(
            jax.nn.log_softmax(jnp.asarray(logits[:, i]), -1))
        np.testing.assert_allclose(np.asarray(lp), full_lp, rtol=1e-3,
                                   atol=1e-3, err_msg=f"step {i}")


# ------------------------------------------------------------ RNNLM -----
@pytest.mark.slow
def test_rnnlm_parity():
    """Converted RNNLM: full-sequence logits + stepwise predict match the
    reference (rnnlm.py:158-225)."""
    from types import SimpleNamespace
    from neural_sp.models.lm.rnnlm import RNNLM as RefRNNLM
    from neural_sp_tpu.models.lm.rnnlm import RNNLM

    vocab, units, emb, layers = 13, 16, 12, 2
    ref_args = SimpleNamespace(
        lm_type="lstm", n_units=units, n_projs=0, n_layers=layers,
        emb_dim=emb, residual=False, use_glu=False, n_units_null_context=0,
        lsm_prob=0.0, vocab=vocab, dropout_in=0.0, dropout_hidden=0.0,
        adaptive_softmax=False, tie_embedding=False, param_init=0.1)
    torch.manual_seed(0)
    ref = RefRNNLM(ref_args).eval()

    ours = RNNLM(vocab=vocab, n_units=units, n_layers=layers, emb_dim=emb)
    ys = torch.randint(4, vocab, (2, 6))
    with torch.no_grad():
        logits_ref, _, _ = ref.decode(ys, None)

    ys_j = jnp.asarray(t2np(ys).astype(np.int32))
    v0 = ours.init(RNG, ys_j, ys_j)
    p = zeros_like_tree(v0["params"])

    def lstm_layer_params(mod):
        """torch nn.LSTM (1 layer) -> flax nn.RNN(OptimizedLSTMCell)."""
        w_ih = t2np(mod.weight_ih_l0)
        w_hh = t2np(mod.weight_hh_l0)
        b = t2np(mod.bias_ih_l0) + t2np(mod.bias_hh_l0)
        hdim = w_hh.shape[1]
        cell = {}
        for gi, g in enumerate(("i", "f", "g", "o")):
            sl = slice(gi * hdim, (gi + 1) * hdim)
            cell[f"i{g}"] = {"kernel": w_ih[sl].T}
            cell[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
        return cell

    upd = {"embed": {"embedding": t2np(ref.embed.weight)},
           "output": lin(ref.output)}
    for lth in range(layers):
        cell = lstm_layer_params(ref.rnn[lth])
        # our RNNLayer wraps the cell under rnn_fwd (modules/recurrent.py)
        sub = p[f"rnns_{lth}"]
        key = next(iter(sub))  # 'rnn_fwd' (or cell name variant)
        target = sub[key]
        while not any(k in target for k in cell):
            key2 = next(iter(target))
            target = target[key2]
        upd.setdefault(f"rnns_{lth}", sub)
        merge_into = upd[f"rnns_{lth}"]
        # walk the same path and replace
        node = merge_into[key]
        prev, prev_k = merge_into, key
        while not any(k in node for k in cell):
            k2 = next(iter(node))
            prev, prev_k = node, k2
            node = node[k2]
        prev[prev_k] = cell
    p = merge(p, upd)

    h_j, _ = ours.apply({"params": p}, ys_j, None, True,
                        method=RNNLM.decode)
    logits = np.asarray(ours.apply({"params": p}, h_j,
                                   method=RNNLM.logits_from_hidden))
    np.testing.assert_allclose(logits, t2np(logits_ref), rtol=1e-3,
                               atol=1e-3)

    # stepwise predict chain
    state = None
    for i in range(ys_j.shape[1]):
        lp, state, _ = ours.apply({"params": p}, ys_j[:, i], state,
                                  method=RNNLM.predict)
        want = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[:, i]),
                                             -1))
        np.testing.assert_allclose(np.asarray(lp), want, rtol=1e-3,
                                   atol=1e-3, err_msg=f"step {i}")


# -------------------------------------------------- label smoothing XE ---
@pytest.mark.parametrize("lsm,norm_len", [(0.0, False), (0.1, False),
                                          (0.1, True)])
def test_cross_entropy_lsm_parity(lsm, norm_len):
    from neural_sp.models.criterion import cross_entropy_lsm as ref_lsm
    from neural_sp_tpu.ops.criterion import cross_entropy_lsm

    torch.manual_seed(0)
    bs, t, v = 3, 7, 11
    logits = torch.randn(bs, t, v)
    ys = torch.randint(0, v, (bs, t))
    ys[0, 5:] = -1  # padding
    ys[2, 3:] = -1
    loss_ref, _ = ref_lsm(logits, ys, lsm, ignore_index=-1, training=True,
                          normalize_length=norm_len)
    loss, _ = cross_entropy_lsm(jnp.asarray(t2np(logits)),
                                jnp.asarray(t2np(ys).astype(np.int32)),
                                lsm, ignore_index=-1,
                                normalize_length=norm_len)
    np.testing.assert_allclose(float(loss), float(loss_ref),
                               rtol=1e-5, atol=1e-5)


# --------------------------------------------- multi-head add attention --
def test_multihead_add_attention_parity():
    """attn_n_heads > 1 LAS attention vs the reference
    MultiheadAttentionMechanism (atype 'add', las.py:220-226)."""
    from neural_sp.models.modules.multihead_attention import (
        MultiheadAttentionMechanism as RefMHA)
    from neural_sp_tpu.models.modules.attention import MultiheadAddAttention

    torch.manual_seed(0)
    kdim, qdim, adim, h, bs, tk = 12, 10, 16, 4, 2, 9
    ref = RefMHA(kdim, qdim, adim, odim=kdim, n_heads=h, dropout=0.0,
                 atype="add").eval()
    ours = MultiheadAddAttention(kdim=kdim, qdim=qdim, adim=adim, odim=kdim,
                                 n_heads=h)
    key = torch.randn(bs, tk, kdim)
    query = torch.randn(bs, 1, qdim)
    mask = torch.ones(bs, 1, tk, dtype=torch.bool)
    mask[1, :, 6:] = 0
    cv, aw, _ = ref(key, key, query, mask)

    kj = jnp.asarray(t2np(key))
    qj = jnp.asarray(t2np(query)[:, 0])
    mj = jnp.asarray(t2np(mask)[:, 0].astype(bool))
    base = ours.init(RNG, kj, kj, qj, mj)["params"]
    p = merge(zeros_like_tree(base), {
        "w_key": lin(ref.w_key), "w_value": lin(ref.w_value),
        "w_query": lin(ref.w_query), "v": lin(ref.v),
        "w_out": lin(ref.w_out)})
    ctx, aw_mean = ours.apply({"params": p}, kj, kj, qj, mj)
    np.testing.assert_allclose(np.asarray(ctx), t2np(cv)[:, 0],
                               rtol=1e-4, atol=1e-4)
    # ref aw: [B, H, qlen, klen] -> head mean
    np.testing.assert_allclose(np.asarray(aw_mean),
                               t2np(aw)[:, :, 0].mean(1),
                               rtol=1e-4, atol=1e-4)


# ------------------------------------------------- mocha conv1d energy ---
def test_mocha_conv1d_parity():
    """mocha_1dconv monotonic energy vs reference MonotonicEnergy
    (monotonic_energy.py:64-67,119-120)."""
    from neural_sp.models.modules.mocha.monotonic_energy import (
        MonotonicEnergy as RefME)
    from neural_sp_tpu.models.modules.mocha import MonotonicEnergy

    torch.manual_seed(1)
    kdim, qdim, adim, bs, tk = 12, 10, 16, 2, 9
    ref = RefME(kdim, qdim, adim, atype="add", n_heads=1, init_r=-2,
                conv1d=True).eval()
    ours = MonotonicEnergy(kdim=kdim, qdim=qdim, adim=adim, n_heads=1,
                           atype="add", init_r=-2.0, conv1d=True)
    key = torch.randn(bs, tk, kdim)
    query = torch.randn(bs, 1, qdim)
    e_ref = ref(key, query, mask=None)  # [B, H, qlen, klen]

    kj = jnp.asarray(t2np(key))
    qj = jnp.asarray(t2np(query)[:, 0])
    base = ours.init(
        RNG, kj, qj,
        method=lambda m, k, q: m(m.precompute(k), q))["params"]
    # reference v is weight-normed: fold g*w/|w| into a plain kernel
    v_w = t2np(torch.nn.utils.remove_weight_norm(ref.v).weight)
    p = merge(zeros_like_tree(base), {
        "w_key": lin(ref.w_key), "w_query": lin(ref.w_query, False),
        "conv": {"kernel": t2np(ref.conv1d.weight).transpose(2, 1, 0),
                 "bias": t2np(ref.conv1d.bias)},
        "v": v_w,  # our v param is [H, adim]
        "r": t2np(ref.r).reshape(1)})
    e = ours.apply({"params": p}, kj, qj,
                   method=lambda m, k, q: m(m.precompute(k), q))
    np.testing.assert_allclose(np.asarray(e)[:, 0], t2np(e_ref)[:, 0, 0],
                               rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- CIF ------
def test_cif_parallel_parity():
    """Converted-weight CIF parallel (training) mode: alphas and the
    boundary-split integrated contexts match the reference frame loop
    (cif.py:76-146)."""
    from neural_sp.models.modules.cif import CIF as RefCIF
    from neural_sp_tpu.models.modules.cif import CIF

    d, bs, t = 8, 2, 24
    torch.manual_seed(0)
    ref = RefCIF(enc_dim=d, window=3).eval()
    eouts = torch.randn(bs, t, d)
    elens = torch.IntTensor([t, t - 6])
    ylens = torch.IntTensor([5, 3])
    with torch.no_grad():
        cv_ref, aws_ref, state = ref(eouts, elens, ylens, mode="parallel")

    ours = CIF(enc_dim=d, conv_kernel_size=3)
    ej = jnp.asarray(t2np(eouts))
    elj = jnp.asarray([t, t - 6])
    ylj = jnp.asarray([5, 3])
    v0 = ours.init(RNG, ej, elj, ylj)
    p = merge(zeros_like_tree(v0["params"]), {
        "conv": {"kernel": t2np(ref.conv1d.weight).transpose(2, 1, 0),
                 "bias": t2np(ref.conv1d.bias)},
        "norm": ln(ref.norm),
        "proj": lin(ref.proj),
    })
    cv, alpha, _, _ = ours.apply({"params": p}, ej, elj, ylj)
    # reference returns the UNSCALED alpha in attn_state; compare raw
    alpha_raw = ours.apply({"params": p}, ej, elj, None)[1]
    np.testing.assert_allclose(np.asarray(alpha_raw), t2np(state["alpha"]),
                               rtol=1e-4, atol=1e-5)
    for b, yl in enumerate([5, 3]):
        np.testing.assert_allclose(np.asarray(cv)[b, :yl],
                                   t2np(cv_ref)[b, :yl],
                                   rtol=1e-3, atol=1e-4, err_msg=f"b{b}")
