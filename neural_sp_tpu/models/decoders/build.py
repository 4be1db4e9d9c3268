"""build_decoder — dispatch on dec_type (reference
``neural_sp/models/seq2seq/decoders/build.py:7-140``)."""
from __future__ import annotations

from .las import RNNDecoder
from .rnn_transducer import RNNTransducer


def _get(args, name, default=None):
    return getattr(args, name, default)


def build_decoder(args, vocab: int, enc_n_units: int,
                  backward: bool = False):
    dec_type = _get(args, "dec_type", "lstm")

    if dec_type in ("lstm_transducer", "gru_transducer"):
        return RNNTransducer(
            vocab=vocab, enc_n_units=enc_n_units,
            n_units=_get(args, "dec_n_units", 512),
            n_projs=_get(args, "dec_n_projs", 0),
            n_layers=_get(args, "dec_n_layers", 1),
            emb_dim=_get(args, "emb_dim", 512),
            joint_dim=_get(args, "transducer_joint_dim",
                           _get(args, "dec_n_units", 512)),
            rnn_type=dec_type.split("_")[0],
            dropout=_get(args, "dropout_dec", 0.0),
            dropout_emb=_get(args, "dropout_emb", 0.0),
            backward=backward)

    if dec_type == "transformer":
        from .transformer import TransformerDecoder
        return TransformerDecoder(
            vocab=vocab, enc_n_units=enc_n_units,
            d_model=_get(args, "transformer_dec_d_model",
                         _get(args, "transformer_d_model", 256)),
            d_ff=_get(args, "transformer_dec_d_ff",
                      _get(args, "transformer_d_ff", 2048)),
            n_heads=_get(args, "transformer_dec_n_heads",
                         _get(args, "transformer_n_heads", 4)),
            n_layers=_get(args, "dec_n_layers", 6),
            pe_type=_get(args, "transformer_dec_pe_type", "add"),
            dropout=_get(args, "dropout_dec", 0.1),
            dropout_att=_get(args, "dropout_att", 0.0),
            dropout_layer=_get(args, "dropout_dec_layer", 0.0),
            dropout_emb=_get(args, "dropout_emb", 0.0),
            lsm_prob=_get(args, "lsm_prob", 0.0),
            ffn_activation=_get(args, "transformer_ffn_activation", "relu"),
            mma_first_layer=_get(args, "mocha_first_layer", 0),
            mocha_chunk_size=_get(args, "mocha_chunk_size", 1),
            mocha_n_heads_mono=_get(args, "mocha_n_heads_mono", 1),
            mocha_n_heads_chunk=_get(args, "mocha_n_heads_chunk", 1),
            mocha_share_ca=_get(args, "share_chunkwise_attention", False),
            mocha_eps_wait=_get(args, "mocha_eps_wait", -1),
            quantity_loss_weight=_get(args, "mocha_quantity_loss_weight",
                                      0.0),
            backward=backward)

    # default: LAS RNN decoder (lstm | gru)
    return RNNDecoder(
        vocab=vocab, enc_n_units=enc_n_units,
        n_units=_get(args, "dec_n_units", 512),
        n_projs=_get(args, "dec_n_projs", 0),
        n_layers=_get(args, "dec_n_layers", 1),
        emb_dim=_get(args, "emb_dim", 512),
        bottleneck_dim=_get(args, "dec_bottleneck_dim",
                            _get(args, "dec_n_units", 512)),
        attn_type=_get(args, "attn_type", "location"),
        attn_dim=_get(args, "attn_dim", 512),
        attn_n_heads=_get(args, "attn_n_heads", 1),
        attn_conv_n_channels=_get(args, "attn_conv_n_channels", 10),
        attn_conv_kernel_size=_get(args, "attn_conv_width", 201),
        attn_sharpening_factor=_get(args, "attn_sharpening_factor", 1.0),
        attn_sigmoid_smoothing=_get(args, "attn_sigmoid", False),
        dropout=_get(args, "dropout_dec", 0.0),
        dropout_emb=_get(args, "dropout_emb", 0.0),
        dropout_att=_get(args, "dropout_att", 0.0),
        lsm_prob=_get(args, "lsm_prob", 0.0),
        ss_prob=_get(args, "ss_prob", 0.0),
        zoneout=_get(args, "zoneout", 0.0),
        cif_conv_kernel_size=_get(args, "cif_conv_kernel_size", 3),
        mocha_chunk_size=_get(args, "mocha_chunk_size", 1),
        mocha_n_heads_mono=_get(args, "mocha_n_heads_mono", 1),
        mocha_n_heads_chunk=_get(args, "mocha_n_heads_chunk", 1),
        mocha_init_r=_get(args, "mocha_init_r", -4.0),
        mocha_noise_std=_get(args, "mocha_std", 1.0),
        mocha_no_denominator=_get(args, "mocha_no_denominator", False),
        mocha_eps_wait=_get(args, "mocha_eps_wait", -1),
        mocha_stableemit_weight=_get(args, "mocha_stableemit_weight", 0.0),
        mocha_1dconv=_get(args, "mocha_1dconv", False),
        mocha_share_ca=_get(args, "share_chunkwise_attention", False),
        quantity_loss_weight=_get(args, "mocha_quantity_loss_weight", 0.0),
        latency_metric=_get(args, "mocha_latency_metric", "") or "",
        latency_loss_weight=_get(args, "mocha_latency_loss_weight", 0.0),
        # DeCoT alignment-mask slack (reference las.py:365 default 0;
        # passed as decot_delta into MoChA)
        trigger_lookahead=_get(args, "mocha_decot_lookahead", 2),
        lm_fusion=_get(args, "lm_fusion", "") or "",
        lm_n_units=_get(args, "lm_n_units", 512),
        lm_n_layers=_get(args, "lm_n_layers", 1),
        lm_emb_dim=_get(args, "lm_emb_dim", 512),
        backward=backward)
