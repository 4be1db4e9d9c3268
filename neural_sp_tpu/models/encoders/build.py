"""build_encoder — dispatch on enc_type (reference
``neural_sp/models/seq2seq/encoders/build.py:7``).

Accepts any object with attribute access (argparse Namespace, SimpleNamespace,
or the config system's Config); uses the reference's flag names so recipe
YAMLs translate directly.
"""
from __future__ import annotations

import os

from .rnn import RNNEncoder
from .transformer import XformerEncoder
from .tds import TDSEncoder
from .gated_conv import GatedConvEncoder


def _conv_norm(args):
    """Frontend conv normalization: our unified ``conv_normalization``
    spelling, or the reference's boolean pair ``conv_batch_norm`` /
    ``conv_layer_norm`` (conv.py:118 choices)."""
    norm = _get(args, "conv_normalization", "")
    if not norm:
        if _get(args, "conv_batch_norm", False):
            norm = "batch_norm"
        elif _get(args, "conv_layer_norm", False):
            norm = "layer_norm"
    return norm


def _get(args, name, default=None):
    return getattr(args, name, default)


def _subsample_tuple(args):
    s = _get(args, "subsample", "")
    if not s:
        return ()
    if isinstance(s, (list, tuple)):
        return tuple(int(x) for x in s)
    return tuple(int(x) for x in str(s).split("_"))


def build_encoder(args):
    enc_type = args.enc_type
    conv = enc_type.startswith("conv_")
    core = enc_type[5:] if conv else enc_type

    if core in ("blstm", "lstm", "bgru", "gru"):
        return RNNEncoder(
            input_dim=args.input_dim,
            rnn_type=core,
            n_units=_get(args, "enc_n_units", 512),
            n_projs=_get(args, "enc_n_projs", 0),
            last_proj_dim=_get(args, "enc_last_proj_dim", 0),
            n_layers=_get(args, "enc_n_layers", 5),
            n_layers_sub1=_get(args, "enc_n_layers_sub1", 0),
            n_layers_sub2=_get(args, "enc_n_layers_sub2", 0),
            dropout_in=_get(args, "dropout_in", 0.0),
            dropout=_get(args, "dropout_enc", 0.0),
            subsample=_subsample_tuple(args),
            subsample_type=_get(args, "subsample_type", "drop"),
            conv_channels=_get(args, "conv_channels", "") if conv else "",
            conv_kernel_sizes=_get(args, "conv_kernel_sizes", ""),
            conv_strides=_get(args, "conv_strides", ""),
            conv_poolings=_get(args, "conv_poolings", ""),
            conv_normalization=_conv_norm(args),
            conv_bottleneck_dim=_get(args, "conv_bottleneck_dim", 0),
            chunk_size_current=_get(args, "lc_chunk_size_current",
                                    _get(args, "chunk_size_current", -1)),
            chunk_size_right=_get(args, "lc_chunk_size_right",
                                  _get(args, "chunk_size_right", 0)),
            # reference rnn.py:222 — default FALSE (concat fwd/bwd); sum
            # only when the conf sets it (all published BLSTM recipes do)
            bidir_sum_fwd_bwd=_get(args, "bidirectional_sum_fwd_bwd",
                                   _get(args, "bidir_sum_fwd_bwd", False)),
            task_specific_layer=_get(args, "task_specific_layer", False),
        )

    if core in ("transformer", "conformer", "conformer_v2",
                "uni_transformer", "uni_conformer"):
        uni = core.startswith("uni_") or _get(args, "unidirectional", False)
        btype = core[4:] if core.startswith("uni_") else core
        return XformerEncoder(
            input_dim=args.input_dim,
            btype=btype,
            # accept both the generic and the encoder-specific reference
            # flag spellings (transformer_enc_d_model etc., args_asr.py)
            d_model=_get(args, "transformer_enc_d_model",
                         _get(args, "transformer_d_model", 256)),
            d_ff=_get(args, "transformer_enc_d_ff",
                      _get(args, "transformer_d_ff", 2048)),
            n_heads=_get(args, "transformer_enc_n_heads",
                         _get(args, "transformer_n_heads", 4)),
            n_layers=_get(args, "enc_n_layers", 12),
            n_layers_sub1=_get(args, "enc_n_layers_sub1", 0),
            n_layers_sub2=_get(args, "enc_n_layers_sub2", 0),
            pe_type=_get(args, "transformer_enc_pe_type", "add"),
            clamp_len=_get(args, "transformer_enc_clamp_len", -1),
            dropout_in=_get(args, "dropout_in", 0.0),
            dropout=_get(args, "dropout_enc", 0.1),
            dropout_att=_get(args, "dropout_att", 0.0),
            dropout_layer=_get(args, "dropout_enc_layer", 0.0),
            # conformer blocks ALWAYS use swish FFNs in the reference
            # (encoders/build.py conformer branch hard-codes
            # ffn_activation='swish'; the transformer_ffn_activation flag
            # only applies to plain transformer encoders)
            ffn_activation=("swish" if "conformer" in btype
                            else _get(args, "transformer_ffn_activation",
                                      "relu")),
            ffn_bottleneck_dim=_get(args, "transformer_ffn_bottleneck_dim", 0),
            last_proj_dim=_get(args, "enc_last_proj_dim", 0),
            task_specific_layer=_get(args, "task_specific_layer", False),
            subsample=_subsample_tuple(args),
            subsample_type=_get(args, "subsample_type", "drop"),
            conv_kernel_size=_get(args, "conformer_kernel_size", 15),
            conv_normalization=_get(args, "conformer_normalization",
                                    "layer_norm"),
            conv_channels=_get(args, "conv_channels", "") if conv else "",
            conv_kernel_sizes=_get(args, "conv_kernel_sizes", ""),
            conv_strides=_get(args, "conv_strides", ""),
            conv_poolings=_get(args, "conv_poolings", ""),
            conv_frontend_normalization=_conv_norm(args),
            unidirectional=uni,
            chunk_size_left=_get(args, "lc_chunk_size_left", -1),
            chunk_size_current=_get(args, "lc_chunk_size_current", -1),
            chunk_size_right=_get(args, "lc_chunk_size_right", 0),
            streaming_type=_get(args, "lc_type", "mask"),
            remat=_get(args, "recompute_encoder",
                       os.environ.get("NSP_ENC_REMAT") == "1"),
            remat_policy=_get(args, "recompute_encoder_policy",
                              os.environ.get("NSP_ENC_REMAT_POLICY", "")),
            scan_layers=_get(args, "enc_scan_layers",
                             os.environ.get("NSP_SCAN_LAYERS") == "1"),
        )

    if core == "tds":
        return TDSEncoder(
            input_dim=args.input_dim,
            channels=_get(args, "conv_channels", "10_10_14_14_18_18"),
            kernel_sizes=_get(args, "tds_kernel_sizes", "21_21_21_21_21_21"),
            dropout=_get(args, "dropout_enc", 0.0),
            last_proj_dim=_get(args, "enc_last_proj_dim", 0),
        )

    if core == "gated_conv":
        return GatedConvEncoder(
            input_dim=args.input_dim,
            layers=_get(args, "gated_conv_layers", "100:3_100:3_100:3"),
            dropout=_get(args, "dropout_enc", 0.0),
            last_proj_dim=_get(args, "enc_last_proj_dim", 0),
        )

    raise ValueError(f"unknown enc_type: {enc_type}")
