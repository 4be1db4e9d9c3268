"""Speech2Text — the task model composing frontend, encoder, and decoders.

Reference: ``neural_sp/models/seq2seq/speech2text.py:42-831``:
  * encode() (:369-431): frame-stack/splice (host-side in our loader),
    SpecAugment, sequence-summary/in-noise frontends, encoder forward;
  * _forward (:271-345): MTL loss composition over fwd/bwd attention
    decoders, CTC, and sub1/sub2 auxiliary heads;
  * decoding APIs live in ``decoders/decoding.py`` (greedy/beam sessions).

Design: submodules are built once by ``build_speech2text(args)`` and passed
in as fields; the loss path is a single jittable function of
(params, batch, rng).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .. import PAD
from ..ops.specaugment import spec_augment
from .encoders.rnn import RNNEncoder
from .decoders.ctc import CTC
from .decoders.las import RNNDecoder


class Speech2Text(nn.Module):
    encoder: nn.Module
    dec_fwd: Optional[nn.Module] = None
    dec_bwd: Optional[nn.Module] = None
    ctc: Optional[CTC] = None
    dec_fwd_sub1: Optional[nn.Module] = None
    ctc_sub1: Optional[CTC] = None
    dec_fwd_sub2: Optional[nn.Module] = None
    ctc_sub2: Optional[CTC] = None
    # MTL weights (reference speech2text.py:118-184)
    ctc_weight: float = 0.0
    bwd_weight: float = 0.0
    sub1_weight: float = 0.0
    ctc_weight_sub1: float = 0.0
    sub2_weight: float = 0.0
    ctc_weight_sub2: float = 0.0
    # SpecAugment
    specaug_freq_mask_width: int = 0
    specaug_n_freq_masks: int = 0
    specaug_time_mask_width: int = 0
    specaug_n_time_masks: int = 0
    specaug_p: float = 1.0
    specaug_adaptive_number_ratio: float = 0.0
    specaug_adaptive_size_ratio: float = 0.0
    # input Gaussian noise (reference frontends/input_noise.py)
    input_noise_std: float = 0.0
    # sequence summary network (speaker adaptation, reference
    # speech2text.py:414-417 + frontends/sequence_summary.py)
    ssn: Optional[nn.Module] = None
    # knowledge distillation mixing weight (reference las.py:771-774)
    distillation_weight: float = 0.0
    # weight noise is applied by the trainer on params (reference base.py:77)

    @property
    def fwd_weight(self) -> float:
        return max(1.0 - self.ctc_weight - self.bwd_weight
                   - self.sub1_weight - self.sub2_weight, 0.0)

    def _frontend(self, xs, xlens, deterministic):
        if not deterministic and self.specaug_n_freq_masks + \
                self.specaug_n_time_masks > 0:
            xs = spec_augment(
                self.make_rng("specaug"), xs, xlens,
                freq_mask_width=self.specaug_freq_mask_width,
                n_freq_masks=self.specaug_n_freq_masks,
                time_mask_width=self.specaug_time_mask_width,
                n_time_masks=self.specaug_n_time_masks,
                p=self.specaug_p,
                adaptive_number_ratio=self.specaug_adaptive_number_ratio,
                adaptive_size_ratio=self.specaug_adaptive_size_ratio)
        if not deterministic and self.input_noise_std > 0:
            xs = xs + self.input_noise_std * jax.random.normal(
                self.make_rng("specaug"), xs.shape, xs.dtype)
        if self.ssn is not None:
            xs = self.ssn(xs, xlens, deterministic=deterministic)
        return xs, xlens

    def encode(self, xs, xlens, task: str = "all",
               deterministic: bool = True, carry=None):
        xs, xlens = self._frontend(xs, xlens, deterministic)
        out = self.encoder(xs, xlens, task=task, deterministic=deterministic,
                           **({"carry": carry}
                              if isinstance(self.encoder, RNNEncoder) else {}))
        if isinstance(out, tuple):  # RNN encoders return (eouts, carry)
            return out
        return out, None

    def forward_with_carry(self, xs, xlens, ys, ylens, enc_carry,
                           deterministic: bool = False):
        """Training forward that threads the RNN-encoder hidden state across
        batches (Random State Passing, reference rnn.py:323-327).

        Returns (loss, obs, new_enc_carry)."""
        xs, xlens = self._frontend(xs, xlens, deterministic)
        eouts, new_carry = self.encoder(
            xs, xlens, task="all", deterministic=deterministic,
            carry=enc_carry)
        loss = jnp.zeros((), jnp.float32)
        obs = {}
        ex, el = eouts["ys"]["xs"], eouts["ys"]["xlens"]
        if self.ctc is not None and self.ctc_weight > 0:
            loss_ctc, _ = self.ctc(ex, el, ys, ylens, deterministic)
            loss += self.ctc_weight * loss_ctc
            obs["loss_ctc"] = loss_ctc
        if self.dec_fwd is not None and self.fwd_weight > 0:
            loss_att, obs_att = self.dec_fwd(ex, el, ys, ylens, deterministic)
            loss += self.fwd_weight * loss_att
            obs.update(obs_att)
        obs["loss"] = loss
        return loss, obs, new_carry

    def streaming_ctc_scan(self, blocks):
        """Fully on-device streaming CTC: scan the cached encoder + CTC
        argmax over pre-split feature blocks — ONE device dispatch for the
        whole stream (the reference's python block loop,
        speech2text.py:550-698, collapses into a lax.scan).

        blocks: [N, block_total_in, D] for a single utterance.
        Returns per-block argmax ids [N, n_c_out].
        """
        import flax.linen as nn

        cache0 = self.encoder.init_stream_cache(1)

        def body(mdl, cache, block):
            eouts, new_cache = mdl.encoder.streaming_step(block[None], cache)
            ids = jnp.argmax(mdl.ctc.logits(eouts), -1)[0]
            return new_cache, ids

        scanned = nn.scan(body, variable_broadcast="params",
                          split_rngs={"params": False},
                          in_axes=0, out_axes=0)
        _, ids = scanned(self, cache0, blocks)
        return ids

    def teacher_probs(self, xs, xlens, ys, ylens, temperature: float = 1.0):
        """Teacher-forced soft targets for knowledge distillation
        (reference speech2text.py:347-367): [B, U+1, V] probabilities."""
        eouts, _ = self.encode(xs, xlens, "ys", True)
        ex, el = eouts["ys"]["xs"], eouts["ys"]["xlens"]
        _, obs = self.dec_fwd(ex, el, ys, ylens, True, return_logits=True)
        return jax.nn.softmax(
            obs["logits"].astype(jnp.float32) / temperature, axis=-1)

    def __call__(self, xs, xlens, ys, ylens, ys_sub1=None, ylens_sub1=None,
                 ys_sub2=None, ylens_sub2=None, task: str = "all",
                 deterministic: bool = True, teacher_probs=None,
                 trigger_points=None):
        """Returns (total loss, observation dict). ``teacher_probs``:
        [B, U+1, V] soft targets (distillation, reference las.py:771-774).
        ``trigger_points``: [B, U] precomputed boundary frames from word/CTC
        alignments (MinLT latency training, reference las.py:744-769); when
        absent, ctc_sync/decot triggers come from in-graph forced alignment.
        """
        eouts, _ = self.encode(xs, xlens, task, deterministic)
        loss = jnp.zeros((), jnp.float32)
        obs: dict[str, Any] = {}

        if "ys" in eouts:
            ex, el = eouts["ys"]["xs"], eouts["ys"]["xlens"]
            if self.ctc is not None and self.ctc_weight > 0:
                loss_ctc, _ = self.ctc(ex, el, ys, ylens, deterministic)
                loss += self.ctc_weight * loss_ctc
                obs["loss_ctc"] = loss_ctc
            if self.dec_fwd is not None and self.fwd_weight > 0:
                needs_trig = (
                    getattr(self.dec_fwd, "latency_metric", "") in
                    ("ctc_sync", "decot", "minlt") or
                    getattr(self.dec_fwd, "attn_type", "") == "triggered")
                if trigger_points is None and needs_trig and \
                        self.ctc is not None and \
                        getattr(self.dec_fwd, "latency_metric", "") != \
                        "minlt":
                    trigger_points = jax.lax.stop_gradient(
                        self.ctc.trigger_points(ex, el, ys, ylens))
                kw = {"trigger_points": trigger_points} \
                    if (trigger_points is not None and needs_trig) else {}
                if teacher_probs is not None:
                    kw["teacher_probs"] = teacher_probs
                    kw["distillation_weight"] = self.distillation_weight
                loss_att, obs_att = self.dec_fwd(
                    ex, el, ys, ylens, deterministic, **kw)
                loss += self.fwd_weight * loss_att
                obs.update(obs_att)
            if self.dec_bwd is not None and self.bwd_weight > 0:
                loss_bwd, obs_bwd = self.dec_bwd(ex, el, ys, ylens,
                                                 deterministic)
                loss += self.bwd_weight * loss_bwd
                obs["loss_att_bwd"] = loss_bwd
                obs["acc_att_bwd"] = obs_bwd["acc_att"]

        for sub, w_att, w_ctc in (("sub1", self.sub1_weight,
                                   self.ctc_weight_sub1),
                                  ("sub2", self.sub2_weight,
                                   self.ctc_weight_sub2)):
            key = f"ys_{sub}"
            if key not in eouts:
                continue
            ex, el = eouts[key]["xs"], eouts[key]["xlens"]
            ys_s = ys_sub1 if sub == "sub1" else ys_sub2
            ylens_s = ylens_sub1 if sub == "sub1" else ylens_sub2
            if ys_s is None:
                ys_s, ylens_s = ys, ylens
            ctc_head = getattr(self, f"ctc_{sub}")
            dec_head = getattr(self, f"dec_fwd_{sub}")
            if ctc_head is not None and w_ctc > 0:
                l, _ = ctc_head(ex, el, ys_s, ylens_s, deterministic)
                loss += w_ctc * l
                obs[f"loss_ctc_{sub}"] = l
            if dec_head is not None and w_att - w_ctc > 0:
                l, o = dec_head(ex, el, ys_s, ylens_s, deterministic)
                loss += (w_att - w_ctc) * l
                obs[f"loss_att_{sub}"] = l
        obs["loss"] = loss
        return loss, obs


def build_speech2text(args) -> Speech2Text:
    """Assemble a Speech2Text from a reference-style args namespace."""
    from .encoders.build import build_encoder
    from .decoders.build import build_decoder

    enc = build_encoder(args)
    enc_n_units = enc.output_dim

    g = lambda name, default=None: getattr(args, name, default)
    vocab = args.vocab
    ctc_weight = g("ctc_weight", 0.0)
    bwd_weight = g("bwd_weight", 0.0)
    sub1_weight = g("sub1_weight", 0.0)
    sub2_weight = g("sub2_weight", 0.0)

    ctc = None
    if ctc_weight > 0:
        ctc = CTC(vocab=vocab, enc_n_units=enc_n_units,
                  dropout=g("dropout_dec", 0.0),
                  lsm_prob=g("ctc_lsm_prob", 0.0),
                  fc_list=g("ctc_fc_list", "") or "")
    dec_fwd = None
    if ctc_weight < 1.0:
        dec_fwd = build_decoder(args, vocab, enc_n_units)
    dec_bwd = None
    if bwd_weight > 0:
        dec_bwd = build_decoder(args, vocab, enc_n_units, backward=True)

    def sub_heads(sub):
        w = g(f"{sub}_weight", 0.0)
        wc = g(f"ctc_weight_{sub}", 0.0)
        if w <= 0:
            return None, None
        vocab_sub = g(f"vocab_{sub}", vocab)
        # the sub tap's width can differ from the main stream (e.g. a
        # task-specific layer emits unprojected n_units, rnn.py taps)
        n_units_sub = getattr(enc, f"output_dim_{sub}", enc_n_units)
        c = CTC(vocab=vocab_sub, enc_n_units=n_units_sub,
                dropout=g("dropout_dec", 0.0)) if wc > 0 else None
        d = None
        if w - wc > 0:
            # dec_config_sub1/2: per-sub-task decoder overrides (reference
            # args_asr.py:44-75, e.g. a different dec_type for the sub head)
            sub_args = args
            over = g(f"dec_config_{sub}", None)
            if isinstance(over, dict):
                from types import SimpleNamespace
                sub_args = SimpleNamespace(**{**vars(args), **over})
            d = build_decoder(sub_args, vocab_sub, n_units_sub)
        return d, c

    dec_s1, ctc_s1 = sub_heads("sub1")
    dec_s2, ctc_s2 = sub_heads("sub2")

    return Speech2Text(
        encoder=enc, dec_fwd=dec_fwd, dec_bwd=dec_bwd, ctc=ctc,
        dec_fwd_sub1=dec_s1, ctc_sub1=ctc_s1,
        dec_fwd_sub2=dec_s2, ctc_sub2=ctc_s2,
        ctc_weight=ctc_weight, bwd_weight=bwd_weight,
        sub1_weight=sub1_weight, ctc_weight_sub1=g("ctc_weight_sub1", 0.0),
        sub2_weight=sub2_weight, ctc_weight_sub2=g("ctc_weight_sub2", 0.0),
        specaug_freq_mask_width=g("freq_width", 0),
        specaug_n_freq_masks=g("n_freq_masks", 0),
        specaug_time_mask_width=g("time_width", 0),
        specaug_n_time_masks=g("n_time_masks", 0),
        specaug_p=g("time_width_upper", 1.0),
        specaug_adaptive_number_ratio=g("adaptive_number_ratio", 0.0),
        specaug_adaptive_size_ratio=g("adaptive_size_ratio", 0.0),
        input_noise_std=g("input_noise_std", 0.0),
        ssn=_build_ssn(g),
        distillation_weight=g("distillation_weight", 0.0) or
        (0.5 if g("teacher", "") else 0.0),
    )


def _build_ssn(g):
    if not g("sequence_summary_network", False):
        return None
    from ..frontends.sequence_summary import SequenceSummaryNetwork
    return SequenceSummaryNetwork(n_units=g("ssn_n_units", 256),
                                  n_layers=g("ssn_n_layers", 3),
                                  dropout=g("dropout_in", 0.0))
