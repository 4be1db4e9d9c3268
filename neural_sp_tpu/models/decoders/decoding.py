"""Decoding sessions: greedy + beam search drivers over jitted step fns.

Reference algorithms:
  * LAS label-synchronous beam search with joint CTC prefix scoring, LM
    shallow fusion, ILM subtraction, length/coverage penalties, eos
    threshold (``las.py:1062-1437``, helper ``beam_search.py:19-207``);
  * CTC greedy/prefix search (``ctc.py:219-531``);
  * RNN-T greedy + time-synchronous beam (``rnn_transducer.py:330-765``).

Design: hypotheses live in fixed-shape arrays ([beam] leading dim) and all
NN work is one jitted step per token reused across utterances; host Python
only reorders indices and manages end-of-sentence bookkeeping — the
reference's dict-of-hyps inner loops are gone.

A session object compiles once and is reused across an entire eval set.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ... import BLANK, EOS, PAD
from ...ops.masks import make_pad_mask
from .ctc import CTCPrefixScorer, ctc_greedy, ctc_prefix_beam_search
from .las import RNNDecoder
from .transformer import TransformerDecoder
from .rnn_transducer import RNNTransducer


@dataclass
class DecodeConfig:
    beam_width: int = 10
    max_len_ratio: float = 1.0
    min_len_ratio: float = 0.0
    length_penalty: float = 0.0
    length_norm: bool = False
    coverage_penalty: float = 0.0
    coverage_threshold: float = 0.0
    eos_threshold: float = 1.5
    ctc_weight: float = 0.0          # joint CTC score weight at decode
    lm_weight: float = 0.0
    ilm_weight: float = 0.0          # internal LM subtraction
    softmax_smoothing: float = 1.0
    n_best: int = 1
    lm_second_weight: float = 0.0    # second-pass n-best rescoring
    lm_bwd_weight: float = 0.0       # backward-LM rescoring
    fwd_bwd_attention: bool = False  # merge fwd/bwd decoder n-bests
    state_carry_over: bool = False   # speaker-keyed decoder state carry-over
    device_beam: bool = False        # fully on-device batched beam search


def fwd_bwd_attention_merge(nbest_f, peaks_f, hists_f,
                            nbest_b, peaks_b, hists_b,
                            peak_tol: int = 2) -> list[int]:
    """Merge forward and backward decoder n-bests by attention-peak time
    agreement (reference ``fwd_bwd_attention.py:12-108``): splice a forward
    prefix with a backward suffix at a token whose attention peaks agree,
    scoring the splice as fwd-prefix score + bwd-suffix score.

    nbest_b/peaks_b/hists_b are in GENERATION (reversed) order, as produced
    by ``_beam_one_las(backward=True)``.
    """
    cands: list[tuple[float, list[int]]] = []
    for f, hf in zip(nbest_f, hists_f):
        if f:
            cands.append((hf[-1] if hf else -1e30, f))
    for b, hb in zip(nbest_b, hists_b):
        if b:
            cands.append((hb[-1] if hb else -1e30, b[::-1]))
    for f, pf, hf in zip(nbest_f, peaks_f, hists_f):
        for b, pb, hb in zip(nbest_b, peaks_b, hists_b):
            rb = b[::-1]
            rpb = pb[::-1]
            L = len(rb)
            for i in range(min(len(f), len(pf), len(hf))):
                for j in range(min(L, len(rpb))):
                    if f[i] != rb[j] or abs(pf[i] - rpb[j]) > peak_tol:
                        continue
                    suffix = rb[j + 1:]
                    # suffix covers generation steps 0..L-j-2
                    sfx_score = hb[L - j - 2] if j + 1 < L <= len(hb) + 1 \
                        and L - j - 2 >= 0 else 0.0
                    cands.append((hf[i] + sfx_score, f[: i + 1] + suffix))
    if not cands:
        return nbest_f[0] if nbest_f else []
    return max(cands, key=lambda c: c[0])[1]


class Speech2TextSession:
    """Wraps (model, params) with jitted encode + per-decoder-step fns."""

    def __init__(self, model, params, conf: DecodeConfig | None = None,
                 lm_session=None, ensemble=None):
        self.model = model
        # live-updatable (MBR fine-tuning re-points this between batches;
        # every jitted fn takes params as an argument, so no recompiles)
        self.params = params
        self.conf = conf or DecodeConfig()
        self.lm = lm_session
        # ensemble: list of additional Speech2TextSession (same vocab);
        # their per-step log-probs are averaged into the beam scores
        # (reference las.py:1219-1237)
        self.ensemble = ensemble or []
        self.lm_second = None        # set via attach_second_pass_lms
        self.lm_bwd = None
        self._encode_p = jax.jit(
            lambda p, xs, xlens: model.apply(
                {"params": p}, xs, xlens, method=model.encode)[0])
        dec = model.dec_fwd
        self.dec = dec
        if isinstance(dec, RNNDecoder):
            self._keys_p = jax.jit(lambda p, e: model.apply(
                {"params": p}, e,
                method=lambda m, e: m.dec_fwd.precompute_keys(e)))
            self._step_p = jax.jit(lambda p, carry, y, kc, e, m: model.apply(
                {"params": p}, carry, y, kc, e, m,
                method=lambda mdl, c, y, kc, e, m:
                mdl.dec_fwd.decode_step(c, y, kc, e, m)))
        elif isinstance(dec, TransformerDecoder):
            self._src_p = jax.jit(lambda p, e: model.apply(
                {"params": p}, e,
                method=lambda m, e: m.dec_fwd.precompute_src(e)))
            self._tstep_p = jax.jit(
                lambda p, caches, src, y, mask, off, e: model.apply(
                    {"params": p}, caches, src, y, mask, off, e,
                    method=lambda mdl, c, s, y, m, o, e:
                    mdl.dec_fwd.decode_step(c, s, y, m, o, e)),
                static_argnums=(5,))
        if model.ctc is not None:
            self._ctc_logp_p = jax.jit(lambda p, e: model.apply(
                {"params": p}, e,
                method=lambda m, e: m.ctc.log_probs(e)))

    # params-bound views of the jitted fns ------------------------------- #
    def _keys(self, e):
        return self._keys_p(self.params, e)

    def _step(self, carry, y, kc, e, m):
        return self._step_p(self.params, carry, y, kc, e, m)

    def _src(self, e):
        return self._src_p(self.params, e)

    def _tstep(self, caches, src, y, mask, off, e):
        return self._tstep_p(self.params, caches, src, y, mask, off, e)

    def _ctc_logp(self, e):
        return self._ctc_logp_p(self.params, e)

    # ------------------------------------------------------------------ #
    def encode(self, xs, xlens):
        return self._encode_p(self.params, jnp.asarray(xs),
                              jnp.asarray(xlens))

    def decode_ctc_greedy(self, xs, xlens):
        eouts = self.encode(xs, xlens)
        lp = self._ctc_logp(eouts["ys"]["xs"])
        paths = np.asarray(jnp.argmax(lp, -1))
        return ctc_greedy(paths, np.asarray(eouts["ys"]["xlens"]))

    def decode_ctc_beam(self, xs, xlens):
        eouts = self.encode(xs, xlens)
        lp = np.asarray(self._ctc_logp(eouts["ys"]["xs"]))
        elens = np.asarray(eouts["ys"]["xlens"])
        out = []
        lm_fn = self._make_ctc_lm_fn() if (
            self.lm is not None and self.conf.lm_weight > 0) else None
        for b in range(lp.shape[0]):
            nbest = ctc_prefix_beam_search(
                lp[b], int(elens[b]), self.conf.beam_width,
                lm_fn=lm_fn, lm_weight=self.conf.lm_weight,
                length_norm=self.conf.length_norm)
            out.append([h["hyp"] for h in nbest[:self.conf.n_best]])
        return [h[0] for h in out]

    def _make_ctc_lm_fn(self):
        cache: dict = {}

        def lm_fn(prefix):
            # memoised by prefix; reuses the parent prefix's cached state so
            # each new prefix costs exactly one LM step
            if prefix not in cache:
                if prefix:
                    _ = lm_fn(prefix[:-1])  # ensure parent state exists
                    state = cache[("state",) + prefix[:-1]]
                    y = prefix[-1]
                else:
                    state = self.lm.initial_state(1)
                    y = EOS
                lp, state = self.lm.predict(np.asarray([y], np.int32), state)
                cache[prefix] = np.asarray(lp[0])
                cache[("state",) + prefix] = state
            return cache[prefix]

        return lm_fn

    def decode_attention_greedy(self, xs, xlens):
        assert isinstance(self.dec, RNNDecoder)
        eouts = self.encode(xs, xlens)
        e, el = eouts["ys"]["xs"], eouts["ys"]["xlens"]
        max_len = max(int(e.shape[1] * self.conf.max_len_ratio), 2)
        if not hasattr(self, "_greedy_scan_p"):
            self._greedy_scan_p = jax.jit(
                lambda p, e, el, L: self.model.apply(
                    {"params": p}, e, el, L,
                    method=lambda m, *a: m.dec_fwd.greedy_scan(*a)),
                static_argnums=(3,))
        toks, lens = self._greedy_scan_p(self.params, e, el, max_len)
        toks, lens = np.asarray(toks), np.asarray(lens)
        return [[int(t) for t in toks[b, :lens[b]] if t not in (EOS, PAD)]
                for b in range(toks.shape[0])]

    # ------------------------------------------------------------------ #
    def decode_cif_blockwise(self, xs, xlens, block_size: int = 16):
        """Block-synchronous CIF decode, single utterance (reference
        incremental mode, cif.py:95-146): alphas are computed per block
        with the conv receptive field handled by left-context caching and
        right-context deferral, tokens fire incrementally through
        ``CifStreamer`` (tail fires iff accumulated weight >= 0.5,
        cif.py:128-133), and each fired context advances the decoder one
        greedy step. Matches the offline unscaled firing path on the
        fully-fired tokens (tests/test_decode_extras.py)."""
        from ..modules.cif import CifStreamer
        dec = self.dec
        assert isinstance(dec, RNNDecoder) and dec.attn_type == "cif"
        eouts = self.encode(xs, xlens)
        e, el = eouts["ys"]["xs"], eouts["ys"]["xlens"]
        assert e.shape[0] == 1, "single-utterance streaming decode"
        T = int(el[0])
        if not hasattr(self, "_cif_alpha_p"):
            self._cif_alpha_p = jax.jit(
                lambda p, e, el: self.model.apply(
                    {"params": p}, e, el,
                    method=lambda m, e, el: m.dec_fwd.cif.alphas(e, el)))
            self._cif_step_p = jax.jit(
                lambda p, carry, y, ctx, e, m: self.model.apply(
                    {"params": p}, carry, y, ctx, e, m,
                    method=lambda mdl, c, y, ctx, e, msk:
                    mdl.dec_fwd.decode_step_cif(c, y, ctx, e, msk)))

        # conv lookahead/lookback derived from the BOUND instance's params
        # (not the CIF class default): the alpha conv kernel is
        # dec_fwd/cif/conv with shape (kernel_size, D, D)
        k = int(self.params["dec_fwd"]["cif"]["conv"]["kernel"].shape[0])
        h = (k - 1) // 2
        e_np = np.asarray(e[0][:T], np.float32)
        streamer = CifStreamer()
        left_ctx = np.zeros((h, e_np.shape[-1]), np.float32)
        leftover = np.zeros((0, e_np.shape[-1]), np.float32)
        contexts: list[np.ndarray] = []
        pos = 0
        while pos < T:
            block = e_np[pos: pos + block_size]
            pos += len(block)
            final = pos >= T
            buf = np.concatenate([leftover, block], 0)
            n_commit = len(buf) if final else max(len(buf) - h, 0)
            if n_commit == 0:
                leftover = buf
                continue
            seg = np.concatenate([left_ctx, buf], 0)
            al = np.asarray(self._cif_alpha_p(
                self.params, jnp.asarray(seg[None]),
                jnp.asarray([len(seg)])))[0]
            contexts.extend(streamer.push(
                al[h: h + n_commit], buf[:n_commit], final=final))
            # carry the TRUE preceding frames: tail of (old left_ctx ++
            # committed) — when n_commit < h the old left context still
            # covers part of the window (zero-padding there would diverge
            # from the offline conv)
            left_ctx = np.concatenate([left_ctx, buf[:n_commit]], 0)[
                len(left_ctx) + n_commit - h:]
            leftover = buf[n_commit:]

        # greedy decode: one step per fired context
        carry = dec.init_carry(1, T, e.dtype)
        mask = make_pad_mask(el, T)
        y, hyp = EOS, []
        for cv in contexts:
            carry, logits = self._cif_step_p(
                self.params, carry, jnp.asarray([y], jnp.int32),
                jnp.asarray(cv[None].astype(np.float32)), e[:, :T], mask)
            y = int(np.argmax(np.asarray(logits)[0]))
            if y == EOS:
                break
            hyp.append(y)
        return hyp

    # ------------------------------------------------------------------ #
    def decode_attention_beam_device(self, xs, xlens):
        """Fully on-device batched beam search (SURVEY §7: fixed-beam-tensor
        search under jit): the whole eval batch decodes in ONE dispatch —
        hypotheses live in [B, K, L] tensors, one lax.scan over output
        steps, beam reorder by gather. The fast path when no LM fusion /
        joint CTC / ILM / ensemble is requested (those stay in the host
        session, reference protocol); supports length penalty/norm,
        eos_threshold, min/max length.
        """
        conf = self.conf
        dec = self.dec
        assert isinstance(dec, RNNDecoder)
        eouts = self.encode(xs, xlens)
        e, el = eouts["ys"]["xs"], eouts["ys"]["xlens"]
        bs, tmax, _ = e.shape
        K = conf.beam_width
        max_len = max(int(tmax * conf.max_len_ratio), 2)

        if not hasattr(self, "_device_beam_cache"):
            self._device_beam_cache = {}
        cache_key = (K, max_len)
        if cache_key not in self._device_beam_cache:
            def beam_fn(p, e, el):
                B = e.shape[0]
                T = e.shape[1]
                ebk = jnp.repeat(e, K, axis=0)           # [B*K, T, D]
                mask = make_pad_mask(jnp.repeat(el, K, 0), T)
                kc = self.model.apply(
                    {"params": p}, ebk,
                    method=lambda m, x: m.dec_fwd.precompute_keys(x))
                carry = dec.init_carry(B * K, T, e.dtype)
                NEG = jnp.float32(-1e30)
                scores0 = jnp.full((B, K), NEG).at[:, 0].set(0.0)
                toks0 = jnp.full((B, K, max_len), PAD, jnp.int32)
                y0 = jnp.full((B * K,), EOS, jnp.int32)
                best_tok0 = jnp.full((B, max_len), PAD, jnp.int32)
                best_sc0 = jnp.full((B,), NEG)
                lens0 = jnp.zeros((B, K), jnp.int32)

                def step(state, i):
                    carry, scores, toks, lens, y, best_tok, best_sc = state
                    carry2, logits, _ = self.model.apply(
                        {"params": p}, carry, y, kc, ebk, mask,
                        method=lambda m, *a: m.dec_fwd.decode_step(*a))
                    logp = jax.nn.log_softmax(
                        conf.softmax_smoothing
                        * logits.astype(jnp.float32), -1)
                    V = logp.shape[-1]
                    logp = logp.reshape(B, K, V)
                    total = scores[:, :, None] + logp

                    # eos gating (reference las.py:1296-1313)
                    non_eos = logp.at[:, :, EOS].set(NEG)
                    best_non = jnp.max(non_eos, axis=-1)
                    ok_eos = (logp[:, :, EOS]
                              >= conf.eos_threshold * best_non) & \
                        (i >= min_lens)[:, None]
                    # finished candidates: eos extension per row
                    L = lens + 1
                    fin = total[:, :, EOS]
                    if conf.length_norm:
                        fin = fin / jnp.maximum(L, 1)
                    else:
                        fin = fin + conf.length_penalty * L
                    fin = jnp.where(ok_eos, fin, NEG)
                    k_best = jnp.argmax(fin, axis=1)
                    sc_best = jnp.take_along_axis(
                        fin, k_best[:, None], 1)[:, 0]
                    cand_tok = jnp.take_along_axis(
                        toks, k_best[:, None, None], 1)[:, 0]
                    cand_tok = jax.vmap(
                        lambda tkn, ln: tkn.at[ln].set(EOS))(
                        cand_tok, jnp.take_along_axis(
                            lens, k_best[:, None], 1)[:, 0])
                    upd = sc_best > best_sc
                    best_sc = jnp.where(upd, sc_best, best_sc)
                    best_tok = jnp.where(upd[:, None], cand_tok, best_tok)

                    # survivors: non-eos extensions
                    total = total.at[:, :, EOS].set(NEG)
                    flat = total.reshape(B, K * V)
                    top_sc, top_ix = jax.lax.top_k(flat, K)
                    parent = top_ix // V
                    tok = (top_ix % V).astype(jnp.int32)
                    par_flat = (jnp.arange(B)[:, None] * K
                                + parent).reshape(-1)
                    carry2 = jax.tree.map(lambda x: x[par_flat], carry2)
                    toks = jnp.take_along_axis(
                        toks, parent[:, :, None], 1)
                    lens2 = jnp.take_along_axis(lens, parent, 1)
                    toks = jax.vmap(jax.vmap(
                        lambda tkn, ln, tk: tkn.at[ln].set(tk)))(
                        toks, lens2, tok)
                    return (carry2, top_sc, toks, lens2 + 1,
                            tok.reshape(-1), best_tok, best_sc), ()

                min_lens = (el.astype(jnp.float32)
                            * conf.min_len_ratio).astype(jnp.int32)
                state0 = (carry, scores0, toks0, lens0, y0,
                          best_tok0, best_sc0)
                state, _ = jax.lax.scan(step, state0,
                                        jnp.arange(max_len))
                carry, scores, toks, lens, y, best_tok, best_sc = state
                # force-finish fallback: best alive row when nothing ended
                sc_alive = scores[:, 0]
                if conf.length_norm:
                    sc_alive = sc_alive / jnp.maximum(lens[:, 0] + 1, 1)
                use_alive = best_sc <= NEG / 2
                out_tok = jnp.where(use_alive[:, None],
                                    toks[:, 0], best_tok)
                out_sc = jnp.where(use_alive, sc_alive, best_sc)
                return out_tok, out_sc

            self._device_beam_cache[cache_key] = jax.jit(beam_fn)
        toks, sc = self._device_beam_cache[cache_key](self.params, e, el)
        toks = np.asarray(toks)
        return [[int(t) for t in row if t not in (PAD, EOS)]
                for row in toks]

    # ------------------------------------------------------------------ #
    def decode_attention_beam(self, xs, xlens, speakers=None):
        """Batched-beam label-synchronous search, one utterance at a time
        (reference eval protocol, bs=1). ``speakers`` enables speaker-keyed
        decoder state carry-over across consecutive utterances (reference
        las.py:1155-1165)."""
        eouts_all = self.encode(xs, xlens)
        self._ens_eouts = [s.encode(xs, xlens) for s in self.ensemble]
        bs = eouts_all["ys"]["xs"].shape[0]
        results = []
        for b in range(bs):
            self._b_idx = b
            self._cur_speaker = speakers[b] if speakers is not None else None
            e = eouts_all["ys"]["xs"][b:b + 1]
            el = eouts_all["ys"]["xlens"][b:b + 1]
            if isinstance(self.dec, TransformerDecoder):
                best, nbest = self._beam_one_transformer(e, el)
            else:
                best, nbest = self._beam_one_las(e, el)
            results.append(self._post_process_nbest(e, el, nbest))
        return results

    def attach_second_pass_lms(self, lm_second=None, lm_bwd=None):
        self.lm_second = lm_second
        self.lm_bwd = lm_bwd

    def _tf_score(self, dec_attr: str, e, el, hyp: list[int]) -> float:
        """Teacher-forced sum log-prob of ``hyp`` under a decoder head."""
        from ..utils import np_pad_lists
        key = f"_tf_{dec_attr}"
        if not hasattr(self, key):
            setattr(self, key, jax.jit(
                lambda p, e, el, ys, ylens: self.model.apply(
                    {"params": p}, e, el, ys, ylens,
                    method=lambda m, *a: getattr(
                        m, dec_attr).sequence_log_prob(*a))))
        ys, ylens = np_pad_lists([hyp], min_len=((len(hyp) + 7) // 8) * 8)
        return float(getattr(self, key)(
            self.params, e, el, jnp.asarray(ys), jnp.asarray(ylens))[0])

    def _post_process_nbest(self, e, el, nbest: list[list[int]]) -> list[int]:
        """Second-pass LM / backward-LM rescoring + forward-backward decoder
        merging over the n-best (reference beam_search.py:115-140,
        fwd_bwd_attention.py)."""
        conf = self.conf
        use_bwd_dec = conf.fwd_bwd_attention and self.model.dec_bwd is not None
        if not nbest or (self.lm_second is None and self.lm_bwd is None
                         and not use_bwd_dec):
            return nbest[0] if nbest else []
        if use_bwd_dec:
            # attention-peak merge of fwd and bwd n-bests
            # (reference fwd_bwd_attention.py:12-108)
            f_nbest = nbest
            f_peaks = getattr(self, "_last_nbest_peaks", [[]] * len(nbest))
            f_hists = getattr(self, "_last_nbest_hists", [[]] * len(nbest))
            _, b_nbest = self._beam_one_las(e, el, backward=True)
            b_peaks = getattr(self, "_last_nbest_peaks", [[]] * len(b_nbest))
            b_hists = getattr(self, "_last_nbest_hists", [[]] * len(b_nbest))
            return fwd_bwd_attention_merge(
                f_nbest, f_peaks, f_hists, b_nbest, b_peaks, b_hists)
        best, best_score = nbest[0], -np.inf
        for i, hyp in enumerate(nbest):
            score = -0.001 * i  # keep original beam ordering as tiebreak
            if self.lm_second is not None and conf.lm_second_weight > 0:
                score += conf.lm_second_weight * \
                    self.lm_second.score_sequence(hyp)
            if self.lm_bwd is not None and conf.lm_bwd_weight > 0:
                score += conf.lm_bwd_weight * \
                    self.lm_bwd.score_sequence(list(reversed(hyp)))
            if score > best_score:
                best, best_score = hyp, score
        return best

    def _ctc_scorer(self, e, el):
        if self.conf.ctc_weight <= 0 or self.model.ctc is None:
            return None
        lp = np.asarray(self._ctc_logp(e))[0][: int(el[0])]
        return CTCPrefixScorer(lp)

    def _beam_one_las(self, e, el, backward: bool = False):
        """``backward=True`` beams the right-to-left decoder head
        (dec_bwd); hypotheses come out in generation (reversed) order --
        callers reverse them (fwd-bwd merging, fwd_bwd_attention.py)."""
        conf = self.conf
        dec: RNNDecoder = self.model.dec_bwd if backward else self.dec
        if backward and not hasattr(self, "_step_bwd_p"):
            self._keys_bwd_p = jax.jit(lambda p, e: self.model.apply(
                {"params": p}, e,
                method=lambda m, e: m.dec_bwd.precompute_keys(e)))
            self._step_bwd_p = jax.jit(
                lambda p, carry, y, kc, e, m: self.model.apply(
                    {"params": p}, carry, y, kc, e, m,
                    method=lambda mdl, c, y, kc, e, msk:
                    mdl.dec_bwd.decode_step(c, y, kc, e, msk)))
        _keys = (lambda e: self._keys_bwd_p(self.params, e)) if backward \
            else self._keys
        _step = (lambda *a: self._step_bwd_p(self.params, *a)) if backward \
            else self._step
        beam = conf.beam_width
        tmax = e.shape[1]
        max_len = max(int(int(el[0]) * conf.max_len_ratio), 2)
        min_len = int(int(el[0]) * conf.min_len_ratio)

        e_t = jnp.repeat(e, beam, axis=0)
        mask = make_pad_mask(jnp.repeat(el, beam, 0), tmax)
        kc = _keys(e_t)
        carry = dec.init_carry(beam, tmax, e.dtype)
        # speaker-keyed LSTM-state carry-over across utterances
        spk = getattr(self, "_cur_speaker", None)
        if conf.state_carry_over and spk is not None and \
                spk in getattr(self, "_spk_states", {}):
            prev = self._spk_states[spk]
            cells = tuple(
                tuple(jnp.repeat(x, beam, axis=0) for x in layer)
                for layer in prev)
            carry = (cells,) + carry[1:]

        # internal-LM estimation: a parallel decode with zeroed encoder
        # context (reference ILM subtraction las.py:1190-1256)
        use_ilm = conf.ilm_weight > 0
        if use_ilm:
            e_zero = jnp.zeros_like(e_t)
            kc_zero = jax.tree.map(jnp.zeros_like, kc)
            ilm_carry = dec.init_carry(beam, tmax, e.dtype)

        # ensemble members keep their own encoder outputs and step state
        ens_state = []
        for s, eouts_s in zip(self.ensemble, getattr(self, "_ens_eouts", [])):
            b = getattr(self, "_b_idx", 0)
            es = jnp.repeat(eouts_s["ys"]["xs"][b:b + 1], beam, axis=0)
            ens_state.append({
                "s": s, "e": es, "kc": s._keys(es),
                "carry": s.dec.init_carry(beam, es.shape[1], es.dtype),
                "mask": make_pad_mask(
                    jnp.repeat(eouts_s["ys"]["xlens"][b:b + 1], beam, 0),
                    es.shape[1])})

        ctc_scorer = self._ctc_scorer(e, el)
        ctc_states = [ctc_scorer.initial_state() if ctc_scorer else None] * beam

        hyps = [[] for _ in range(beam)]
        peaks = [[] for _ in range(beam)]   # attention-peak frame per token
        hists = [[] for _ in range(beam)]   # cumulative score per token
        scores = np.full(beam, -1e30, np.float32)
        scores[0] = 0.0
        scores_att = np.zeros(beam, np.float32)  # cumulative att (raw)
        scores_ilm = np.zeros(beam, np.float32)  # cumulative internal-LM
        scores_ctc = np.zeros(beam, np.float32)
        scores_lm = np.zeros(beam, np.float32)
        # LM state is ONE batched pytree over the beam (a single predict
        # dispatch per step; rows reorder by gather on beam reorder)
        lm_state = self.lm.initial_state(beam) if self.lm else None
        aw_sums = np.zeros((beam, tmax), np.float32)
        y = jnp.full((beam,), EOS, jnp.int32)
        finished: list[dict] = []

        for step_i in range(max_len):
            carry, logits, aw = _step(carry, y, kc, e_t, mask)
            logp = np.asarray(jax.nn.log_softmax(
                conf.softmax_smoothing * logits.astype(jnp.float32), -1))
            V = logp.shape[-1]

            if ens_state:  # average member log-probs (las.py:1219-1237)
                acc = logp.copy()
                for st in ens_state:
                    st["carry"], lg, _ = st["s"]._step(
                        st["carry"], y, st["kc"], st["e"], st["mask"])
                    acc += np.asarray(jax.nn.log_softmax(
                        lg.astype(jnp.float32), -1))
                logp_raw = acc / (1 + len(ens_state))
            else:
                logp_raw = logp
            if use_ilm:
                ilm_carry, ilm_logits, _ = self._step(
                    ilm_carry, y, kc_zero, e_zero, mask)
                ilm_logp = np.asarray(jax.nn.log_softmax(
                    ilm_logits.astype(jnp.float32), -1))
                logp_eff = logp_raw - conf.ilm_weight * ilm_logp
            else:
                ilm_logp = np.zeros_like(logp_raw)
                logp_eff = logp_raw

            lm_logp = np.zeros_like(logp)
            if self.lm is not None and conf.lm_weight > 0:
                y_in = np.asarray(
                    [h[-1] if h else EOS for h in hyps], np.int32)
                lm_logp, lm_state = self.lm.predict(y_in, lm_state)

            # ---- children generation (reference las.py:1240-1360) ------
            # Per live beam: the top-``beam`` candidates by the (att - ilm)
            # score ALONE (las.py:1255-1258 topk on total_scores); LM and
            # CTC scores join AFTER that selection — a token outside the
            # top-k can never be hypothesized however strong its LM/CTC
            # score. Totals are rebuilt each step from the carried
            # att/lm/ctc components, exactly like the reference.
            #
            # QUIRK MIRRORED EXACTLY: the reference's add_ctc_score
            # (beam_search.py:49-64) re-sorts the joint scores and the CTC
            # states internally but never returns the re-sorted topk_ids,
            # so its caller (las.py:1296-1360) pairs the att-rank-j TOKEN
            # with the joint-rank-j PRUNING SCORE and joint-rank-j CTC
            # STATE, while the carried ctc score stays att-rank-j. Since
            # the pruning score is never decomposed back, the pairing does
            # not compound — but it changes which children survive, so
            # parity (tests/test_parity_pipeline.py) requires it verbatim.
            if step_i < min_len:
                bad_eos = np.ones(beam, bool)
            else:
                best_non_eos = np.max(
                    np.delete(logp, EOS, axis=1), axis=1)
                bad_eos = logp[:, EOS] < conf.eos_threshold * best_non_eos

            aw_host = np.asarray(aw)
            if aw_host.ndim == 3:   # MoChA/MMA heads -> mean
                aw_host = aw_host.mean(1)
            peak_t = np.argmax(aw_host, -1)       # [beam]

            w_ctc = conf.ctc_weight
            children = []
            for k in range(beam):
                if scores[k] <= -1e29:
                    continue
                cands = np.argsort(-logp_eff[k], kind="stable")[:beam]
                # total = att*(1-w) - ilm*w_ilm*(1-w) + lm*w_lm
                # (las.py:1250-1264; att and ilm carried separately like
                # the reference's score_att / score_ilm)
                base = ((1.0 - w_ctc)
                        * (scores_att[k] + logp_raw[k, cands])
                        - (1.0 - w_ctc) * conf.ilm_weight
                        * (scores_ilm[k] + ilm_logp[k, cands])
                        + conf.lm_weight
                        * (scores_lm[k] + lm_logp[k, cands]))
                if conf.length_penalty != 0:
                    base = base + conf.length_penalty * (step_i + 1)
                if ctc_scorer is not None:
                    psi, r_new = ctc_scorer(hyps[k], cands, ctc_states[k])
                    joint = base + w_ctc * psi
                    perm = np.argsort(-joint, kind="stable")
                    prune_sc = joint[perm]
                else:
                    psi = r_new = None
                    prune_sc = base
                for j in range(len(cands)):
                    c = int(cands[j])
                    if c == EOS and bad_eos[k]:
                        continue
                    sc = float(prune_sc[j])
                    if conf.length_norm:
                        sc = sc / (step_i + 1)
                    children.append({
                        "parent": k, "tok": c, "score": sc,
                        "att": float(scores_att[k] + logp_raw[k, c]),
                        "ilm": float(scores_ilm[k] + ilm_logp[k, c]),
                        "lm": float(scores_lm[k] + lm_logp[k, c]),
                        "psi": float(psi[j]) if psi is not None
                        else float(scores_ctc[k]),
                        "state": r_new[perm[j]] if psi is not None
                        else ctc_states[k]})

            # local pruning to the top ``beam`` children TOTAL
            # (las.py:1363-1364); eos-enders then move to ``finished``
            # (remove_complete_hyp) so the live beam SHRINKS
            children.sort(key=lambda d: -d["score"])
            children = children[:beam]
            new_hyps, new_scores, new_satt, new_silm = [], [], [], []
            new_y, parents, new_peaks, new_hists = [], [], [], []
            new_slm, new_ctc_beam = [], []
            for ch in children:
                k, v, sc = ch["parent"], ch["tok"], ch["score"]
                if v == EOS:
                    cand = {"hyp": hyps[k] + [EOS], "score": sc,
                            "score_att": float(ch["att"]),
                            "score_lm": float(ch["lm"]),
                            "peaks": peaks[k] + [int(peak_t[k])],
                            "hist": hists[k] + [sc]}
                    if conf.state_carry_over:
                        # decoder LSTM state at this hyp's end (reference
                        # carries the BEST hyp's dstates, las.py:1155-1165)
                        cand["cells"] = jax.tree.map(
                            lambda x: x[k:k + 1], carry[0])
                    if conf.coverage_penalty > 0:
                        cov = np.sum(np.minimum(
                            aw_sums[k], conf.coverage_threshold or 0.5))
                        cand["score"] += conf.coverage_penalty * cov
                    finished.append(cand)
                    continue
                new_hyps.append(hyps[k] + [v])
                new_peaks.append(peaks[k] + [int(peak_t[k])])
                new_hists.append(hists[k] + [sc])
                new_scores.append(sc)
                new_satt.append(ch["att"])
                new_silm.append(ch["ilm"])
                new_y.append(v)
                parents.append(k)
                new_slm.append(ch["lm"])
                new_ctc_beam.append((ch["state"], ch["psi"]))
            # stop once ``beam`` hypotheses completed (reference
            # remove_complete_hyp beam_search.py:33-47: end_hyps pruned to
            # beam_width in arrival order, then is_finish)
            if len(finished) >= beam:
                finished = finished[:beam]
                break
            if not new_hyps:
                break
            while len(new_hyps) < beam:  # pad beam with dead entries
                new_hyps.append(new_hyps[-1])
                new_peaks.append(new_peaks[-1])
                new_hists.append(new_hists[-1])
                new_scores.append(-1e30)
                new_satt.append(new_satt[-1])
                new_silm.append(new_silm[-1])
                new_y.append(new_y[-1])
                parents.append(parents[-1])
                new_slm.append(new_slm[-1])
                new_ctc_beam.append(new_ctc_beam[-1])

            par = jnp.asarray(parents, jnp.int32)
            carry = jax.tree.map(lambda x: x[par], carry)
            if use_ilm:
                ilm_carry = jax.tree.map(lambda x: x[par], ilm_carry)
            for st in ens_state:
                st["carry"] = jax.tree.map(lambda x: x[par], st["carry"])
            aw_np = np.asarray(aw)
            if aw_np.ndim == 3:   # MoChA/MMA: [beam, H, T] -> head mean
                aw_np = aw_np.mean(1)
            aw_sums = aw_sums[parents] + aw_np[parents]
            if self.lm is not None:
                lm_state = jax.tree.map(lambda x: x[par], lm_state)
            hyps = new_hyps
            peaks = new_peaks
            hists = new_hists
            scores = np.asarray(new_scores, np.float32)
            scores_att = np.asarray(new_satt, np.float32)
            scores_ilm = np.asarray(new_silm, np.float32)
            scores_lm = np.asarray(new_slm, np.float32)
            if ctc_scorer is not None:
                ctc_states = [c[0] for c in new_ctc_beam]
                scores_ctc = np.asarray([c[1] for c in new_ctc_beam],
                                        np.float32)
            y = jnp.asarray(new_y, jnp.int32)

        # global pruning (reference las.py:1371-1375): top up with live
        # hypotheses when fewer than ``beam`` completed
        if len(finished) < beam:
            live = [{"hyp": hyps[i] + [EOS], "score": float(scores[i]),
                     "score_att": float(scores_att[i]),
                     "peaks": peaks[i], "hist": hists[i]}
                    for i in range(len(hyps)) if scores[i] > -1e29]
            finished.extend(live[: beam - len(finished)])
        finished.sort(key=lambda d: -d["score"])
        if conf.state_carry_over and spk is not None:
            if not hasattr(self, "_spk_states"):
                self._spk_states = {}
            # LSTM state of the WINNING hypothesis (recorded when it
            # finished); fall back to the top surviving beam row
            win_cells = finished[0].get("cells")
            if win_cells is None:
                win_cells = tuple(
                    tuple(x[0:1] for x in layer) for layer in carry[0])
            self._spk_states[spk] = win_cells
        nbest = [[t for t in f["hyp"] if t != EOS]
                 for f in finished[: self.conf.n_best]]
        # attention-peak frames per emitted token, aligned to the n-best
        # (fwd-bwd merge fwd_bwd_attention.py:12-108, OOV resolution)
        self._last_nbest_peaks = [
            f.get("peaks", [])[: len(nb)]
            for f, nb in zip(finished[: self.conf.n_best], nbest)]
        self._last_nbest_scores = [
            float(f["score"]) for f in finished[: self.conf.n_best]]
        # att-only decomposition, what the reference's beam_search RETURNS
        # as ``scores`` (las.py:1446-1448: end_hyps[n]['score_att'])
        self._last_nbest_scores_att = [
            float(f.get("score_att", f["score"]))
            for f in finished[: self.conf.n_best]]
        self._last_nbest_hists = [
            f.get("hist", [])[: len(nb)]
            for f, nb in zip(finished[: self.conf.n_best], nbest)]
        return nbest[0], nbest

    def _beam_one_transformer(self, e, el):
        conf = self.conf
        dec: TransformerDecoder = self.dec
        beam = conf.beam_width
        tmax = e.shape[1]
        max_len = max(int(int(el[0]) * conf.max_len_ratio), 2)
        min_len = int(int(el[0]) * conf.min_len_ratio)

        e_t = jnp.repeat(e, beam, axis=0)
        src_mask = make_pad_mask(jnp.repeat(el, beam, 0), tmax)[:, None, :]
        src_caches = self._src(e_t)
        caches = dec.init_cache(beam, e.dtype, tmax)
        ctc_scorer = self._ctc_scorer(e, el)
        ctc_states = [ctc_scorer.initial_state() if ctc_scorer else None] * beam

        hyps = [[] for _ in range(beam)]
        scores = np.full(beam, -1e30, np.float32)
        scores[0] = 0.0
        scores_att = np.zeros(beam, np.float32)
        scores_ctc = np.zeros(beam, np.float32)
        scores_lm = np.zeros(beam, np.float32)
        lm_state = self.lm.initial_state(beam) if self.lm else None
        y = jnp.full((beam,), EOS, jnp.int32)
        finished: list[dict] = []

        for step_i in range(max_len):
            caches, logits = self._tstep(caches, src_caches, y, src_mask,
                                         step_i, e_t)
            logp = np.asarray(jax.nn.log_softmax(
                conf.softmax_smoothing * logits.astype(jnp.float32), -1))
            V = logp.shape[-1]
            lm_logp = np.zeros_like(logp)
            if self.lm is not None and conf.lm_weight > 0:
                y_in = np.asarray(
                    [h[-1] if h else EOS for h in hyps], np.int32)
                lm_logp, lm_state = self.lm.predict(y_in, lm_state)

            # children generation, same reference-exact structure (and
            # add_ctc_score pairing quirk) as _beam_one_las above
            if step_i < min_len:
                bad = np.ones(beam, bool)
            else:
                best_non_eos = np.max(np.delete(logp, EOS, axis=1), axis=1)
                bad = logp[:, EOS] < conf.eos_threshold * best_non_eos

            w_ctc = conf.ctc_weight
            children = []
            for k in range(beam):
                if scores[k] <= -1e29:
                    continue
                cands = np.argsort(-logp[k], kind="stable")[:beam]
                base = ((1.0 - w_ctc) * (scores_att[k] + logp[k, cands])
                        + conf.lm_weight
                        * (scores_lm[k] + lm_logp[k, cands]))
                if conf.length_penalty != 0:
                    base = base + conf.length_penalty * (step_i + 1)
                if ctc_scorer is not None:
                    psi, r_new = ctc_scorer(hyps[k], cands, ctc_states[k])
                    joint = base + w_ctc * psi
                    perm = np.argsort(-joint, kind="stable")
                    prune_sc = joint[perm]
                else:
                    psi = r_new = None
                    prune_sc = base
                for j in range(len(cands)):
                    c = int(cands[j])
                    if c == EOS and bad[k]:
                        continue
                    sc = float(prune_sc[j])
                    if conf.length_norm:
                        sc = sc / (step_i + 1)
                    children.append({
                        "parent": k, "tok": c, "score": sc,
                        "att": float(scores_att[k] + logp[k, c]),
                        "lm": float(scores_lm[k] + lm_logp[k, c]),
                        "psi": float(psi[j]) if psi is not None
                        else float(scores_ctc[k]),
                        "state": r_new[perm[j]] if psi is not None
                        else ctc_states[k]})

            children.sort(key=lambda d: -d["score"])
            children = children[:beam]
            new_hyps, new_scores, new_satt, new_y = [], [], [], []
            parents, new_slm, new_ctc_beam = [], [], []
            for ch in children:
                k, v, sc = ch["parent"], ch["tok"], ch["score"]
                if v == EOS:
                    finished.append({"hyp": hyps[k] + [EOS], "score": sc,
                                     "score_att": float(ch["att"])})
                    continue
                new_hyps.append(hyps[k] + [v])
                new_scores.append(sc)
                new_satt.append(ch["att"])
                new_y.append(v)
                parents.append(k)
                new_slm.append(ch["lm"])
                new_ctc_beam.append((ch["state"], ch["psi"]))
            if len(finished) >= beam:
                finished = finished[:beam]
                break
            if not new_hyps:
                break
            while len(new_hyps) < beam:
                new_hyps.append(new_hyps[-1])
                new_scores.append(-1e30)
                new_satt.append(new_satt[-1])
                new_y.append(new_y[-1])
                parents.append(parents[-1])
                new_slm.append(new_slm[-1])
                new_ctc_beam.append(new_ctc_beam[-1])
            par = jnp.asarray(parents, jnp.int32)
            caches = jax.tree.map(lambda x: x[par], caches)
            if self.lm is not None:
                lm_state = jax.tree.map(lambda x: x[par], lm_state)
            hyps = new_hyps
            scores = np.asarray(new_scores, np.float32)
            scores_att = np.asarray(new_satt, np.float32)
            scores_lm = np.asarray(new_slm, np.float32)
            if ctc_scorer is not None:
                ctc_states = [c[0] for c in new_ctc_beam]
                scores_ctc = np.asarray([c[1] for c in new_ctc_beam],
                                        np.float32)
            y = jnp.asarray(new_y, jnp.int32)

        if len(finished) < beam:  # top up with live hyps (reference global
            live = [{"hyp": hyps[i] + [EOS], "score": float(scores[i])}
                    for i in range(len(hyps)) if scores[i] > -1e29]
            finished.extend(live[: beam - len(finished)])
        finished.sort(key=lambda d: -d["score"])
        nbest = [[t for t in f["hyp"] if t != EOS]
                 for f in finished[: self.conf.n_best]]
        return nbest[0], nbest

    # ------------------------------------------------------------------ #
    def decode(self, xs, xlens):
        """Dispatch like reference Speech2Text.decode (:709-831)."""
        speakers = None
        if isinstance(xs, dict):  # batch dict passthrough
            speakers = xs.get("speakers")
            xlens = xs["xlens"]
            xs = xs["xs"]
        if self.model.dec_fwd is None or \
                (self.model.ctc_weight >= 1.0):
            if self.conf.beam_width > 1:
                return self.decode_ctc_beam(xs, xlens)
            return self.decode_ctc_greedy(xs, xlens)
        if isinstance(self.dec, RNNTransducer):
            if self.conf.beam_width > 1:
                return self.decode_transducer_beam(xs, xlens)
            return self.decode_transducer_greedy(xs, xlens)
        if self.conf.beam_width <= 1 and isinstance(self.dec, RNNDecoder):
            return self.decode_attention_greedy(xs, xlens)
        conf = self.conf
        if isinstance(self.dec, RNNDecoder) and \
                self.dec.attn_type == "cif":
            # CIF decode is greedy over the fired contexts (the contexts
            # are integrate-and-fire, not query-driven). Offline: the
            # unscaled firings in one scan. Streaming: decode_cif_blockwise
            # (reference incremental mode, cif.py:95-146).
            return self.decode_attention_greedy(xs, xlens)
        fusion_free = (conf.lm_weight == 0 and conf.ctc_weight == 0
                       and conf.ilm_weight == 0 and not self.ensemble
                       and self.lm_second is None and self.lm_bwd is None
                       and not conf.fwd_bwd_attention
                       and not conf.state_carry_over
                       and conf.coverage_penalty == 0)
        if conf.device_beam and fusion_free and \
                isinstance(self.dec, RNNDecoder):
            return self.decode_attention_beam_device(xs, xlens)
        return self.decode_attention_beam(xs, xlens, speakers=speakers)

    # ------------------------------------------------------------------ #
    def decode_streaming(self, x_whole, blank_threshold: int = 40,
                         min_accum_frames: int = 0, backoff: bool = True):
        """Block-synchronous streaming decode of ONE utterance
        (reference ``Speech2Text.decode_streaming`` speech2text.py:550-698):
        chunked encoder with explicit caches/carries + block-sync beam
        (CTC prefix or transducer) + CTC-VAD segment resets.

        Reset semantics (parity with the reference loop):
          * on a VAD reset the running best prefix is COMMITTED for every
            decoder type (``best_hyp_id_session.extend``, :683-686) and the
            beam restarts;
          * RNN encoders reset their carry and, with ``backoff``, re-encode
            the PREVIOUS block to warm the state (:601-609);
          * transformer encoder caches persist across resets (the
            ``not is_transformer_enc`` guard, :602);
          * blank counting carries across blocks (``Streaming._n_blanks``).

        x_whole: [T, D] features. Returns (hyp ids, stats dict with rtf/...).
        """
        import time
        from ...frontends.streaming import StreamingDriver, CtcVAD
        from .ctc import CTCBlockSyncBeam
        from ..encoders.transformer import XformerEncoder
        from ..encoders.rnn import RNNEncoder

        enc = self.model.encoder
        is_xformer = isinstance(enc, XformerEncoder)
        if is_xformer and isinstance(self.dec, RNNDecoder) and \
                self.dec.attn_type == "mocha":
            fusion_free = (self.conf.lm_weight == 0
                           and self.conf.ctc_weight == 0
                           and not self.ensemble
                           and self.lm_second is None
                           and self.lm_bwd is None)
            if fusion_free and self.conf.device_beam:
                return self.decode_streaming_attention_device(x_whole)
            return self.decode_streaming_attention(x_whole)
        total_in, hop_in = enc.block_input_frames()
        cnn_ctx_in = enc.stream_geometry()[1]
        factor = enc.subsampling_factor

        if is_xformer:
            self._get_stream_step()
            state = enc.init_stream_cache(1)
            step = lambda blk, st: self._stream_step(
                jnp.asarray(blk)[None], st)
        else:
            assert isinstance(enc, RNNEncoder)
            rnn_step = self._get_rnn_stream_step()
            state = None  # carry: None = fresh segment
            step = lambda blk, st: rnn_step(jnp.asarray(blk)[None], st)

        use_rnnt = isinstance(self.dec, RNNTransducer)
        if use_rnnt:
            rnnt_beam = {(): 0.0}
            rnnt_cache: dict = {}
            committed: list[int] = []
        else:
            lm_fn = self._make_ctc_lm_fn() if (
                self.lm is not None and self.conf.lm_weight > 0) else None
            beam = CTCBlockSyncBeam(self.conf.beam_width,
                                    lm_fn=lm_fn,
                                    lm_weight=self.conf.lm_weight)
        vad = CtcVAD(factor=factor, blank_threshold=blank_threshold,
                     min_accum_frames=min_accum_frames)
        driver = StreamingDriver(x_whole, total_in, hop_in, cnn_ctx_in)

        t0 = time.time()
        n_frames = 0
        n_resets = 0
        is_reset = False
        prev_block = None
        commits: list[list[int]] = []
        for block, n_new, is_last in driver:
            if is_reset:
                # segment start (detected in the previous block)
                if not is_xformer:
                    state = None
                    if backoff and prev_block is not None:
                        # warm the fresh carry on the previous block
                        # (reference backoff re-encode, :603-608)
                        _, _, state = step(prev_block, state)
                is_reset = False
            eouts_blk, lp_blk, state = step(block, state)
            prev_block = block
            n_out = -(-n_new // factor)
            n_frames += n_new
            if use_rnnt:
                # block-synchronous transducer beam
                # (reference rnn_transducer.py:767-819)
                rnnt_beam = self.transducer_beam_frames(
                    np.asarray(eouts_blk)[0][:n_out], rnnt_beam, rnnt_cache,
                    version="mono")
            else:
                beam.step(np.asarray(lp_blk)[0][:n_out])
            if lp_blk is not None:
                lp = np.asarray(lp_blk)[0][:n_out]
                is_reset = vad.step(np.argmax(lp, -1),
                                    np.exp(lp).max(-1), n_new)
            if is_reset and not is_last:
                # commit the best running prefix, restart the beam
                if use_rnnt:
                    best = max(rnnt_beam.items(), key=lambda kv: kv[1])[0]
                    committed.extend(best)
                    commits.append(list(committed))
                    rnnt_beam = {(): 0.0}
                    rnnt_cache.clear()
                else:
                    commits.append(list(beam.commit_and_reset()))
                vad.reset()
                n_resets += 1
            else:
                is_reset = False
        if use_rnnt:
            hyp = committed + list(
                max(rnnt_beam.items(), key=lambda kv: kv[1])[0])
        else:
            hyp = beam.hypotheses()[0]["hyp"]
        elapsed = time.time() - t0
        stats = {"rtf": elapsed / max(n_frames * 0.01, 1e-6),
                 "n_resets": n_resets, "n_frames": n_frames,
                 "commits": commits}
        return hyp, stats

    def _get_stream_step(self):
        """Jitted per-block encoder step (+CTC posteriors), shared by every
        streaming decode path."""
        if not hasattr(self, "_stream_step"):
            def _step(mdl, xb, c):
                eouts_blk, new_c = mdl.encoder.streaming_step(xb, c)
                lp = mdl.ctc.log_probs(eouts_blk) \
                    if mdl.ctc is not None else None
                return eouts_blk, lp, new_c
            f = jax.jit(
                lambda p, xb, cache: self.model.apply(
                    {"params": p}, xb, cache, method=_step))
            self._stream_step = lambda xb, cache: f(self.params, xb, cache)
        return self._stream_step

    def _get_rnn_stream_step(self):
        """Jitted per-block RNN-encoder step (+CTC posteriors); carry=None
        (fresh segment) and carry=pytree compile separately."""
        if not hasattr(self, "_rnn_stream_step"):
            def _step(mdl, xb, c):
                eouts_blk, new_c = mdl.encoder.streaming_step(xb, c)
                lp = mdl.ctc.log_probs(eouts_blk) \
                    if mdl.ctc is not None else None
                return eouts_blk, lp, new_c
            f = jax.jit(
                lambda p, xb, carry: self.model.apply(
                    {"params": p}, xb, carry, method=_step))
            self._rnn_stream_step = lambda xb, carry: f(self.params, xb,
                                                        carry)
        return self._rnn_stream_step

    # ------------------------------------------------------------------ #
    def decode_streaming_attention_device(self, x_whole,
                                          steps_per_block: int = 4):
        """Device-resident block-synchronous MoChA/MMA beam: the WHOLE
        stream decodes in ONE jit dispatch — an outer ``lax.scan`` over
        encoder blocks with the chunked encoder cache, the accumulated
        encoder buffer, the K-row beam, and the finished-hypothesis store
        all carried in-graph; per block an inner ``lax.scan`` runs up to
        ``steps_per_block`` label-synchronous expansions with IN-GRAPH
        HYPOTHESIS PARKING (a row whose hard monotonic attention fires no
        boundary keeps its pre-step decoder carry — the rollback of the
        host loop's "hyps without boundary", reference las.py:1534-1560 —
        and retries when the next block lands).

        Fast path for the fusion-free case (no LM / joint-CTC / ensemble —
        those stay in the host loop ``decode_streaming_attention``). The
        per-block token budget is ``steps_per_block`` (the host loop is
        unbounded); un-emitted tokens carry to the next block, so the
        search differs only when >steps_per_block boundaries fall inside
        one block.

        Returns (hyp ids, stats incl. rtf measured forced-sync).
        """
        import time
        from ...frontends.streaming import StreamingDriver

        conf = self.conf
        dec: RNNDecoder = self.dec
        K = conf.beam_width
        enc = self.model.encoder
        total_in, hop_in = enc.block_input_frames()
        _, cnn_ctx_in, _, n_c, _ = enc.stream_geometry()
        factor = enc.subsampling_factor

        blocks, n_news = [], []
        for b, n_new, _ in StreamingDriver(x_whole, total_in, hop_in,
                                           cnn_ctx_in):
            blocks.append(b)
            n_news.append(-(-n_new // factor))  # real OUT frames per block
        n_frames = len(x_whole)
        # bucket the block count so nearby utterance lengths share one
        # compiled program (pad blocks are all-zero with n_out=0: the beam
        # sees no new frames and every row stays parked)
        n_blk = -(-len(blocks) // 8) * 8
        while len(blocks) < n_blk:
            blocks.append(np.zeros_like(blocks[0]))
            n_news.append(0)
        blocks = jnp.asarray(np.stack(blocks))        # [N, total_in, D]
        n_outs = jnp.asarray(n_news, jnp.int32)
        t_total = n_blk * n_c
        t_real = int(sum(n_news))
        max_len = max(int(t_real * conf.max_len_ratio), 2)
        S = steps_per_block

        key = (K, n_blk, S, max_len)
        if not hasattr(self, "_stream_beam_cache"):
            self._stream_beam_cache = {}
        if key not in self._stream_beam_cache:
            def fn(p, blocks, n_outs):
                NEG = jnp.float32(-1e30)
                apply = lambda method, *a: self.model.apply(
                    {"params": p}, *a, method=method)
                enc_cache = apply(
                    lambda m, b: m.encoder.init_stream_cache(b), 1)
                d_enc = dec.enc_n_units
                e_buf0 = jnp.zeros((t_total, d_enc), blocks.dtype)
                carry0 = dec.init_carry(K, t_total, blocks.dtype)
                scores0 = jnp.full((K,), NEG).at[0].set(0.0)
                toks0 = jnp.full((K, max_len), PAD, jnp.int32)
                bounds0 = jnp.zeros((K, max_len), jnp.int32)
                lens0 = jnp.zeros((K,), jnp.int32)
                y0 = jnp.full((K,), EOS, jnp.int32)
                parked0 = jnp.zeros((K,), bool)
                best_tok0 = jnp.full((max_len,), PAD, jnp.int32)
                best_bd0 = jnp.zeros((max_len,), jnp.int32)
                best_sc0 = NEG

                def block_step(state, inp):
                    (enc_cache, e_buf, t_acc, carry, scores, toks, bounds,
                     lens, y, best_tok, best_bd, best_sc) = state
                    block, n_out = inp
                    eouts_blk, enc_cache = apply(
                        lambda m, xb, c: m.encoder.streaming_step(xb, c),
                        block[None], enc_cache)
                    e_buf = jax.lax.dynamic_update_slice(
                        e_buf, eouts_blk[0], (t_acc, 0))
                    # t_acc counts REAL frames: the last (padded) block
                    # contributes only its valid tail to the mask/caps
                    t_acc = t_acc + n_out
                    ebk = jnp.broadcast_to(e_buf[None],
                                           (K,) + e_buf.shape)
                    kc = apply(
                        lambda m, x: m.dec_fwd.precompute_keys(x), ebk)
                    mask = jnp.broadcast_to(
                        jnp.arange(t_total) < t_acc, (K, t_total))

                    parked = jnp.zeros((K,), bool)

                    def tok_step(st, _):
                        (carry, scores, toks, bounds, lens, y, parked,
                         best_tok, best_bd, best_sc) = st
                        carry_post, logits, alpha = apply(
                            lambda m, *a: m.dec_fwd.decode_step(*a),
                            carry, y, kc, ebk, mask)
                        # alpha: [K, H, T] one-hot boundaries (hard mode)
                        fired = jnp.sum(alpha, axis=(1, 2)) > 0
                        t_bd = jnp.argmax(jnp.mean(alpha, 1), -1)  # [K]
                        alive = scores > NEG / 2
                        # length cap grows with the REAL accumulated
                        # frames (host loop: max_tokens per block)
                        cap = jnp.maximum(
                            (t_acc.astype(jnp.float32)
                             * conf.max_len_ratio).astype(jnp.int32), 2)
                        cap = jnp.minimum(cap, max_len)
                        can = alive & ~parked & fired & (lens < cap)
                        logp = jax.nn.log_softmax(
                            conf.softmax_smoothing
                            * logits.astype(jnp.float32), -1)
                        V = logp.shape[-1]
                        total = jnp.where(can[:, None],
                                          scores[:, None] + logp, NEG)

                        # eos stays in the candidate pool (host-loop
                        # semantics: a hypothesis only FINISHES when its
                        # eos extension ranks among the top candidates);
                        # rows failing the eos threshold mask it out
                        non_eos = logp.at[:, EOS].set(NEG)
                        ok_eos = can & (logp[:, EOS] >= conf.eos_threshold
                                        * jnp.max(non_eos, -1))
                        total = total.at[:, EOS].set(
                            jnp.where(ok_eos, total[:, EOS], NEG))

                        # candidate pool: K "keep" slots (parked/unfired
                        # survivors hold their score) + K*V expansions;
                        # take 2K, route eos selections to the finished
                        # store, keep the best K non-eos as the next beam
                        keep_sc = jnp.where(alive & ~can, scores, NEG)
                        all_sc = jnp.concatenate(
                            [keep_sc, total.reshape(-1)])
                        sc2, ix2 = jax.lax.top_k(all_sc, 2 * K)
                        keep2 = ix2 < K
                        par2 = jnp.where(keep2, ix2, (ix2 - K) // V)
                        tok2 = ((ix2 - K) % V).astype(jnp.int32)
                        eos2 = (~keep2) & (tok2 == EOS) & (sc2 > NEG / 2)
                        L2 = lens[par2] + 1
                        fin2 = sc2 / jnp.maximum(L2, 1) \
                            if conf.length_norm else \
                            sc2 + conf.length_penalty * L2
                        fin2 = jnp.where(eos2, fin2, NEG)
                        jf = jnp.argmax(fin2)
                        kf = par2[jf]
                        cand_tok = toks[kf].at[lens[kf]].set(EOS)
                        upd = fin2[jf] > best_sc
                        best_sc = jnp.where(upd, fin2[jf], best_sc)
                        best_tok = jnp.where(upd, cand_tok, best_tok)
                        best_bd = jnp.where(upd, bounds[kf], best_bd)

                        surv = jnp.where(eos2, NEG, sc2)
                        top_sc, sel = jax.lax.top_k(surv, K)
                        is_keep = keep2[sel]
                        parent = par2[sel]
                        tok = tok2[sel]

                        def pick(pre, post):
                            pre_p = pre[parent]
                            post_p = post[parent]
                            m = is_keep.reshape(
                                (K,) + (1,) * (pre_p.ndim - 1))
                            return jnp.where(m, pre_p, post_p)
                        carry = jax.tree.map(pick, carry, carry_post)
                        lens_p = lens[parent]
                        toks_p = toks[parent]
                        bounds_p = bounds[parent]
                        toks = jnp.where(
                            is_keep[:, None], toks_p,
                            jax.vmap(lambda t, l, v: t.at[l].set(v))(
                                toks_p, lens_p, tok))
                        bounds = jnp.where(
                            is_keep[:, None], bounds_p,
                            jax.vmap(lambda b, l, v: b.at[l].set(v))(
                                bounds_p, lens_p, t_bd[parent]))
                        lens = jnp.where(is_keep, lens_p, lens_p + 1)
                        last = jax.vmap(
                            lambda t, l: t[jnp.maximum(l - 1, 0)])(
                            toks_p, lens_p)
                        y = jnp.where(
                            is_keep,
                            jnp.where(lens_p > 0, last, EOS), tok)
                        scores = top_sc
                        parked = is_keep
                        return (carry, scores, toks, bounds, lens, y,
                                parked, best_tok, best_bd, best_sc), ()

                    st = (carry, scores, toks, bounds, lens, y, parked,
                          best_tok, best_bd, best_sc)
                    st, _ = jax.lax.scan(tok_step, st, None, length=S)
                    (carry, scores, toks, bounds, lens, y, parked,
                     best_tok, best_bd, best_sc) = st
                    return (enc_cache, e_buf, t_acc, carry, scores, toks,
                            bounds, lens, y, best_tok, best_bd,
                            best_sc), ()

                state0 = (enc_cache, e_buf0, jnp.int32(0), carry0,
                          scores0, toks0, bounds0, lens0, y0, best_tok0,
                          best_bd0, best_sc0)
                state, _ = jax.lax.scan(block_step, state0,
                                        (blocks, n_outs))
                (_, _, _, _, scores, toks, bounds, lens, _, best_tok,
                 best_bd, best_sc) = state
                # stream end: surviving rows force-finish and COMPETE with
                # the finished store (host-loop semantics, :1242-1251)
                sc_alive_all = scores / jnp.maximum(lens + 1, 1) \
                    if conf.length_norm else \
                    scores + conf.length_penalty * (lens + 1)
                sc_alive_all = jnp.where(scores > NEG / 2, sc_alive_all,
                                         NEG)
                k0 = jnp.argmax(sc_alive_all)
                use_alive = sc_alive_all[k0] > best_sc
                out_tok = jnp.where(use_alive, toks[k0], best_tok)
                out_bd = jnp.where(use_alive, bounds[k0], best_bd)
                out_sc = jnp.where(use_alive, sc_alive_all[k0], best_sc)
                return out_tok, out_bd, out_sc

            self._stream_beam_cache[key] = jax.jit(fn)

        t0 = time.time()
        toks, bds, sc = self._stream_beam_cache[key](self.params, blocks,
                                                     n_outs)
        toks = np.asarray(toks)  # forces completion through the tunnel
        bds = np.asarray(bds)
        elapsed = time.time() - t0
        hyp, bounds = [], []
        for t, b in zip(toks, bds):
            if t in (PAD, EOS):
                break
            hyp.append(int(t))
            bounds.append(int(b))
        stats = {"rtf": elapsed / max(n_frames * 0.01, 1e-6),
                 "n_resets": 0, "n_frames": n_frames,
                 "boundaries": bounds, "n_out_frames": t_total,
                 "score": float(sc)}
        return hyp, stats

    # ------------------------------------------------------------------ #
    def decode_streaming_attention(self, x_whole, t_pad_blocks: int = 8):
        """Block-synchronous MoChA/MMA attention-decoder beam search over a
        streamed utterance (reference ``RNNDecoder.beam_search_block_sync``
        las.py:1492-1706).

        Reference semantics reproduced:
          * per encoder block, label-synchronous beam expansion; a
            hypothesis whose hard monotonic attention finds NO boundary in
            the frames seen so far is parked ("hyps without boundary",
            las.py:1534-1560) with its decoder state rolled back, and
            retried when the next block arrives;
          * parked and expanded hypotheses compete for the beam
            (las.py:1652-1660 merge + prune);
          * joint CTC prefix scoring and LM shallow fusion advance
            chunk-by-chunk (``register_new_chunk``, ctc.py:803-806).
        Difference by design: the full accumulated encoder output buffer is
        kept on device (utterances are <=1600 frames, SURVEY §5), so the
        reference's ``key_tail`` carry (las.py:1699-1704) — needed there
        because old frames are discarded — does not arise: chunkwise
        attention windows always see their full lookback.

        Returns (hyp ids, stats incl. per-token boundary frames for
        streamability metrics).
        """
        import time
        from ...frontends.streaming import StreamingDriver

        conf = self.conf
        dec: RNNDecoder = self.dec
        beam = conf.beam_width
        enc = self.model.encoder
        total_in, hop_in = enc.block_input_frames()
        _, cnn_ctx_in, _, n_c, _ = enc.stream_geometry()
        factor = enc.subsampling_factor
        stream_step = self._get_stream_step()
        t_pad_mult = max(n_c * t_pad_blocks, 64)

        t0 = time.time()
        cache = enc.init_stream_cache(1)
        e_acc: list[np.ndarray] = []     # accumulated encoder frames
        lp_acc: list[np.ndarray] = []    # accumulated CTC log-probs
        t_acc = 0
        t_pad = 0

        use_ctc = conf.ctc_weight > 0 and self.model.ctc is not None
        ctc_scorer = None
        use_lm = self.lm is not None and conf.lm_weight > 0

        # beam rows (host bookkeeping; NN state lives in `carry` on device)
        hyps: list[list[int]] = [[] for _ in range(beam)]
        bounds: list[list[int]] = [[] for _ in range(beam)]
        scores = np.full(beam, -1e30, np.float32)
        scores[0] = 0.0
        scores_ctc = np.zeros(beam, np.float32)
        ctc_states = [None] * beam
        lm_states = [self.lm.initial_state(1) if use_lm else None] * beam
        alive = np.zeros(beam, bool)
        alive[0] = True
        y = jnp.full((beam,), EOS, jnp.int32)
        carry = None
        finished: list[dict] = []
        n_frames = 0

        def _mix_carry(pre, post, par, take_post):
            m = jnp.asarray(take_post)

            def mix(a, b):
                g_pre, g_post = a[par], b[par]
                mm = m.reshape((beam,) + (1,) * (g_pre.ndim - 1))
                return jnp.where(mm, g_post, g_pre)
            return jax.tree.map(mix, pre, post)

        for block, n_new, is_last in StreamingDriver(
                x_whole, total_in, hop_in, cnn_ctx_in):
            eouts_blk, lp_blk, cache = stream_step(
                jnp.asarray(block)[None], cache)
            n_out = -(-n_new // factor)
            e_acc.append(np.asarray(eouts_blk)[0][:n_out])
            n_frames += n_new
            if use_ctc:
                lp_new = np.asarray(lp_blk)[0][:n_out]
                if ctc_scorer is None:
                    ctc_scorer = CTCPrefixScorer(lp_new)
                    ctc_states = [ctc_scorer.initial_state() if alive[k]
                                  else None for k in range(beam)]
                else:
                    ctc_scorer.register_new_chunk(lp_new)
                    ctc_states = [
                        ctc_scorer.extend_state(hyps[k], ctc_states[k])
                        if ctc_states[k] is not None else None
                        for k in range(beam)]
            t_acc += n_out

            # (re)build padded device tensors when the pad bucket grows
            new_t_pad = -(-t_acc // t_pad_mult) * t_pad_mult
            if new_t_pad != t_pad or carry is None:
                old_t_pad, t_pad = t_pad, new_t_pad
                e_np = np.concatenate(e_acc, 0)
                e_pad = np.zeros((t_pad, e_np.shape[1]), e_np.dtype)
                e_pad[:t_acc] = e_np
                e_t = jnp.asarray(np.repeat(e_pad[None], beam, 0))
                kc = self._keys(e_t)
                if carry is None:
                    carry = dec.init_carry(beam, t_pad, e_t.dtype)
                else:
                    # grow the alpha carry's T axis (one-hot boundaries)
                    aw = jnp.pad(carry[1],
                                 ((0, 0), (0, 0), (0, t_pad - old_t_pad)))
                    carry = (carry[0], aw) + carry[2:]
            else:
                e_np = np.concatenate(e_acc, 0)
                e_pad = np.zeros((t_pad, e_np.shape[1]), e_np.dtype)
                e_pad[:t_acc] = e_np
                e_t = jnp.asarray(np.repeat(e_pad[None], beam, 0))
                kc = self._keys(e_t)
            mask = make_pad_mask(jnp.full((beam,), t_acc, jnp.int32), t_pad)

            max_tokens = max(int(t_acc * conf.max_len_ratio), 2)
            parked = ~alive.copy()
            while not parked.all():
                carry_post, logits, aw = self._step(carry, y, kc, e_t, mask)
                alpha = np.asarray(aw)            # [beam, H, T] one-hot
                fired = alpha.sum(axis=(1, 2)) > 0
                under_cap = np.asarray(
                    [len(h) < max_tokens for h in hyps])
                expand = alive & ~parked & fired & under_cap
                parked |= ~fired | ~under_cap     # no boundary -> wait
                if not expand.any():
                    break
                logp = np.asarray(jax.nn.log_softmax(
                    conf.softmax_smoothing * logits.astype(jnp.float32), -1))
                V = logp.shape[-1]
                lm_logp = np.zeros_like(logp)
                new_lm_states = lm_states
                if use_lm:
                    new_lm_states = list(lm_states)
                    for k in np.where(expand)[0]:
                        lp_k, st = self.lm.predict(
                            np.asarray([hyps[k][-1] if hyps[k] else EOS],
                                       np.int32), lm_states[k])
                        lm_logp[k] = np.asarray(lp_k[0])
                        new_lm_states[k] = st

                total = scores[:, None] + logp + conf.lm_weight * lm_logp
                best_non_eos = np.max(np.delete(logp, EOS, axis=1), axis=1)
                bad_eos = logp[:, EOS] < conf.eos_threshold * best_non_eos
                if len(max(hyps, key=len)) < int(t_acc * conf.min_len_ratio):
                    bad_eos[:] = True
                total[bad_eos, EOS] = -1e30

                new_ctc = None
                if use_ctc and ctc_scorer is not None:
                    ctc_cand = min(beam * 4, V)
                    tot2 = np.full_like(total, -1e30)
                    new_ctc = [[None] * V for _ in range(beam)]
                    for k in np.where(expand)[0]:
                        cands = np.argsort(logp[k])[::-1][:ctc_cand]
                        psi, r_new = ctc_scorer(hyps[k], cands, ctc_states[k])
                        tot2[k, cands] = (
                            scores[k]
                            + (1 - conf.ctc_weight) * logp[k, cands]
                            + conf.ctc_weight * (psi - scores_ctc[k])
                            + conf.lm_weight * lm_logp[k, cands])
                        for ci, c in enumerate(cands):
                            new_ctc[k][c] = (r_new[ci], float(psi[ci]))
                        tot2[k, EOS] = -1e30 if bad_eos[k] else tot2[k, EOS]
                    total = tot2
                total[~expand, :] = -1e30

                # candidate pool: parked survivors keep their slot scores
                cands = [("keep", int(k), -1, float(scores[k]))
                         for k in np.where(alive & parked)[0]]
                flat = total.reshape(-1)
                n_take = beam * 2
                top = np.argpartition(-flat, min(n_take, flat.size - 1))[
                    :n_take]
                top = top[np.argsort(-flat[top])]
                for idx in top:
                    k, v = divmod(int(idx), V)
                    sc = float(flat[idx])
                    if sc <= -1e29:
                        continue
                    cands.append(("exp", k, v, sc))
                cands.sort(key=lambda c: -c[3])

                sel, par, take_post, new_y = [], [], [], []
                n_hyps, n_bounds = [], []
                n_scores, n_sctc, n_cstates, n_lmst, n_alive = \
                    [], [], [], [], []
                for kind, k, v, sc in cands:
                    if kind == "exp" and v == EOS:
                        L = len(hyps[k]) + 1
                        fsc = sc / max(L, 1) if conf.length_norm else \
                            sc + conf.length_penalty * L
                        finished.append(
                            {"hyp": hyps[k] + [EOS], "score": fsc,
                             "bounds": list(bounds[k])})
                        continue
                    if len(sel) == beam:
                        continue
                    sel.append(kind)
                    par.append(k)
                    take_post.append(kind == "exp")
                    if kind == "keep":
                        new_y.append(hyps[k][-1] if hyps[k] else EOS)
                        n_hyps.append(hyps[k])
                        n_bounds.append(bounds[k])
                        n_scores.append(scores[k])
                        n_sctc.append(scores_ctc[k])
                        n_cstates.append(ctc_states[k])
                        n_lmst.append(lm_states[k])
                        n_alive.append(True)
                    else:
                        t_bd = int(np.argmax(alpha[k].mean(0)))
                        new_y.append(v)
                        n_hyps.append(hyps[k] + [v])
                        n_bounds.append(bounds[k] + [t_bd])
                        n_scores.append(sc)
                        if new_ctc is not None and \
                                new_ctc[k][v] is not None:
                            n_cstates.append(new_ctc[k][v][0])
                            n_sctc.append(new_ctc[k][v][1])
                        else:
                            n_cstates.append(ctc_states[k])
                            n_sctc.append(scores_ctc[k])
                        n_lmst.append(new_lm_states[k] if use_lm else None)
                        n_alive.append(True)
                if not any(s == "exp" for s in sel):
                    break
                while len(sel) < beam:   # dead padding rows
                    sel.append("keep")
                    par.append(par[-1] if par else 0)
                    take_post.append(False)
                    new_y.append(EOS)
                    n_hyps.append([])
                    n_bounds.append([])
                    n_scores.append(-1e30)
                    n_sctc.append(0.0)
                    n_cstates.append(ctc_states[0])
                    n_lmst.append(lm_states[0])
                    n_alive.append(False)

                par_j = jnp.asarray(par, jnp.int32)
                carry = _mix_carry(carry, carry_post, par_j,
                                   np.asarray(take_post))
                hyps = n_hyps
                bounds = n_bounds
                scores = np.asarray(n_scores, np.float32)
                scores_ctc = np.asarray(n_sctc, np.float32)
                ctc_states = n_cstates
                lm_states = n_lmst
                alive = np.asarray(n_alive)
                parked = np.asarray(
                    [s == "keep" for s in sel]) | ~alive
                y = jnp.asarray(new_y, jnp.int32)
                if len(finished) >= beam * 2:
                    parked[:] = True
            # next block: every surviving hyp may retry with new frames

        for k in np.where(alive)[0]:     # force-finish at stream end
            sc = float(scores[k])
            L = len(hyps[k]) + 1
            fsc = sc / max(L, 1) if conf.length_norm else \
                sc + conf.length_penalty * L
            finished.append({"hyp": hyps[k] + [EOS], "score": fsc,
                             "bounds": list(bounds[k])})
        if not finished:
            finished = [{"hyp": [EOS], "score": 0.0, "bounds": []}]
        finished.sort(key=lambda d: -d["score"])
        best = finished[0]
        elapsed = time.time() - t0
        stats = {"rtf": elapsed / max(n_frames * 0.01, 1e-6),
                 "n_resets": 0, "n_frames": n_frames,
                 "boundaries": best["bounds"],
                 "n_out_frames": t_acc}
        return [t for t in best["hyp"] if t != EOS], stats

    # ------------------------------------------------------------------ #
    def decode_streaming_device(self, x_whole):
        """Whole-stream on-device greedy streaming decode: ONE jit dispatch
        runs the cached encoder + CTC over all blocks (lax.scan); the host
        only collapses the final path. The low-latency-budget complement to
        ``decode_streaming`` (which runs a beam + VAD per block).

        Returns (hyp ids, stats)."""
        import time
        from ...frontends.streaming import StreamingDriver
        from ..encoders.transformer import XformerEncoder
        from .ctc import collapse_path

        enc = self.model.encoder
        assert isinstance(enc, XformerEncoder)
        total_in, hop_in = enc.block_input_frames()
        _, cnn_ctx_in, _, n_c, _ = enc.stream_geometry()
        factor = enc.subsampling_factor
        if not hasattr(self, "_stream_scan"):
            f = jax.jit(lambda p, blocks: self.model.apply(
                {"params": p}, blocks,
                method=self.model.streaming_ctc_scan))
            self._stream_scan = lambda blocks: f(self.params, blocks)

        t0 = time.time()
        blocks = []
        n_valid = []
        for block, n_new, _ in StreamingDriver(x_whole, total_in, hop_in,
                                               cnn_ctx_in):
            blocks.append(block)
            n_valid.append(-(-n_new // factor))
        # pad the block count to a multiple of 8 -> few compiled shapes
        while len(blocks) % 8:
            blocks.append(np.zeros_like(blocks[0]))
            n_valid.append(0)
        ids = np.asarray(self._stream_scan(
            jnp.asarray(np.stack(blocks))))       # [N, n_c]
        path = np.concatenate(
            [ids[i, :nv] for i, nv in enumerate(n_valid)])
        hyp = collapse_path(path)
        elapsed = time.time() - t0
        n_frames = x_whole.shape[0]
        return hyp, {"rtf": elapsed / max(n_frames * 0.01, 1e-6),
                     "n_frames": n_frames, "n_resets": 0}

    # ------------------------------------------------------------------ #
    def _rnnt_fns(self):
        if not hasattr(self, "_rnnt_pred"):
            fp = jax.jit(lambda p, y, c: self.model.apply(
                {"params": p}, y, c,
                method=lambda m, y, c: m.dec_fwd.pred_net(y, c)))
            fj = jax.jit(lambda p, et, pt: self.model.apply(
                {"params": p}, et, pt,
                method=lambda m, et, pt: m.dec_fwd.joint_step(et, pt)))
            self._rnnt_pred = lambda y, c: fp(self.params, y, c)
            self._rnnt_joint = lambda et, pt: fj(self.params, et, pt)
        return self._rnnt_pred, self._rnnt_joint

    def _pred_state(self, prefix: tuple, cache: dict):
        """Prediction-net state for a hyp prefix, cached by prefix
        (reference batchfy_pred_net rnn_transducer.py:549-590)."""
        if prefix in cache:
            return cache[prefix]
        pred, _ = self._rnnt_fns()
        if not prefix:
            po, carry = pred(jnp.asarray([[EOS]], jnp.int32), None)
        else:
            _, carry_prev = self._pred_state(prefix[:-1], cache)
            po, carry = pred(jnp.asarray([[prefix[-1]]], jnp.int32),
                             carry_prev)
        cache[prefix] = (po[:, 0], carry)
        return cache[prefix]

    def transducer_beam_frames(self, e_frames, beam, pred_cache,
                               version: str = "tsd", max_exp: int = 3):
        """Advance a transducer beam over frames (time-synchronous search,
        reference _time_sync/_time_sync_mono rnn_transducer.py:592-765).

        beam: dict prefix-tuple -> log score (merged in log space).
        Returns the updated beam.
        """
        conf = self.conf
        _, joint = self._rnnt_fns()
        n_exp = 1 if version == "mono" else max_exp
        kpad = conf.beam_width  # fixed joint batch -> one compiled shape

        def ensure_states(prefixes):
            """One batched pred-net dispatch for all uncached prefixes
            (their parents are always cached beam entries)."""
            pred, _ = self._rnnt_fns()
            missing = [p for p in prefixes
                       if p not in pred_cache and p and
                       p[:-1] in pred_cache]
            if not missing:
                return
            n = len(missing)
            carries = [pred_cache[p[:-1]][1] for p in missing]
            ys = [[p[-1]] for p in missing]
            while len(carries) < kpad:
                carries.append(carries[-1])
                ys.append(ys[-1])
            carries, ys = carries[:kpad], ys[:kpad]
            carry_b = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, 0), *carries)
            po, nc = pred(jnp.asarray(ys, jnp.int32), carry_b)
            for i, p in enumerate(missing[:kpad]):
                pred_cache[p] = (po[i:i + 1, 0],
                                 jax.tree.map(lambda x: x[i:i + 1], nc))

        def joint_logps(et, prefixes):
            """One joint dispatch for ALL beam prefixes (the reference
            batchfies the prediction net the same way,
            rnn_transducer.py:549-590). Returns [len(prefixes), V]."""
            ensure_states(prefixes)
            pts = [self._pred_state(p, pred_cache)[0] for p in prefixes]
            n = len(pts)
            while len(pts) < kpad:   # pad to the compiled batch
                pts.append(pts[-1])
            pt = jnp.concatenate(pts[:kpad], axis=0)
            lg = joint(jnp.repeat(et, pt.shape[0], 0), pt)
            return np.asarray(jax.nn.log_softmax(
                lg.astype(jnp.float32), -1))[:n]

        for t in range(e_frames.shape[0]):
            et = jnp.asarray(e_frames[t:t + 1])
            next_beam: dict = {}
            cur = dict(beam)
            for _ in range(n_exp):
                expansions: dict = {}
                prefixes = list(cur.keys())[:kpad]
                lps = joint_logps(et, prefixes)
                for prefix, lp in zip(prefixes, lps):
                    sc = cur[prefix]
                    # blank: hyp survives to the next frame
                    b_sc = sc + float(lp[BLANK])
                    next_beam[prefix] = np.logaddexp(
                        next_beam.get(prefix, -np.inf), b_sc)
                    top = np.argsort(lp)[::-1][: conf.beam_width + 1]
                    for k in top:
                        k = int(k)
                        if k == BLANK:
                            continue
                        new = prefix + (k,)
                        expansions[new] = np.logaddexp(
                            expansions.get(new, -np.inf), sc + float(lp[k]))
                if not expansions:
                    break
                cur = dict(sorted(expansions.items(),
                                  key=lambda kv: -kv[1])[: conf.beam_width])
                # expanded hyps also wait for the next frame (merged in log
                # space — reference merge semantics beam_search.py:151-207)
                for p, sc in cur.items():
                    next_beam[p] = np.logaddexp(
                        next_beam.get(p, -np.inf), sc)
            beam = dict(sorted(next_beam.items(),
                               key=lambda kv: -kv[1])[: conf.beam_width])
        return beam

    def decode_transducer_beam(self, xs, xlens, version: str = "tsd",
                               max_exp: int = 3):
        """Offline time-synchronous transducer beam search."""
        eouts = self.encode(xs, xlens)
        e = np.asarray(eouts["ys"]["xs"])
        el = np.asarray(eouts["ys"]["xlens"])
        out = []
        for b in range(e.shape[0]):
            pred_cache: dict = {}
            beam = {(): 0.0}
            beam = self.transducer_beam_frames(
                e[b, : int(el[b])], beam, pred_cache, version, max_exp)
            if self.conf.length_norm:
                best = max(beam.items(),
                           key=lambda kv: kv[1] / max(len(kv[0]), 1))[0]
            else:
                best = max(beam.items(), key=lambda kv: kv[1])[0]
            out.append(list(best))
        return out

    def decode_transducer_greedy(self, xs, xlens, max_symbols: int = 3):
        """Frame-synchronous greedy RNN-T decoding (reference :330-382)."""
        dec: RNNTransducer = self.dec
        eouts = self.encode(xs, xlens)
        e = np.asarray(eouts["ys"]["xs"])
        el = np.asarray(eouts["ys"]["xlens"])
        bs = e.shape[0]

        if not hasattr(self, "_rnnt_pred"):
            fp = jax.jit(lambda p, y, c: self.model.apply(
                {"params": p}, y, c,
                method=lambda m, y, c: m.dec_fwd.pred_net(y, c)))
            fj = jax.jit(lambda p, et, pt: self.model.apply(
                {"params": p}, et, pt,
                method=lambda m, et, pt: m.dec_fwd.joint_step(et, pt)))
            self._rnnt_pred = lambda y, c: fp(self.params, y, c)
            self._rnnt_joint = lambda et, pt: fj(self.params, et, pt)

        out = []
        for b in range(bs):
            hyp: list[int] = []
            pred_out, carry = self._rnnt_pred(
                jnp.asarray([[EOS]], jnp.int32), None)
            pt = pred_out[:, 0]
            for t in range(int(el[b])):
                et = jnp.asarray(e[b:b + 1, t])
                for _ in range(max_symbols):
                    logits = self._rnnt_joint(et, pt)
                    k = int(jnp.argmax(logits[0]))
                    if k == BLANK:
                        break
                    hyp.append(k)
                    pred_out, carry = self._rnnt_pred(
                        jnp.asarray([[k]], jnp.int32), carry)
                    pt = pred_out[:, 0]
            out.append(hyp)
        return out
