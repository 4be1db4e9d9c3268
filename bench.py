"""Benchmark: flagship Conformer-LAS training step on one chip.

Model dims/loss/batch follow the reference's headline Librispeech config
(conf/asr/transformer/conformer_kernel15_clamp10_hie_subsample8_las_long_
ln_large.yaml): 12L conformer d512/8H/d_ff2048 kernel15 rel-PE clamp10,
total subsample x8, LAS LSTM-1024 location-attention decoder, wp vocab
10k, CTC 0.3, effective batch 384k frames per update (the conf's 24,000
frames x accum 16) — bf16 compute / f32 masters. The microbatch is the
TPU-optimal 96k frames (64 utts) x accum 4, IDENTICAL optimization
semantics (accumulation is linear; r4 on-chip sweep in
tools/accum_sweep.py), timed over whole accumulation cycles.

The headline case keeps one documented deviation for round-over-round
comparability: x8 subsampling as conv x4 + one interlayer x2 (drop) vs the
conf's conv x2 + two interlayer x2 (max_pool) — equal output rate, fewer
early-layer frames. The FAITHFUL transcription (the shipped yaml verbatim)
is timed as `extra_faithful` so both numbers are recorded.

Output protocol: prints the primary JSON line {"metric", "value", "unit",
"vs_baseline", "step_ms", "mfu", ...} THE MOMENT the main timing loop
finishes, then re-emits one combined line with extras appended. A consumer
should take the LAST parseable line; the first line makes the primary
metric un-losable if an extra hangs. vs_baseline: the reference publishes
no GPU throughput (SURVEY.md §6); a fixed estimate of 40 utts/sec/GPU
(typical V100 rate for this config at batch 24k frames) keeps the ratio
stable across rounds.

Robustness (the remote compile pool hangs at random — ROADMAP env notes):
- persistent XLA compilation cache in .jax_cache/ — repeat runs skip most
  compiles entirely;
- short preflight (75 s) + per-phase deadman threads -> exit(3) -> the
  parent wrapper respawns into a fresh worker, bounded by a total wall
  budget (NSP_BENCH_WALL, default 1020 s) instead of a fixed retry count;
- when the remaining budget is low the child degrades to fast mode
  (primary metric only, NSP_BENCH_FAST semantics) rather than exiting
  empty.
"""
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_T0 = time.monotonic()

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compilation cache: survives across processes/rounds on this
# machine, so the driver's end-of-round run hits programs compiled during
# the round. Harmless when cold.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

REFERENCE_UTTS_PER_SEC = 40.0

# bf16 peak FLOP/s by TPU generation (public spec sheets)
PEAK_FLOPS = {
    "v4": 275e12, "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
    "v6 lite": 918e12, "v6e": 918e12,
}


def _chip_peak() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_FLOPS.items():
        if k in kind:
            return v
    return 197e12  # default: v5e


def _budget_left() -> float:
    total = float(os.environ.get("NSP_BENCH_REMAINING", "1e9"))
    return total - (time.monotonic() - _T0)


def flagship_args(faithful: bool = False):
    """The shipped large config, verbatim dims (bin/args.py flag names).

    faithful=True uses the conf's exact x8 subsampling (conv x2 + two
    interlayer max_pool x2); default is the equal-output-rate comparability
    variant (conv x4 + one interlayer drop) documented above.
    """
    from types import SimpleNamespace
    return SimpleNamespace(
        enc_type="conv_conformer", input_dim=80,
        conv_channels="32_32", conv_kernel_sizes="(3,3)_(3,3)",
        conv_poolings="(1,1)_(2,2)" if faithful else "(2,2)_(2,2)",
        enc_n_layers=12, transformer_d_model=512, transformer_d_ff=2048,
        transformer_n_heads=8, transformer_enc_pe_type="relative",
        transformer_enc_clamp_len=10, conformer_kernel_size=15,
        subsample=("1_1_1_2_1_1_1_2_1_1_1_1" if faithful
                   else "1_1_1_2_1_1_1_1_1_1_1_1"),
        subsample_type="max_pool" if faithful else "drop",
        # dropout values VERBATIM from the reference conf (the large yaml
        # sets dropout_att 0.0, dropout_dec/emb 0.1)
        dropout_enc=0.1, dropout_att=0.0,
        dec_type="lstm", dec_n_units=1024, dec_n_layers=1, emb_dim=512,
        dec_bottleneck_dim=1024, attn_type="location", attn_dim=512,
        attn_conv_width=201, dropout_dec=0.1, dropout_emb=0.1,
        vocab=10000, ctc_weight=0.3, lsm_prob=0.1,
        freq_width=27, n_freq_masks=2, time_width=100, n_time_masks=2,
        time_width_upper=1.0,
    )


def _deadman(seconds: float, msg: str, code: int = 3):
    """Thread-based deadline -> os._exit(code). SIGALRM is NOT enough here:
    when the main thread hangs inside the tunnel's blocking C call the
    handler is deferred forever (observed: a 150 s alarm never fired over
    a 1200 s hang); a daemon thread's os._exit is immune. exit code 3
    tells the retry wrapper to respawn into a fresh compile worker."""
    import threading

    def _bail():
        print(f"deadman: {msg} ({seconds:.0f}s), respawning",
              file=sys.stderr, flush=True)
        os._exit(code)

    t = threading.Timer(seconds, _bail)
    t.daemon = True
    t.start()
    return t


def _preflight(seconds: float = 75):
    """The remote compile pool has a lottery: some workers hang compiles
    (and sometimes executions) indefinitely (ROADMAP environment notes).
    Probe with a trivial compile under a deadman thread; on timeout exit(3)
    so the parent wrapper respawns into a (hopefully) healthy worker."""
    seconds = min(seconds, max(_budget_left() * 0.3, 30))
    t = _deadman(seconds, "preflight compile unresponsive")
    x = jnp.ones((256, 256), jnp.float32)
    float((x @ x).sum())
    t.cancel()


def _force(tree):
    """Force REAL completion: through the remote-dispatch tunnel,
    block_until_ready returns before execution finishes — only a
    device->host transfer truly synchronises."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.ravel(leaf)[0])


def _abs_of(tr):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tr)


def _build_train(args, bs, t, u, accum, donate=True):
    """Model + optimizer + jitted accum train step for a flagship-style
    config. Returns (step, params, opt_state, inputs, n_params, lowered)."""
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.parallel.mesh import make_train_step
    from neural_sp_tpu.trainers.optimizer import build_optimizer
    from neural_sp_tpu.trainers.lr_scheduler import noam_schedule

    model = build_speech2text(args)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
    xlens = jnp.full((bs,), t, jnp.int32)
    ys = jnp.asarray(rng.integers(4, args.vocab, (bs, u)), jnp.int32)
    ylens = jnp.full((bs,), u, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
    tx = build_optimizer("noam",
                         schedule=noam_schedule(args.transformer_d_model,
                                                25000, factor=5.0),
                         clip_grad_norm=5.0, accum_grad_n_steps=accum)
    params = variables["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh=None, donate=donate,
                           compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    # lower for cost analysis BEFORE the loop (donation deletes the inputs)
    lowered = step._lower(
        _abs_of(params), _abs_of(opt_state), _abs_of(key), _abs_of(xs),
        _abs_of(xlens), _abs_of(ys), _abs_of(ylens),
        jax.ShapeDtypeStruct((), jnp.float32))
    return model, step, params, opt_state, (xs, xlens, ys, ylens), \
        n_params, lowered


def _time_step(step, params, opt_state, inputs, accum, n_windows=3,
               cycles_per_window=4):
    """Warm one full accumulation cycle, then time whole cycles; best-of-N
    windows guards against transient tunnel contention. Returns
    (per-step dt, params, opt_state)."""
    key = jax.random.PRNGKey(0)
    xs, xlens, ys, ylens = inputs
    for i in range(accum):
        params, opt_state, m = step(params, opt_state,
                                    jax.random.fold_in(key, 1000 + i),
                                    xs, xlens, ys, ylens)
    _force(params)  # compile + warm (forces the full optimizer chain)
    n_iters = cycles_per_window * accum
    best_dt = float("inf")
    for w in range(n_windows):
        t0 = time.perf_counter()
        for i in range(n_iters):
            params, opt_state, m = step(params, opt_state,
                                        jax.random.fold_in(key, i),
                                        xs, xlens, ys, ylens)
        _force(params)  # sync on the LAST step's updated params
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_iters)
    return best_dt, params, opt_state


def main():
    _preflight()

    # Effective batch follows the reference conf EXACTLY: batch_size 24000
    # frames x accum_grad_n_steps 16 = 384k frames per optimizer update.
    # The reference's 24k microbatch is its 24GB-GPU memory ceiling, not
    # semantics; gradient accumulation is linear, so any (bs, k) with
    # bs*1500*k = 384k trains identically. The on-chip sweeps
    # (tools/accum_sweep.py) measured utts/s over FULL accumulation
    # cycles: r4 bs8 191.9 / bs16 243.3 / bs32 271.7 / bs64 317.5 /
    # bs128 294.7; r5 (efficient_multi_steps) bs32 283.0 / bs64 333.0 /
    # bs128 296.6 -> the TPU-optimal microbatch is 96k frames (bs 64,
    # accum 4); larger batches amortise dispatch + weight traffic until
    # activations blow past ~HBM-friendly sizes at bs128.
    bs, t, u, accum = 64, 1500, 100, 4
    fast = (os.environ.get("NSP_BENCH_FAST") == "1"
            or _budget_left() < 480)

    # a hang inside the flagship compile must respawn (exit 3), not eat the
    # whole driver budget: a good worker compiles this in ~120 s (seconds
    # when the .jax_cache is warm)
    wd = _deadman(min(480.0, max(_budget_left() - 90, 120)),
                  "flagship compile/warm unresponsive")
    args = flagship_args()
    model, step, params, opt_state, inputs, n_params, lowered = \
        _build_train(args, bs, t, u, accum)
    xs, xlens, ys, ylens = inputs
    key = jax.random.PRNGKey(0)
    for i in range(accum):
        params, opt_state, m = step(params, opt_state,
                                    jax.random.fold_in(key, 1000 + i),
                                    xs, xlens, ys, ylens)
    _force(params)  # compile + warm
    wd.cancel()

    n_iters = (2 if fast else 4) * accum
    best_dt = float("inf")
    for w in range(2 if fast else 3):
        t0 = time.perf_counter()
        for i in range(n_iters):
            params, opt_state, m = step(params, opt_state,
                                        jax.random.fold_in(key, i),
                                        xs, xlens, ys, ylens)
        _force(params)
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_iters)
    dt = best_dt

    # MFU from compiler-counted HLO FLOPs of the whole train step (fwd+bwd
    # +optimizer); cost_analysis flops are f32-equivalent op counts
    mfu = -1.0
    try:
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", -1.0))
        if flops > 0:
            mfu = flops / dt / _chip_peak()
    except Exception:
        mfu = -1.0

    utts_per_sec = bs / dt

    payload = {
        "metric": "flagship_conformer_las_train_throughput",
        "value": round(utts_per_sec, 2),
        "unit": "utts/sec/chip",
        "vs_baseline": round(utts_per_sec / REFERENCE_UTTS_PER_SEC, 3),
        "step_ms": round(dt * 1e3, 2),
        "mfu": round(mfu, 4) if mfu > 0 else None,
        "frames_per_step": bs * t,
        "n_params_m": round(n_params / 1e6, 1),
        "device": jax.devices()[0].device_kind,
        "compute_dtype": "bfloat16",
    }
    # PRIMARY metric is now safe: emit it before anything else can hang
    print(json.dumps(payload), flush=True)
    if fast:
        return

    # ---- realism extras (VERDICT r2 #9 / r4 #3) ------------------------
    # each extra compiles fresh programs — guard against the compile-worker
    # lottery with a per-extra alarm that aborts JUST that extra, plus a
    # global extras deadman that re-emits what we have and exits clean
    import signal
    import threading

    extras = {}

    def _emit():
        print(json.dumps({**payload,
                          **{f"extra_{k}": v for k, v in extras.items()}}),
              flush=True)

    def _emit_and_exit():
        extras["aborted"] = "extras deadman fired (compile worker hang)"
        _emit()
        os._exit(0)

    dead = threading.Timer(max(_budget_left() - 45, 60), _emit_and_exit)
    dead.daemon = True
    dead.start()

    def _alarmed(fn, *a, seconds=900):
        def _to(signum, frame):
            raise TimeoutError("extra timed out (compile worker hang?)")
        old = signal.signal(signal.SIGALRM, _to)
        signal.alarm(int(min(seconds, max(_budget_left() - 60, 30))))
        try:
            return fn(*a)
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    try:
        extras["bucketed"] = _alarmed(_bench_bucketed, step, params,
                                      opt_state, key, args)
    except Exception as e:
        extras["bucketed"] = {"error": str(e)[:120]}
    _emit()
    # the bs-64 primary + bucketed graphs leave HBM nearly full; later
    # extras need progressively less primary state — free as we go
    opt_state = None
    import gc
    gc.collect()
    try:
        extras["decode_beam"] = _alarmed(_bench_decode_beam, model, params)
    except Exception as e:
        extras["decode_beam"] = {"error": str(e)[:120]}
    _emit()
    # faithful flagship (VERDICT r4 #3): fresh state; free the primary's
    params = model = step = None
    gc.collect()
    try:
        extras["faithful"] = _alarmed(_bench_faithful, bs, t, u, accum, dt)
    except Exception as e:
        extras["faithful"] = {"error": str(e)[:120]}
    _emit()
    try:
        extras["streaming"] = _alarmed(_bench_streaming, seconds=1500)
    except Exception as e:
        extras["streaming"] = {"error": str(e)[:120]}

    dead.cancel()
    _emit()


def _bench_faithful(bs, t, u, accum, primary_dt):
    """The shipped conf's EXACT subsampling (conv x2 via poolings
    (1,1)_(2,2) + interlayer max_pool x2 at blocks 4 and 8) — the faithful
    transcription of the reference yaml, vs the headline's equal-output-
    rate variant. Reports both so the deviation is quantified in the
    artifact (VERDICT r4 weak #3)."""
    args = flagship_args(faithful=True)
    _, step, params, opt_state, inputs, n_params, _ = \
        _build_train(args, bs, t, u, accum)
    dt, params, opt_state = _time_step(step, params, opt_state, inputs,
                                       accum, n_windows=2,
                                       cycles_per_window=3)
    return {"utts_per_sec": round(bs / dt, 2),
            "step_ms": round(dt * 1e3, 2),
            "subsampling": "conv2+maxpool2x2 (faithful yaml)",
            "vs_headline_variant": round((bs / dt) / (bs / primary_dt), 3)}


def _bench_bucketed(step, params, opt_state, key, args):
    """Realistic mixed-length training: the SAME length population as r3's
    single mixed batch (800-1500 frames), but batched by the sampler's
    padded-area shape grid (sampler._batch_size_padded_area, grid_t=128):
    each batch is padded to its grid ceiling and sized so the padded area
    stays <= 96000 frames. Times every distinct compiled shape once and
    aggregates epoch throughput over REAL utterances; pad_waste counts pad
    frames in the padded areas actually dispatched."""
    import pandas as pd
    from neural_sp_tpu.datasets.asr.sampler import make_batches, _round_up
    grid_t = 128
    lens_pop = sorted([1500, 1500, 1400, 1400, 1300, 1300, 1200, 1200,
                       1100, 1100, 1000, 1000, 900, 900, 800, 800] * 24)
    df = pd.DataFrame({"xlen": lens_pop, "ylen": [100] * len(lens_pop),
                       "utt_id": [f"u{i}" for i in range(len(lens_pop))]})
    # microbatch scaled to the r4 sweep optimum (96k padded frames, the
    # bs-64 point of the fixed-effective-batch sweep; see main())
    batches = make_batches(df, batch_size=96000, batch_size_type="frame",
                           bucketing="sort", shape_grid_t=grid_t)
    # collapse to distinct (bs, t_pad) shapes; time each once
    shapes = {}
    for b in batches:
        blens = [lens_pop[i] for i in b]
        shape = (len(b), _round_up(max(blens), grid_t))
        cnt, real = shapes.get(shape, (0, 0))
        shapes[shape] = (cnt + 1, real + sum(blens))
    u = 100
    rng = np.random.default_rng(1)
    # use the live state (no copies): at the bs-64 microbatch a duplicate
    # params+opt set is ~2.4 GB and pushed HBM over the edge (measured
    # RESOURCE_EXHAUSTED); the primary metric is already recorded, so
    # perturbing the state here is fine
    p, o = params, opt_state
    total_time = 0.0
    total_utts = 0
    total_real = 0
    total_area = 0
    for (bs, t), (cnt, real) in sorted(shapes.items()):
        xs = np.zeros((bs, t, 80), np.float32)
        blens = [L for L in lens_pop if L <= t][-bs:]
        for i, L in enumerate(blens):
            xs[i, :L] = rng.standard_normal((L, 80))
        xs = jnp.asarray(xs)
        xlens = jnp.asarray(blens, jnp.int32)
        ys = jnp.asarray(rng.integers(4, args.vocab, (bs, u)), jnp.int32)
        ylens = jnp.full((bs,), u, jnp.int32)
        p, o, m = step(p, o, key, xs, xlens, ys, ylens)  # compile + warm
        _force(m["loss"])
        best = float("inf")
        for w in range(2):
            t0 = time.perf_counter()
            for i in range(5):
                p, o, m = step(p, o, jax.random.fold_in(key, 999 + i),
                               xs, xlens, ys, ylens)
            _force(m["loss"])
            best = min(best, (time.perf_counter() - t0) / 5)
        total_time += best * cnt
        total_utts += bs * cnt
        total_real += real
        total_area += bs * t * cnt
    return {"utts_per_sec": round(total_utts / total_time, 2),
            "n_shapes": len(shapes),
            "grid_t": grid_t,
            "pad_waste": round(1.0 - total_real / total_area, 3)}


def _bench_decode_beam(model, params):
    """Offline device-beam decoding throughput on the flagship model."""
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    sess = Speech2TextSession(
        model, params, DecodeConfig(beam_width=10, device_beam=True,
                                    max_len_ratio=0.6))
    rng = np.random.default_rng(2)
    bs, t = 16, 1500
    xs = rng.standard_normal((bs, t, 80)).astype(np.float32)
    xlens = np.full((bs,), t, np.int32)
    sess.decode_attention_beam_device(xs, xlens)  # compile + warm
    t0 = time.perf_counter()
    xs2 = xs * 1.01
    sess.decode_attention_beam_device(xs2, xlens)
    dt = time.perf_counter() - t0
    return {"utts_per_sec": round(bs / dt, 2), "beam_width": 10,
            "batch": bs}


def _bench_streaming():
    """Streaming decode RTF on a 16 s stream (forced-sync through the
    tunnel): greedy CTC device-scan + device block-sync MoChA beam."""
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((1600, 80)).astype(np.float32)
    out = {}

    # greedy CTC: 12L uni-conformer d256, chunk 64 (r2 config)
    a = SimpleNamespace(
        enc_type="uni_conformer", input_dim=80, enc_n_layers=12,
        transformer_d_model=256, transformer_d_ff=1024,
        transformer_n_heads=4, transformer_enc_pe_type="relative",
        transformer_enc_clamp_len=10, conformer_kernel_size=7,
        lc_chunk_size_left=64, lc_chunk_size_current=64,
        lc_chunk_size_right=0, lc_type="mask",
        dec_type="lstm", dec_n_units=512, dec_n_layers=1, emb_dim=256,
        dec_bottleneck_dim=512, vocab=600, ctc_weight=1.0)
    m1 = build_speech2text(a)
    v1 = m1.init(jax.random.PRNGKey(0), jnp.asarray(feats)[None],
                 jnp.asarray([1600]), jnp.zeros((1, 8), jnp.int32),
                 jnp.asarray([8]))
    s1 = Speech2TextSession(m1, v1["params"], DecodeConfig(beam_width=1))
    s1.decode_streaming_device(feats)  # compile + warm
    _, st = s1.decode_streaming_device(feats * 1.01)
    out["greedy_ctc_rtf"] = round(st["rtf"], 4)

    # device block-sync MoChA beam (VERDICT r2 #4)
    a2 = SimpleNamespace(
        enc_type="uni_conformer", input_dim=80, enc_n_layers=12,
        transformer_d_model=256, transformer_d_ff=1024,
        transformer_n_heads=4, transformer_enc_pe_type="relative",
        transformer_enc_clamp_len=10, conformer_kernel_size=7,
        lc_chunk_size_left=64, lc_chunk_size_current=64,
        lc_chunk_size_right=0, lc_type="mask",
        dec_type="lstm", dec_n_units=512, dec_n_layers=1, emb_dim=256,
        dec_bottleneck_dim=512, attn_type="mocha", attn_dim=512,
        mocha_chunk_size=4, mocha_init_r=2.0, vocab=600, ctc_weight=0.0)
    m2 = build_speech2text(a2)
    v2 = m2.init(jax.random.PRNGKey(0), jnp.asarray(feats)[None],
                 jnp.asarray([1600]), jnp.zeros((1, 8), jnp.int32),
                 jnp.asarray([8]))
    s2 = Speech2TextSession(
        m2, v2["params"],
        DecodeConfig(beam_width=10, device_beam=True, max_len_ratio=0.5))
    s2.decode_streaming(feats)  # compile + warm
    _, st2 = s2.decode_streaming(feats * 1.01)
    out["mocha_beam_rtf"] = round(st2["rtf"], 4)
    out["mocha_beam_width"] = 10
    return out


if __name__ == "__main__":
    if os.environ.get("_NSP_BENCH_CHILD") != "1":
        # parent wrapper: respawn on preflight/watchdog exit(3) — a fresh
        # process draws a fresh compile worker from the pool. Bounded by a
        # TOTAL WALL BUDGET, not a retry count: r4 burned its whole budget
        # on 4x150 s preflights and the driver killed it with nothing
        # printed.
        import subprocess
        wall = float(os.environ.get("NSP_BENCH_WALL", "1020"))
        t_start = time.monotonic()
        rc, attempt = 1, 0
        while True:
            remaining = wall - (time.monotonic() - t_start)
            if remaining < 120:
                print(f"bench: wall budget exhausted after {attempt} "
                      f"attempts", file=sys.stderr, flush=True)
                break
            env = dict(os.environ)
            env["_NSP_BENCH_CHILD"] = "1"
            env["NSP_BENCH_REMAINING"] = str(remaining - 15)
            rc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                env=env).returncode
            if rc != 3:
                break
            attempt += 1
            print(f"bench: retrying ({attempt})", file=sys.stderr,
                  flush=True)
        sys.exit(rc)
    main()
