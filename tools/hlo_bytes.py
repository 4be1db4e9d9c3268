"""Aggregate output-buffer bytes of the optimized HLO by shape, for the
encoder fwd+bwd step — finds which tensors dominate the HBM traffic.

NSP_AB_BS sets the batch size (default 16). `python tools/hlo_bytes.py full`
analyzes the FULL train microstep (bench._build_train) instead of the
encoder-only grad step, and prints XLA's own cost_analysis (flops / bytes
accessed) for a roofline floor: t_mxu = flops/peak_matmul,
t_hbm = bytes/bandwidth."""
import sys, os, re, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import flagship_args, _preflight, _build_train
from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.parallel.mesh import cast_floating

DT = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
      "s8": 1, "u8": 1, "u16": 2, "s16": 2, "f64": 8, "s64": 8, "u64": 8}


def shape_bytes(dtype, dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DT.get(dtype, 4)


def _report(txt):
    """Parse optimized-HLO text: bytes written per output shape/opcode."""
    # top-level instruction lines: "  %name = TYPE[DIMS]{...} opcode(...)"
    inst = re.compile(r"^\s+(?:ROOT\s+)?[%\w.-]+ = (\w+)\[([\d,]*)\][^ ]* (\w+)")
    by_shape = collections.Counter()
    by_op = collections.Counter()
    count = collections.Counter()
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        m = inst.match(line)
        if not m:
            continue
        dtype, dims, op = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        b = shape_bytes(dtype, dims)
        key = f"{dtype}[{dims}]"
        by_shape[key] += b
        by_op[op] += b
        count[key] += 1
    print("== bytes written by output shape (top 25) ==")
    for k, v in by_shape.most_common(25):
        print(f"  {v/1e9:7.2f} GB  x{count[k]:4d}  {k}")
    print("== bytes written by opcode (top 15) ==")
    for k, v in by_op.most_common(15):
        print(f"  {v/1e9:7.2f} GB  {k}")
    tot = sum(by_shape.values())
    print(f"total instruction-output bytes: {tot/1e9:.1f} GB")


def _roofline(compiled):
    """XLA's own cost model -> roofline floors on v5e (one chip)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
    except Exception as e:
        print(f"cost_analysis unavailable: {e}")
        return
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    peak_mxu = 164e12   # measured bf16 matmul peak (tools/calibrate_tpu.py)
    bw = 819e9          # v5e HBM bandwidth
    print(f"cost_analysis: flops={flops/1e12:.2f} TFLOP, "
          f"bytes accessed={byts/1e9:.2f} GB")
    print(f"roofline floors: t_mxu={flops/peak_mxu*1e3:.1f} ms, "
          f"t_hbm={byts/bw*1e3:.1f} ms "
          f"(max of the two = perfect-overlap floor)")


def main_full():
    """Full train microstep (the bench's exact step) at NSP_AB_BS."""
    _preflight()
    bs = int(os.environ.get("NSP_AB_BS", "64"))
    args = flagship_args()
    _, step, params, opt_state, inputs, n_params, lowered = _build_train(
        args, bs, 1500, 100, accum=4)
    compiled = lowered.compile()
    print(f"n_params={n_params/1e6:.1f}M bs={bs}")
    _roofline(compiled)
    _report(compiled.as_text())


def main():
    if "full" in sys.argv[1:]:
        return main_full()
    _preflight()
    args = flagship_args()
    model = build_speech2text(args)
    bs, t = int(os.environ.get("NSP_AB_BS", "16")), 1500
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((bs, t, 80)), jnp.float32)
    xlens = jnp.full((bs,), t, jnp.int32)
    v0 = model.init(jax.random.PRNGKey(0), xs, xlens,
                    jnp.zeros((bs, 5), jnp.int32),
                    jnp.full((bs,), 5, jnp.int32))
    params = v0["params"]

    def enc_step(p, k, xs, xlens):
        def loss_fn(p):
            pc = cast_floating(p, jnp.bfloat16)
            eouts, _ = model.apply(
                {"params": pc}, xs.astype(jnp.bfloat16), xlens, "all",
                False, rngs={"dropout": k,
                             "specaug": jax.random.fold_in(k, 1)},
                method=model.encode)
            h = eouts["ys"]["xs"].astype(jnp.float32)
            return jnp.mean(h * h)
        g = jax.grad(loss_fn)(p)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    abs_of = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
    low = jax.jit(enc_step).lower(
        jax.tree.map(abs_of, params), abs_of(jax.random.PRNGKey(0)),
        abs_of(xs), abs_of(xlens))
    compiled = low.compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt)/1e6:.1f} MB", flush=True)
    _roofline(compiled)
    _report(txt)


if __name__ == "__main__":
    main()
