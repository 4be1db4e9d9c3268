"""Aggregate output-buffer bytes of the optimized HLO by shape, for the
encoder fwd+bwd step — finds which tensors dominate the 44GB traffic."""
import sys, os, re, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from bench import flagship_args, _preflight
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


def main():
    _preflight()
    args = flagship_args()
    model = build_speech2text(args)
    bs, t = 16, 1500
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
    txt = low.compile().as_text()
    print(f"HLO text: {len(txt)/1e6:.1f} MB", flush=True)

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


if __name__ == "__main__":
    main()
