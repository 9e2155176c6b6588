"""Per-instruction HBM-traffic analysis of a compiled training step.

VERDICT r2 item 3 asks to close or formally bound the stage-1 B=32 gap to
its memory floor (measured 56 ms vs a 38 ms HLO-estimate floor). The
aggregate XLA `bytes accessed` number cannot say WHERE the traffic goes, so
this tool parses the optimized HLO of the compiled step and builds a
per-instruction traffic table: for every top-level instruction in the ENTRY
computation it charges result bytes + operand bytes (each fusion reads its
inputs from HBM once and writes its outputs once — the standard fusion
traffic model), both LOGICAL bytes and PADDED bytes per the TPU tiled
layout `{...:T(a,b)}` (minor-most dims padded to the tile). The padded
column is the one that matches the hardware: e.g. an (32,3,4634,8) f32
tensor with an 8-wide minor dim occupies 128/8 = 16x its logical size in
lane-padded form unless XLA picked a spatial-minor layout.

Run ON THE REAL CHIP (the layouts/fusions are TPU-specific):

    PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=\
/tmp/jaxcache python tools/roofline.py [--top 40] [--fp32] [--batch 32]

Output: one JSON line with totals + a text table of the top-N instructions
by padded traffic, grouped subtotals by opcode category.
"""

import argparse
import json
import math
import os
import re
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "s4": 0.5, "u4": 0.5, "pred": 1, "c64": 8, "c128": 16,
    "token": 0, "opaque": 0,
}

# one array shape with optional layout, e.g. bf16[32,3,4634,8]{3,2,1,0:T(8,128)(2,1)S(1)}
SHAPE_RE = re.compile(
    r"(?P<dt>[a-z0-9]+)\[(?P<dims>[0-9,]*)\](?:\{(?P<layout>[^}]*)\})?"
)


def _one_shape_bytes(dt, dims_str, layout):
    if dt not in DTYPE_BYTES:
        return 0.0, 0.0
    esz = DTYPE_BYTES[dt]
    dims = [int(d) for d in dims_str.split(",") if d] if dims_str else []
    logical = esz * (math.prod(dims) if dims else 1)
    padded = logical
    if layout and dims:
        m = re.match(r"(?P<perm>[0-9,]+)(?::.*?T\((?P<t>[0-9*,]+)\))?", layout)
        if m and m.group("t"):
            perm = [int(p) for p in m.group("perm").split(",")]
            tile = [t for t in m.group("t").split(",")]
            # physical order: minor-to-major is perm; materialize physical
            # dims (major..minor) then pad the k minor-most by the tile
            phys = [dims[p] for p in reversed(perm)]
            tvals = []
            for t in tile:
                tvals.append(1 if t == "*" else int(t))
            k = len(tvals)
            if k <= len(phys):
                for i in range(k):
                    d = phys[len(phys) - k + i]
                    t = tvals[i]
                    phys[len(phys) - k + i] = math.ceil(d / t) * t
            padded = esz * math.prod(phys)
    return logical, padded


def shape_bytes(s: str):
    """Total (logical, padded) bytes over every array shape in the string
    (handles tuples by summing members)."""
    lo = pa = 0.0
    for m in SHAPE_RE.finditer(s):
        l, p = _one_shape_bytes(m.group("dt"), m.group("dims"), m.group("layout"))
        lo += l
        pa += p
    return lo, pa


INSTR_RE = re.compile(
    r"^\s+(?P<root>ROOT\s+)?(?P<name>%?[\w.\-]+)\s*=\s*(?P<shape>\([^=]*?\)|"
    r"[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?)\s+(?P<op>[\w\-]+)\((?P<args>.*)$"
)
SKIP_OPS = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "bitcast-convert", "after-all", "partition-id", "replica-id",
}


def category(op, line):
    if op == "fusion":
        if "kind=kInput" in line:
            return "fusion.input(reduce)"
        if "kind=kOutput" in line:
            return "fusion.output"
        if "kind=kLoop" in line:
            return "fusion.loop(elementwise)"
        return "fusion.custom"
    if "convolution" in op:
        return "convolution"
    if op in ("dot",):
        return "matmul"
    if "all-reduce" in op or "all-gather" in op or "reduce-scatter" in op:
        return "collective"
    if op in ("copy", "copy-start", "copy-done", "transpose", "reshape"):
        return "copy/transpose"
    if "custom-call" in op:
        return "custom-call"
    return op


OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def _computation_bodies(hlo_text: str):
    """Map computation name -> body text (for fusion provenance lookup)."""
    bodies = {}
    for m in re.finditer(
        r"\n%?([\w.\-]+)(?:\.clone)? \([^\n]*\) -> [^\n]*\{\n(.*?)\n\}",
        hlo_text, re.S,
    ):
        bodies[m.group(1)] = m.group(2)
    return bodies


def _short_opname(p: str) -> str:
    """Compress a jax op_name path to its informative tail (module path +
    primitive), e.g. 'VQVAEEncoder_0/EncBlock2d_2/BatchNorm_0/reduce'."""
    parts = [s for s in p.split("/") if s and not s.startswith("jit(")]
    # drop autodiff wrappers that add noise but keep transpose() marker
    tail = [s for s in parts if not s.startswith(("jvp(", "vmap("))]
    keep = tail[-4:] if len(tail) > 4 else tail
    return "/".join(keep)[-90:]


def _provenance(line: str, bodies: dict, max_items: int = 3):
    """For a fusion entry instruction, summarize which jax-level source ops
    its fused computation contains (most-frequent op_name tails)."""
    cm = re.search(r"calls=%?([\w.\-]+)", line)
    names = []
    if cm and cm.group(1) in bodies:
        names = OPNAME_RE.findall(bodies[cm.group(1)])
    if not names:  # fall back to the instruction's own metadata
        names = OPNAME_RE.findall(line)
    counts = {}
    for n in names:
        s = _short_opname(n)
        counts[s] = counts.get(s, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: -kv[1])
    return [f"{k} x{v}" if v > 1 else k for k, v in ranked[:max_items]]


def _result_shape_str(shape_field: str) -> str:
    """Strip layouts for compact display of the result shape."""
    return re.sub(r"\{[^}]*\}", "", shape_field).strip()[:48]


def analyze_entry(hlo_text: str, top: int = 40):
    # entry computation: after "ENTRY " until its closing brace
    m = re.search(r"\nENTRY [^\n]*\{\n(.*?)\n\}", hlo_text, re.S)
    if not m:
        raise SystemExit("no ENTRY computation found")
    body = m.group(1)
    bodies = _computation_bodies(hlo_text)
    # map name -> result shape string (for operand lookup)
    shapes = {}
    rows = []
    for line in body.split("\n"):
        im = INSTR_RE.match(line)
        if not im:
            continue
        name = im.group("name").lstrip("%")
        shapes[name] = im.group("shape")
    for line in body.split("\n"):
        im = INSTR_RE.match(line)
        if not im:
            continue
        op = im.group("op")
        if op in SKIP_OPS:
            continue
        name = im.group("name").lstrip("%")
        res_lo, res_pa = shape_bytes(im.group("shape"))
        # operand names: %tokens in the args segment up to the call/metadata
        args = im.group("args")
        op_lo = op_pa = 0.0
        seen = set()
        for om in re.finditer(r"%([\w.\-]+)", args):
            oname = om.group(1)
            if oname in seen or oname not in shapes:
                continue
            seen.add(oname)
            l, p = shape_bytes(shapes[oname])
            op_lo += l
            op_pa += p
        rows.append({
            "name": name, "op": op, "cat": category(op, line),
            "result": res_pa, "operands": op_pa,
            "total": res_pa + op_pa,
            "total_logical": res_lo + op_lo,
            "shape": _result_shape_str(im.group("shape")),
            "prov": _provenance(line, bodies),
        })
    rows.sort(key=lambda r: -r["total"])
    total_pa = sum(r["total"] for r in rows)
    total_lo = sum(r["total_logical"] for r in rows)
    by_cat = {}
    for r in rows:
        by_cat[r["cat"]] = by_cat.get(r["cat"], 0.0) + r["total"]
    return rows[:top], total_lo, total_pa, by_cat


def _compile_stage2_tokens(cfg, B):
    """Compile the PRODUCTION stage-2 step (precomputed-token path) at the
    published geometry — pure transformer compute over 27/108-token grids."""
    import jax
    import jax.numpy as jnp
    import optax

    from bench import setup_stage1
    from tvqvae_tpu.models.maskgit import MaskGITSpec, build_transformers
    from tvqvae_tpu.train.stage2 import (
        create_stage2_state,
        init_stage2,
        make_stage2_train_step_tokens,
    )
    from tvqvae_tpu.utils import warmup_cosine_schedule

    spec, _, _, _, _ = setup_stage1(cfg, B, 4, 4633)
    mg = MaskGITSpec.from_config(cfg, spec)
    t_l, t_h = build_transformers(cfg, spec, n_classes=5)
    p2, h_stats = init_stage2(jax.random.key(2), t_l, t_h, mg)
    tx = optax.adamw(warmup_cosine_schedule(1e-3, 200000), weight_decay=0.01)
    state = create_stage2_state(p2, h_stats, tx)
    step = jax.jit(make_stage2_train_step_tokens(t_l, t_h, mg, tx),
                   donate_argnums=0)
    s_l = jnp.zeros((B, spec.tokens_l), jnp.int32)
    s_h = jnp.zeros((B, spec.tokens_h), jnp.int32)
    y = jnp.zeros((B, 1), jnp.int32)
    return step.lower(state, s_l, s_h, y, jax.random.key(1)).compile()


def _compile_stage3_pre(cfg, B, compute_dtype="float32", fast_norm=False):
    """Compile the PRODUCTION stage-3 step (precomputed-x' path)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tvqvae_tpu.models.fidelity_enhancer import FidelityEnhancer
    from tvqvae_tpu.train.stage3 import (
        create_stage3_state,
        init_stage3,
        make_stage3_train_step_pre,
    )
    from tvqvae_tpu.utils import warmup_cosine_schedule

    L, C = 4633, 4
    fe = FidelityEnhancer(
        input_length=L, in_channels=C, dim=cfg.fidelity_enhancer.dim,
        dim_mults=tuple(cfg.fidelity_enhancer.dim_mults),
        resnet_block_groups=cfg.fidelity_enhancer.resnet_block_groups,
        dropout=cfg.fidelity_enhancer.dropout,
        compute_dtype=compute_dtype,
        fast_norm=fast_norm,
    )
    x = jnp.zeros((B, C, L), jnp.float32)
    params = init_stage3(jax.random.key(3), fe, x)
    tx = optax.adamw(warmup_cosine_schedule(1e-3, 50000), weight_decay=0.01)
    state = create_stage3_state(params, tx)
    step = jax.jit(make_stage3_train_step_pre(fe, tx), donate_argnums=0)
    return step.lower(state, x, x, jax.random.key(1)).compile()


def _compile_generation(cfg, GB, fp32=False, bf16_head=False):
    """Compile the PRODUCTION sampling program (make_sampling_fn: T_l=10 CFG
    MaskGIT decode scan + T_h=1 HF decode + BOTH stage-1 decoders + band
    summation — the whole batch pipeline is one jitted program,
    generation/sampler.py). This is the generation-roofline subject
    (VERDICT r4 next-4): bytes/FLOPs attribution for the 5267 traj/s/chip
    headline. Reference hot path: maskgit.py:294-446."""
    import jax

    from bench import setup_stage1
    from tvqvae_tpu.models.maskgit import (
        FrozenStage1,
        MaskGITSpec,
        build_transformers,
    )
    from tvqvae_tpu.models.stage1 import Stage1Model
    from tvqvae_tpu.train.stage2 import init_stage2, make_sampling_fn

    # default matches the bench.py generation headline: bf16 conv stacks
    # (the spec bench_generation inherits from the bf16 training arm);
    # --fp32 gives the all-fp32 decode, --bf16_head adds the TimeHead lever
    dd = "float32" if fp32 else "bfloat16"
    spec, model, _, s1_state, _ = setup_stage1(
        cfg, 32, 4, 4633, compute_dtype=dd, fast_bn=True,
        bf16_head=bf16_head,
    )
    frozen = FrozenStage1(
        params=s1_state.params, batch_stats=s1_state.batch_stats,
        vq_l=s1_state.vq_l, vq_h=s1_state.vq_h,
    )
    mg = MaskGITSpec.from_config(cfg, spec)
    t_l, t_h = build_transformers(cfg, spec, n_classes=5)
    p2, h_stats = init_stage2(jax.random.key(2), t_l, t_h, mg)
    sample_fn = make_sampling_fn(Stage1Model(spec), t_l, t_h, mg)
    # already jitted with static num/class_index — lower directly
    return sample_fn.lower(
        frozen, p2, h_stats, jax.random.key(4), GB, None
    ).compile()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--batch", type=int, default=0,
                    help="default: the stage's published batch (32/16/16; "
                         "256 for --generation)")
    ap.add_argument("--stage", type=int, default=1, choices=(1, 2, 3),
                    help="which training step to analyze (stages 2/3 use "
                         "the production precomputed paths)")
    ap.add_argument("--generation", action="store_true",
                    help="analyze the PRODUCTION sampling program instead "
                         "of a training step (bench.py's generation "
                         "headline: one jitted CFG decode + dual-decoder "
                         "pipeline at GB=256)")
    ap.add_argument("--gen_bf16_head", action="store_true",
                    help="with --generation: also run the TimeHead (L, L) "
                         "matmuls in bf16 (the bf16_head lever's "
                         "decode-side effect)")
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint conv blocks — compare traffic vs plain")
    ap.add_argument("--fast_bn", action="store_true",
                    help="compute-dtype BN normalization — compare traffic")
    ap.add_argument("--bf16_mu", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="AdamW first moment stored bf16 (stage 1 only "
                         "here) — ON by default to match the round-4 "
                         "production optimizer; --no-bf16_mu restores the "
                         "fp32-state attribution")
    ap.add_argument("--bf16_nu", action="store_true",
                    help="AdamW second moment stored bf16 (stage 1 only)")
    ap.add_argument("--hlo_out", default="",
                    help="also dump the optimized HLO text here")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sanity runs; CPU layouts/"
                         "fusions differ from TPU — real analysis needs "
                         "the chip)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import _cost_analysis, setup_stage1
    from tvqvae_tpu.config import Config

    cfg = Config()
    dtype = "float32" if args.fp32 else "bfloat16"
    if args.generation:
        B = args.batch or 256
        compiled = _compile_generation(cfg, B, fp32=args.fp32,
                                       bf16_head=args.gen_bf16_head)
    elif args.stage == 2:
        B = args.batch or 16
        compiled = _compile_stage2_tokens(cfg, B)
    elif args.stage == 3:
        B = args.batch or 16
        compiled = _compile_stage3_pre(cfg, B, compute_dtype=dtype,
                                       fast_norm=args.fast_bn)
    else:
        B = args.batch or 32
        spec, model, step, state, x = setup_stage1(
            cfg, B, 4, 4633, compute_dtype=dtype, remat=args.remat,
            fast_bn=args.fast_bn, bf16_mu=args.bf16_mu,
            bf16_nu=args.bf16_nu,
        )
        rng = jax.random.key(1)
        compiled = step.lower(state, x, rng).compile()
    flops, nbytes = _cost_analysis(compiled)
    txt = compiled.as_text()
    if args.hlo_out:
        with open(args.hlo_out, "w") as f:
            f.write(txt)
    rows, total_lo, total_pa, by_cat = analyze_entry(txt, args.top)

    dev = jax.devices()[0]
    print(json.dumps({
        "stage": ("generation" if args.generation else args.stage),
        "gen_bf16_head": (bool(args.gen_bf16_head) if args.generation
                          else None),
        "batch": B, "dtype": dtype, "remat": bool(args.remat),
        "fast_bn": bool(args.fast_bn),
        "bf16_mu": bool(args.bf16_mu), "bf16_nu": bool(args.bf16_nu),
        "xla_cost_bytes_gb": round((nbytes or 0) / 1e9, 2),
        "entry_traffic_logical_gb": round(total_lo / 1e9, 2),
        "entry_traffic_padded_gb": round(total_pa / 1e9, 2),
        "floor_ms_at_819gbs_padded": round(total_pa / 819e9 * 1e3, 1),
        "flops_tf": round((flops or 0) / 1e12, 3),
        "device": dev.device_kind,
    }))
    print("\n-- by category (padded GB) --")
    for c, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{c:28s} {v/1e9:8.2f}  ({v/total_pa*100:4.1f}%)")
    print(f"\n-- top {args.top} instructions by padded traffic --")
    print(f"{'MB':>9} {'pad/log':>7}  {'category':24s} name | result | provenance")
    for r in rows:
        ratio = r["total"] / max(r["total_logical"], 1)
        prov = "; ".join(r.get("prov") or [])
        print(f"{r['total']/1e6:9.1f} {ratio:7.2f}  {r['cat']:24s} "
              f"{r['op']}:{r['name'][:40]} | {r.get('shape','')} | {prov}")


if __name__ == "__main__":
    main()
