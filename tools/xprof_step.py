"""Per-fusion device-time + HBM-bytes attribution of the headline cls step.

VERDICT r4 #2: the 23.2% MFU defense needs device-side evidence — where do
the ~6.8 ms above the 2.0 ms FLOP floor go?  This tool answers with two
independent sources joined on HLO op name:

1. TIME — a ``jax.profiler`` trace of ONE scanned dispatch (128 fused train
   steps = one XLA program, so the tunnel's per-dispatch latency cannot
   pollute per-op times; the device plane records each fusion's execution).
2. BYTES — the compiled program's optimized HLO: for every fusion/custom
   op, operand + result buffer sizes (logical bytes, the lower bound on HBM
   traffic ignoring cache reuse between producer/consumer fusions).

Output: a table of the top ops by total device time with per-iteration
time, logical bytes, and implied GB/s — published in docs/PERFORMANCE.md.

Run on TPU:  PYTHONPATH=. python tools/xprof_step.py [--iters 128]
Artifacts:   /tmp/xprof_step/ (trace), stdout table.
"""

import argparse
import collections
import glob
import os
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE_RE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred|s64|u64|f64)"
                      r"\[([\d,]*)\](\{[^}]*\})?")
DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8}


def shape_bytes(text: str) -> int:
    """Sum logical HBM bytes of every typed shape literal in an HLO line.

    Shapes whose layout names a non-default memory space (``S(1)`` = VMEM
    scoped allocation, ``S(5)`` = host) never touch HBM and count 0 — the
    optimized HLO annotates these explicitly, which is what makes this a
    usable per-op HBM-traffic bound."""
    total = 0
    for m in SHAPE_RE.finditer(text):
        dt, dims, layout = m.group(1), m.group(2), m.group(3) or ""
        if "S(" in layout:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


FREE_OPS = {"get-tuple-element", "bitcast", "tuple", "parameter", "constant",
            "copy-done", "slice-done"}


def hlo_op_bytes(hlo_text: str) -> dict:
    """name -> (operand+result logical bytes, kind, source label).

    Parses optimized-HLO instruction lines like
      %fusion.5 = (f32[2048,512]{1,0:T(8,128)}, ...) fusion(%a, %b),
        kind=kLoop, calls=..., metadata={op_name=".../scatter-add"
        source_file=".../protein_cnn.py" source_line=34 ...}
    The op-kind token is the first lowercase word followed by '(' after a
    space (shape annotations like T(8,128) start uppercase, dtypes are
    followed by '[').  Bytes = result shapes + operand defs resolved by
    name — a VMEM-blind lower-ish bound on the op's HBM touch.  Pure
    data-movement ops (GTE/bitcast/...) count 0.  Label = the op_name tail
    + source file:line from metadata, the human attribution handle."""
    defs = {}        # name -> result bytes
    out = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%([\w.\-]+) = (.+)$", line)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2)
        opm = re.search(r"\s([a-z][\w\-]*)\(", rhs)
        if not opm:
            continue
        opkind = opm.group(1)
        rbytes = shape_bytes(rhs[: opm.start()])
        defs[name] = rbytes
        if opkind in FREE_OPS:
            continue
        operands = re.findall(r"%([\w.\-]+)", rhs[opm.end():].split(")")[0])
        obytes = sum(defs.get(o, 0) for o in operands)
        km = re.search(r"kind=k(\w+)", rhs)
        if km:
            opkind += ":" + km.group(1)
        lm = re.search(r'op_name="[^"]*?([\w\-.]+)"', rhs)
        fm = re.search(r'source_file="[^"]*?([\w\-.]+)" source_line=(\d+)',
                       rhs)
        label = (lm.group(1) if lm else "")
        if fm:
            label += f" {fm.group(1)}:{fm.group(2)}"
        out[name] = (rbytes + obytes, opkind, label)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--logdir", default="/tmp/xprof_step")
    ap.add_argument("--model", default="DrugLAMP")
    ap.add_argument("--ssl", action="store_true")
    ap.add_argument("--cm", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", action="store_true",
                    help="re-analyze an existing logdir (hlo.txt + xplane.pb)"
                         " without touching the device")
    args = ap.parse_args()

    if args.parse_only:
        with open(os.path.join(args.logdir, "hlo.txt")) as f:
            bytes_by_op = hlo_op_bytes(f.read())
        return analyze(args, bytes_by_op)

    from bench import make_tier
    from druglamp_tpu.train.steps import make_repeat_step
    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.time()
    _, state, batch, sargs, model = make_tier(args.model, use_ssl=args.ssl,
                                              use_cm=args.cm,
                                              batch_size=args.batch)
    print(f"[xprof] tier built ({time.time() - t0:.0f}s)", flush=True)
    repeat = make_repeat_step(model, use_ssl=args.ssl, use_cm=args.cm,
                              iters=args.iters)

    # --- compiled HLO for the bytes side ------------------------------------
    lowered = jax.jit(repeat, donate_argnums=(0,)).lower(
        state, batch, jax.random.key(5), *sargs)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    bytes_by_op = hlo_op_bytes(hlo)
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    print(f"[xprof] cost_analysis: flops={ca.get('flops', 0):.3e} "
          f"bytes accessed={ca.get('bytes accessed', 0):.3e}", flush=True)

    # --- warm, then trace ONE dispatch --------------------------------------
    k = jax.random.key(5)
    state, cls_l = repeat(state, batch, k, *sargs)
    float(np.asarray(cls_l)[-1])
    print(f"[xprof] warmed ({time.time() - t0:.0f}s)", flush=True)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        state, cls_l = repeat(state, batch, jax.random.key(6), *sargs)
        float(np.asarray(cls_l)[-1])
    print(f"[xprof] traced ({time.time() - t0:.0f}s)", flush=True)

    with open(os.path.join(args.logdir, "hlo.txt"), "w") as f:
        f.write(hlo)
    analyze(args, bytes_by_op)


def analyze(args, bytes_by_op):
    # --- parse the xplane ----------------------------------------------------
    # TPU plane structure (probed r5): line "XLA Modules" = whole-program
    # executions (wall truth); line "XLA Ops" = per-op events, where the
    # outer `while` event WRAPS the scan body ops (double-count); line
    # "Async XLA Ops" = DMA copy/slice-starts whose durations OVERLAP
    # compute and must not be summed into the sequential total.
    paths = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit("no xplane.pb produced — profiler unsupported here")
    from jax.profiler import ProfileData

    data = ProfileData.from_file(paths[-1])
    per_op = collections.Counter()      # opname -> total ns ("XLA Ops")
    n_exec = collections.Counter()      # opname -> executions
    async_ns = collections.Counter()    # opname -> total ns ("Async XLA Ops")
    module_ns = 0
    for plane in data.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ns = sum(e.duration_ns for e in line.events)
            elif line.name in ("XLA Ops", "Async XLA Ops"):
                tgt = per_op if line.name == "XLA Ops" else async_ns
                for ev in line.events:
                    name = ev.name.split(" = ")[0].lstrip("%")
                    tgt[name] += ev.duration_ns
                    if line.name == "XLA Ops":
                        n_exec[name] += 1
    if not per_op:
        raise SystemExit("no device-plane events — profiler gave host only")

    def info(name):
        return bytes_by_op.get(name, (0, "?", ""))

    wrappers = {n for n in per_op if n.split(".")[0] in ("while", "fusion")
                and n_exec[n] <= 4 and per_op[n] > 0.5 * module_ns}
    body_ns = sum(ns for n, ns in per_op.items() if n not in wrappers)
    print(f"\n[xprof] module total {module_ns / 1e6:.2f} ms over {args.iters}"
          f" iters = {module_ns / 1e6 / args.iters:.3f} ms/step; op-level "
          f"coverage {body_ns / 1e6:.2f} ms ({100 * body_ns / module_ns:.0f}%)"
          f" ({args.model} ssl={args.ssl} cm={args.cm} bs={args.batch})")
    print(f"{'op':28s} {'tot ms':>7s} {'%':>5s} {'us/ex':>7s} "
          f"{'execs':>5s} {'MB':>7s} {'GB/s':>5s}  kind / source")
    for name, ns in per_op.most_common(args.top):
        if name in wrappers:
            continue
        b, kind, label = info(name)
        ex = n_exec[name]
        t_exec = ns / ex / 1e9
        gbps = (b / t_exec / 1e9) if (b and t_exec) else 0.0
        print(f"{name[:28]:28s} {ns / 1e6:7.2f} {100 * ns / body_ns:5.1f} "
              f"{ns / ex / 1e3:7.1f} {ex:5d} {b / 1e6:7.2f} {gbps:5.0f}  "
              f"{kind} {label}")

    # aggregate by kind and by source file
    by_kind = collections.Counter()
    kind_bytes = collections.Counter()
    by_src = collections.Counter()
    for name, ns in per_op.items():
        if name in wrappers:
            continue
        b, kind, label = info(name)
        by_kind[kind] += ns
        kind_bytes[kind] += b * n_exec[name]
        src = label.split(" ")[-1].split(":")[0] if " " in label else \
            (label or "?")
        by_src[src] += ns
    print("\nby op kind (sequential ops):")
    for kind, ns in by_kind.most_common(15):
        print(f"  {kind:24s} {ns / 1e6:8.2f} ms  {100 * ns / body_ns:5.1f}%  "
              f"{kind_bytes[kind] / 1e9:7.2f} GB")
    print("\nby source file:")
    for src, ns in by_src.most_common(15):
        print(f"  {src:32s} {ns / 1e6:8.2f} ms  {100 * ns / body_ns:5.1f}%")
    tot_async = sum(async_ns.values())
    print(f"\nasync DMA (overlapped, not in totals): {tot_async / 1e6:.1f} ms"
          f" across {len(async_ns)} ops")
    tot_bytes = sum(info(n)[0] * n_exec[n]
                    for n in per_op if n not in wrappers)
    print(f"logical bytes of sequential ops: {tot_bytes / 1e9:.2f} GB over "
          f"{module_ns / 1e6:.1f} ms = {tot_bytes / module_ns:.0f} GB/s "
          f"achieved-average")


if __name__ == "__main__":
    main()
