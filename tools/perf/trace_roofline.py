"""Per-stage roofline accounting from a DEVICE-SIDE profiler trace.

Why this exists: dispatch-side timing (time.perf_counter around jitted
calls) is unreliable on the axon TPU relay for anything under a few
milliseconds — the relay can ack dispatches, and even report buffers
ready, without the device work having run, so isolated micro-kernel
timings come back at up to 600x chip peak (measured 2026-08-17; see
tools/perf/roofline.py, .claude/skills/verify/SKILL.md). The device's own
profiler clock has no such failure mode: jax.profiler.trace captures
per-HLO-op device durations on-chip, and this tool aggregates them into
the flagship graph's pipeline stages.

Attribution: each traced XLA op (fusion/convolution/custom-call) is
mapped to a stage via its HLO metadata op_name — the flax module path
plus the jax.named_scope markers inside models/ecapa.py ("mfa",
"context_attention", "attentive_stats"). Fusions are classified by the
FLOP-carrying op they contain (dot/conv), else by their representative
metadata. Stage GFLOP values come from the analytic table in
tools/perf/roofline.py, so achieved TFLOP/s = analytic flops / measured
device time.

Run on TPU: python tools/perf/trace_roofline.py [--json]
"""

import argparse
import glob
import importlib.util
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

import jax

_spec = importlib.util.spec_from_file_location(
    "roofline", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "roofline.py"))
roofline = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("roofline", roofline)
_spec.loader.exec_module(roofline)

STAGE_ORDER = [
    "lfcc_frontend",
    "stem_conv_k5_60_512",
    "res2_1x1_convs_x6",
    "res2_64wide_chain_x3",
    "se_module_x3",
    "res2_bn_relu_residual",
    "mfa_3x_512_1536",
    "attention_and_pooling",
    "head_fc",
    "other",
]


def classify(op_name: str) -> str:
    """Map an HLO metadata op_name (module path, optionally suffixed with
    '@<source_file>' by the parser) to a pipeline stage."""
    op = op_name or ""
    if ("lfcc" in op.lower() or "Pallas" in op or "pallas_call" in op
            or "dsp.py" in op):
        return "lfcc_frontend"
    if "Bottle2neck" in op:
        if "SEModule1D" in op:
            return "se_module_x3"
        m = re.search(r"/Conv_(\d+)/", op)
        if m:
            i = int(m.group(1))
            # Conv_0 (in 1x1) and Conv_<scale> (out 1x1) are the wide
            # matmuls; Conv_1..Conv_7 are the 64-wide chain convs
            return ("res2_1x1_convs_x6" if i in (0, 8)
                    else "res2_64wide_chain_x3")
        return "res2_bn_relu_residual"
    if "/mfa/" in op or op.endswith("/mfa"):
        return "mfa_3x_512_1536"
    if ("context_attention" in op or "attentive_stats" in op
            or "/Conv_1/" in op or "/BatchNorm_1/" in op):
        return "attention_and_pooling"
    if "/Conv_0/" in op or "/BatchNorm_0/" in op:
        return "stem_conv_k5_60_512"
    if ("Dense_" in op or "BatchNorm_2" in op or "BatchNorm_3" in op
            or "OCSoftmax" in op or "Angular" in op or "one_class" in op):
        return "head_fc"
    return "other"


def _parse_hlo_repnames(hlo_text: str):
    """instruction name -> representative metadata op_name, resolved
    through fused computations.

    For each computation block, collect (instr_name, opcode, op_name
    metadata). A fusion instruction is represented by the first
    dot/convolution inside its called computation (the FLOP carrier),
    falling back to a majority-stage member."""
    comp_ops = {}      # computation name -> [(opcode, op_name)]
    instr_meta = {}    # entry instruction name -> (opcode, op_name, called)
    current = None
    comp_re = re.compile(
        r"^(?:ENTRY\s+)?%?([\w\.\-]+)\s*(?:\([^)]*\))?\s*->.*\{")
    # instruction name: '%name =' (type may be a tuple with spaces, so the
    # opcode is found separately: the first lowercase-led word followed by
    # '(' after the '=' — type tokens like bf16[..]{1,0:T(8,128)S(1)} only
    # put UPPERCASE letters before '(')
    name_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*(.*)$")
    opcode_re = re.compile(r"\b([a-z][\w\-]*)\(")
    meta_re = re.compile(r'op_name="([^"]*)"')
    src_re = re.compile(r'source_file="([^"]*)"')
    calls_re = re.compile(r"calls=%?([\w\.\-]+)")

    for line in hlo_text.splitlines():
        mc = comp_re.match(line.strip()) if "{" in line else None
        if mc and "=" not in line.split("{")[0]:
            current = mc.group(1)
            comp_ops.setdefault(current, [])
            continue
        mi = name_re.match(line)
        if not mi or current is None:
            continue
        name, rest = mi.group(1), mi.group(2)
        mo = opcode_re.search(rest)
        if not mo:
            continue
        opcode = mo.group(1)
        mm = meta_re.search(line)
        op_name = mm.group(1) if mm else ""
        ms = src_re.search(line)
        if ms:
            op_name += " @" + os.path.basename(ms.group(1))
        mcall = calls_re.search(line)
        comp_ops.setdefault(current, []).append((opcode, op_name))
        instr_meta[name] = (opcode, op_name, mcall.group(1) if mcall else None)

    def rep_of_instr(name):
        """Representative metadata op_name: the FLOP carrier inside the
        called computation of a fusion, else the stage-majority member,
        else the instruction's own op_name."""
        opcode, op_name, called = instr_meta.get(name, ("", "", None))
        if called and called in comp_ops:
            ops = comp_ops[called]
            for oc, on in ops:
                if oc in ("dot", "convolution", "custom-call") and on:
                    return on
            votes = {}
            for _, on in ops:
                if on:
                    votes.setdefault(classify(on), []).append(on)
            if votes:
                return max(votes.values(), key=len)[0]
        return op_name

    return {name: rep_of_instr(name) for name in instr_meta}


def _parse_hlo_metadata(hlo_text: str):
    """instruction name -> stage (see _parse_hlo_repnames)."""
    return {name: classify(rep)
            for name, rep in _parse_hlo_repnames(hlo_text).items()}


def _event_instr_name(nm: str):
    """Instruction name from a trace event.

    The axon TPU device plane names per-op events with the FULL HLO
    instruction text ('%foo = bf16[...] fusion(...)'); the CPU backend
    uses bare instruction names."""
    if nm.startswith("%"):
        nm = nm[1:]
    return nm.split(" = ", 1)[0].split("(", 1)[0].strip()


def _device_op_durations(trace_dir):
    """instruction name -> total ns, from the per-op line of the device
    plane. Only 'XLA Ops' (TPU) / XLAPjRt (CPU) lines count: the
    'XLA Modules' whole-program spans and the 'Async XLA Ops' copy
    duplicates would double-count the same device time."""
    from jax.profiler import ProfileData
    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    if not pbs:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    totals = {}
    for pb in pbs:
        pd = ProfileData.from_file(pb)
        for plane in pd.planes:
            pname = plane.name.lower()
            if "metadata" in pname or "task environment" in pname:
                continue
            plane_is_device = "/device:" in pname or "tpu" in pname
            for line in plane.lines:
                lname = line.name.lower()
                ok = (plane_is_device and lname == "xla ops") or \
                     "xlapjrt" in lname
                if not ok:
                    continue
                for ev in line.events:
                    nm = ev.name
                    if nm.startswith("end:") or not ev.duration_ns:
                        continue
                    key = _event_instr_name(nm)
                    totals[key] = totals.get(key, 0.0) + float(ev.duration_ns)
    return totals


def _attribute(durations, instr_rep, keyfn):
    """Aggregate event durations into buckets via keyfn(rep_op_name)."""
    bucket_ns = {}
    unmatched_ns = 0.0
    for nm, ns in durations.items():
        key = nm.lstrip("%")
        rep = instr_rep.get(key)
        if rep is None:
            # profiler sometimes suffixes repeats; retry without trailing .N
            rep = instr_rep.get(re.sub(r"\.\d+$", "", key))
        if rep is None:
            unmatched_ns += ns
            continue
        b = keyfn(rep)
        bucket_ns[b] = bucket_ns.get(b, 0.0) + ns
    return bucket_ns, unmatched_ns


def _trace_jitted(jitted, jargs, n_iter, carry_state=False):
    """Run + trace a jitted fn; return (instr->rep_op_name, durations)."""
    out = jitted(*jargs)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    if carry_state:
        jargs = (out[0],) + jargs[1:]

    trace_dir = tempfile.mkdtemp(prefix="roofline_trace_")
    with jax.profiler.trace(trace_dir):
        a = jargs
        for _ in range(n_iter):
            out = jitted(*a)
            if carry_state:
                a = (out[0],) + a[1:]
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])

    hlo = jitted.lower(*jargs).compile().as_text()
    return _parse_hlo_repnames(hlo), _device_op_durations(trace_dir)


def profile_inference(n_iter=30):
    """Trace the standard flagship inference graph and return
    (per-stage ms/step table, unattributed ns, n_iter)."""
    infer, args, _xla_flops = roofline.full_graph()
    instr_rep, durations = _trace_jitted(jax.jit(infer), args, n_iter)
    stage_ns, unmatched_ns = _attribute(durations, instr_rep, classify)
    return stage_ns, unmatched_ns, n_iter


def direction(rep_op_name: str) -> str:
    """fwd / bwd / update for a train-step metadata op_name: XLA marks
    reverse-mode ops with transpose(jvp(...)) wrappers; everything not
    under the model/loss modules is optimizer + BN bookkeeping."""
    op = rep_op_name or ""
    if "transpose(" in op:
        return "bwd"
    if classify(op) != "other" or "jvp(" in op:
        return "fwd"
    return "update/other"


def profile_train(n_iter=10):
    """Trace ONE flagship train step (B=64, ang_iso, unscanned) and
    return ((stage, direction) -> ns, unattributed ns, n_iter)."""
    import bench
    from asvspoof2021_air_tpu.train.steps import StepConfig, make_train_step

    _on, lfcc, model, ocs, rng, wave, labels = bench._flagship()
    state, btx, ltx = bench._train_state(rng, model, lfcc, wave, labels, ocs)
    step_fn = make_train_step(
        model, ocs, btx, ltx, StepConfig(add_loss="ang_iso"),
        frontend=lambda b, k, p=None: lfcc(b["wave"]),
    )
    batch = {"wave": wave, "label": labels}
    jitted = jax.jit(step_fn)
    jargs = (state, batch, jax.random.PRNGKey(1), 0.0)
    instr_rep, durations = _trace_jitted(jitted, jargs, n_iter,
                                         carry_state=True)
    bucket_ns, unmatched_ns = _attribute(
        durations, instr_rep, lambda rep: (classify(rep), direction(rep)))
    return bucket_ns, unmatched_ns, n_iter


def _train_rows(args, analytic):
    """Per-(stage, direction) rows for the train-step trace. Backward
    matmul FLOPs are ~2x forward (dgrad + wgrad), so bwd pct_peak uses
    2x the analytic stage FLOPs — an approximation, flagged as such."""
    bucket_ns, unmatched_ns, n = profile_train(args.iters)
    rows = []
    total_ms = 0.0
    for stage in STAGE_ORDER:
        for dirn, mult in (("fwd", 1.0), ("bwd", 2.0)):
            ns = bucket_ns.pop((stage, dirn), None)
            if ns is None:
                continue
            ms = ns / n / 1e6
            total_ms += ms
            row = {"stage": stage, "dir": dirn, "ms": round(ms, 3)}
            if stage in analytic:
                flops = analytic[stage] * mult
                tflops = flops / (ms / 1e3) / 1e12
                row.update({"gflop": round(flops / 1e9, 2),
                            "tflops": round(tflops, 1),
                            "pct_peak": round(
                                100 * tflops / roofline.PEAK_BF16_TFLOPS,
                                1)})
            rows.append(row)
    rest_ms = sum(ns for ns in bucket_ns.values()) / n / 1e6
    if bucket_ns:
        total_ms += rest_ms
        rows.append({"stage": "update/other", "dir": "-",
                     "ms": round(rest_ms, 3)})
    if unmatched_ns:
        ms = unmatched_ns / n / 1e6
        total_ms += ms
        rows.append({"stage": "unattributed", "dir": "-",
                     "ms": round(ms, 3)})
    rows.append({"stage": "TOTAL device", "dir": "-",
                 "ms": round(total_ms, 3),
                 "utt_s": round(roofline.B / (total_ms / 1e3), 0)
                 if total_ms else None})
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", action="store_true")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--graph", choices=("infer", "train"), default="infer")
    args = p.parse_args()

    analytic = {s[0]: s[1] for s in roofline.stage_defs()}

    if args.graph == "train":
        rows = _train_rows(args, analytic)
        if args.json:
            print(json.dumps(rows))
        else:
            print(f"{'stage':26} {'dir':>4} {'ms':>8} {'GFLOP':>8} "
                  f"{'TF/s':>7} {'%peak':>6}")
            for r in rows:
                print(f"{r['stage']:26} {r.get('dir', '-'):>4} "
                      f"{r.get('ms', 0):8.3f} "
                      f"{r.get('gflop', float('nan')):8.2f} "
                      f"{r.get('tflops', float('nan')):7.1f} "
                      f"{r.get('pct_peak', float('nan')):6.1f}")
        return

    stage_ns, unmatched_ns, n = profile_inference(args.iters)

    rows = []
    total_ms = 0.0
    for stage in STAGE_ORDER:
        if stage not in stage_ns:
            continue
        ms = stage_ns[stage] / n / 1e6
        total_ms += ms
        row = {"stage": stage, "ms": round(ms, 3)}
        if stage in analytic:
            gflop = analytic[stage] / 1e9
            tflops = analytic[stage] / (ms / 1e3) / 1e12
            row.update({"gflop": round(gflop, 2),
                        "tflops": round(tflops, 1),
                        "pct_peak": round(
                            100 * tflops / roofline.PEAK_BF16_TFLOPS, 1)})
        rows.append(row)
    if unmatched_ns:
        ms = unmatched_ns / n / 1e6
        total_ms += ms
        rows.append({"stage": "unattributed", "ms": round(ms, 3)})
    rows.append({"stage": "TOTAL device", "ms": round(total_ms, 3),
                 "utt_s": round(roofline.B / (total_ms / 1e3), 0)
                 if total_ms else None})

    if args.json:
        print(json.dumps(rows))
    else:
        print(f"{'stage':26} {'ms':>8} {'GFLOP':>8} {'TF/s':>7} {'%peak':>6}")
        for r in rows:
            print(f"{r['stage']:26} {r.get('ms', 0):8.3f} "
                  f"{r.get('gflop', float('nan')):8.2f} "
                  f"{r.get('tflops', float('nan')):7.1f} "
                  f"{r.get('pct_peak', float('nan')):6.1f}")


if __name__ == "__main__":
    main()
