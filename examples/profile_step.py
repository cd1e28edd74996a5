"""Profile the benched W8A8 forget step and attribute its time (VERDICT r4
ask #6: "profile the benched step ... then attack the biggest bucket or
write the int8-path roofline analysis").

Captures a jax.profiler device trace of the exact bench.py operating point
(llava-7b, bs2 seq768, W8A8+int8-dx, grad_diff, remat) and prints the
per-op-category time breakdown parsed from the xplane artifact: int8
matmuls vs bf16 attention vs LoRA vs everything else.

  python examples/profile_step.py [variant] [outdir]

variant as in examples/perf_sweep.py ("w8a8b:full" = the benched default).
Writes <outdir>/profile_summary.json + the raw trace directory.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def _bucket(name):
    """Bucket an XLA-op event by ITS OWN op name (before '=') + the dtypes
    visible in its expression — operand refs inside fusion names would
    otherwise misattribute (a bf16 fusion consuming %convolution... is not
    a matmul).  Returns None for `while` wrappers, whose duration covers
    their nested leaf events (the layer scans span the whole step)."""
    out = name.split("=")[0].strip().lstrip("%")
    rhs = name.split("=", 1)[1] if "=" in name else ""
    if out.startswith("while"):
        return None
    if out.startswith(("rematted_computation", "checkpoint")) or "custom-call" in rhs[:200]:
        return "pallas attention kernels"
    if out.startswith("convolution"):
        return "matmul: int8 operand" if "s8[" in rhs[:400] else "matmul: bf16"
    if out.startswith("abs_reduce"):
        return "activation quantize (absmax)"
    if out.startswith(("copy", "transpose", "bitcast", "reshape", "slice", "dynamic")):
        return "copy/layout"
    if out.startswith("fusion"):
        return ("fusion w/ int8 matmul inside" if "s8[" in rhs[:400]
                else "elementwise fusion (bf16)")
    return "other"


def summarize_xplane(trace_dir):
    """Aggregate the TPU plane's 'XLA Ops' line by op bucket; the 'Steps'
    line gives traced wall per step (leaf sum should match it)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = []
    for root, _dirs, fs in os.walk(trace_dir):
        files += [os.path.join(root, f) for f in fs if f.endswith(".xplane.pb")]
    if not files:
        return None
    buckets = {}
    per_op = {}  # op-name (pre-'=') -> (bucket, total_s) for top-N attribution
    steps_s = 0.0
    n_steps = 0
    for path in files:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            for line in plane.lines:
                if line.name == "Steps":
                    steps_s += sum(ev.duration_ps for ev in line.events) / 1e12
                    n_steps += len(line.events)
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, "")
                    key = _bucket(name)
                    if key:
                        buckets[key] = buckets.get(key, 0.0) + ev.duration_ps / 1e12
                        op = name.split("=")[0].strip().lstrip("%")
                        b, t = per_op.get(op, (key, 0.0))
                        per_op[op] = (b, t + ev.duration_ps / 1e12)
    return {"total_device_s": sum(buckets.values()), "buckets": buckets,
            "per_op": per_op,
            "n_steps": n_steps, "steps_wall_s": steps_s, "files": files}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "w8a8b:full"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_step"
    os.makedirs(outdir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from perf_sweep import build

    parts = variant.split(":")
    precision, remat = parts[0], parts[1] if len(parts) > 1 else "full"
    step, state, params, teacher, batch, _flops = build(precision, remat)

    # warmup/compile (value-fetch sync — axon proxy gotcha)
    state, metrics = step(state, params, teacher, batch)
    float(metrics["loss"])

    trace_dir = os.path.join(outdir, "trace")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, metrics = step(state, params, teacher, batch)
        float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(8):
        state, metrics = step(state, params, teacher, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / 8

    summary = {"variant": variant, "steps_per_s": round(1 / dt, 4),
               "step_ms": round(dt * 1e3, 2)}
    parsed = summarize_xplane(trace_dir)
    if parsed and parsed["n_steps"]:
        n = parsed["n_steps"]
        summary["device_op_breakdown_ms_per_step"] = {
            k: round(v / n * 1e3, 1)
            for k, v in sorted(parsed["buckets"].items(), key=lambda kv: -kv[1])
        }
        summary["leaf_sum_ms_per_step"] = round(parsed["total_device_s"] / n * 1e3, 1)
        summary["traced_step_wall_ms"] = round(parsed["steps_wall_s"] / n * 1e3, 1)
        # exact-op attribution of the non-matmul buckets (copy/layout,
        # absmax): which named ops carry the time, so the fix targets the
        # real producer instead of a category
        summary["top_ops_ms_per_step"] = [
            {"op": op, "bucket": b, "ms": round(t / n * 1e3, 2)}
            for op, (b, t) in sorted(
                parsed["per_op"].items(), key=lambda kv: -kv[1][1])[:25]
        ]
    with open(os.path.join(outdir, "profile_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
