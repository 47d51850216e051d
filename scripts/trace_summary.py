"""Summarize a jax.profiler xplane trace of the train_clip step: device time
grouped by subsystem, plus the top individual XLA ops. Companion to
scripts/profile_breakdown.py (which times isolated sub-graphs).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python scripts/trace_summary.py /tmp/jtrace [n_steps]
"""

import collections
import glob
import re
import sys


def categorize(name: str) -> str:
    if "36864,2048" in name or "2048,3,4" in name or re.match(r"%while\.\d+ = \(s32\[\]", name):
        return "raster (GT template render)"
    if re.search(r"\[(802816|702464|602112|501760|401408|100352)[,\]]", name):
        if re.search(r"\[(802816|702464|602112|501760|401408),(512|295|262|257|256|218|217|39|6|3|1)\]", name):
            return "MLP sweeps (802k-401k x width)"
        return "merge/sample_pdf 1-D streams"
    if "12544," in name:
        return "per-ray (R,S) ops"
    if "224,224" in name or ",768" in name or "49408" in name:
        return "CLIP"
    if "36864" in name:
        return "dense S^2 images / scatter / resize"
    if re.search(r"\[(256,256|257,256|256,262|217,\d+|256,39|39,256)\]", name):
        return "weight-sized ops (grads/adam/wn)"
    return "other"


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtrace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    xs = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))[-1]
    sp = xplane_pb2.XSpace()
    with open(xs, "rb") as f:
        sp.ParseFromString(f.read())
    plane = [p for p in sp.planes if p.name == "/device:TPU:0"][0]
    md = plane.event_metadata
    line = [l for l in plane.lines if l.name == "XLA Ops"][0]

    agg = collections.Counter()
    per_op = collections.Counter()
    for e in line.events:
        name = md[e.metadata_id].name
        agg[categorize(name)] += e.duration_ps
        per_op[name] += e.duration_ps

    tot = sum(agg.values())
    print(f"== device time by subsystem ({n_steps} steps) ==")
    for k, v in agg.most_common():
        print(f"{v/1e9/n_steps:8.2f} ms/step  {100*v/tot:5.1f}%  {k}")
    print(f"{tot/1e9/n_steps:8.2f} ms/step total device time")
    print("\n== top 20 ops ==")
    for nm, ps in per_op.most_common(20):
        print(f"{ps/1e9/n_steps:8.3f} ms  [{categorize(nm)}]  {nm[:100]}")


if __name__ == "__main__":
    main()
