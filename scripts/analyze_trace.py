#!/usr/bin/env python
"""Summarize a jax.profiler trace: total device time + top ops by duration.

    python scripts/analyze_trace.py /tmp/step_trace [--top 40]

Reads the newest plugins/profile/*/\\*.trace.json.gz under the given logdir and
sums event durations on the TPU device lanes.
"""

import argparse
import collections
import glob
import gzip
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    pattern = os.path.join(args.logdir, "plugins", "profile", "*", "*.trace.json.gz")
    paths = sorted(glob.glob(pattern))
    if not paths:
        raise SystemExit(f"no trace found under {pattern}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids = {
        e["pid"]: e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    total_ms = collections.Counter()
    count = collections.Counter()
    grand = 0.0
    for e in events:
        if e.get("ph") == "X" and e["pid"] in tpu_pids:
            ms = e.get("dur", 0) / 1e3
            total_ms[e["name"]] += ms
            count[e["name"]] += 1
            grand += ms
    print(f"total device time: {grand:.1f} ms over {sum(count.values())} events"
          f" ({paths[-1]})")
    for name, ms in total_ms.most_common(args.top):
        print(f"{ms:9.2f} ms  x{count[name]:<5} {name[:110]}")

    # category rollup: where the step's device time goes, by op family
    def cat(name):
        n = name.lower()
        if "roi_align_backward" in n:
            return "roi_align bwd (pallas)"
        if "pooled_rois" in n or "roi_align" in n:
            return "roi_align fwd (pallas)"
        if n.startswith("copy") or ".copy" in n:
            return "copies"
        if "while" in n:
            return "while loops (NMS/topk)"
        if "convolution" in n:
            return "bare convolutions"
        if "fusion" in n:
            return "fusions (conv/elementwise)"
        if n.startswith("jit_") or n[:1].isdigit():
            return None  # enclosing step spans, not ops
        return "other"

    by_cat = collections.Counter()
    for name, ms in total_ms.items():
        c = cat(name)
        if c:
            by_cat[c] += ms
    print("\nby category:")
    for c, ms in by_cat.most_common():
        print(f"{ms:9.2f} ms  {c}")

    # subsystem rollup via the tf_op JAX scope paths (trace x HLO join): maps
    # every device op to the model subsystem that emitted it, split fwd vs
    # bwd (transpose), with model FLOPs summed for achieved-TF/s.
    def subsystem(tf_op):
        t = tf_op
        if "roi_align_backward" in t:
            return "roi_align bwd (pallas+pad)"
        if "pooled_rois" in t:
            return "roi_align fwd (pallas+reshape)"
        if "nms" in t:
            return "NMS"
        bwd = "transpose(" in t
        if ".features/" in t:
            return "backbone " + ("bwd" if bwd else "fwd")
        if ".box_features/" in t:
            return "res5 heads " + ("bwd" if bwd else "fwd")
        if ".rpn/" in t or "/rpn_head/" in t:
            return "rpn head " + ("bwd" if bwd else "fwd")
        if any(k in t for k in (".supervised", "weak_detector", "losses", "softmax",
                                 "cross_entropy")):
            return "predictors/losses"
        return "other (sampling/sort/update/misc)"

    by_sub = collections.Counter()
    flops_sub = collections.Counter()
    n_steps = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in tpu_pids:
            continue
        a = e.get("args") or {}
        t = a.get("tf_op")
        if not t:
            continue
        s = subsystem(t)
        by_sub[s] += e.get("dur", 0) / 1e3
        try:
            flops_sub[s] += int(a.get("model_flops", 0))
        except (TypeError, ValueError):
            pass
    steps = count.get("jit_step_fn", 0) or max(
        (c for n, c in count.items() if n.startswith("jit_")), default=1
    )
    print(f"\nby subsystem (tf_op join), per step (/{steps}):")
    for s, ms in by_sub.most_common():
        per = ms / max(steps, 1)
        tf = flops_sub[s] / (ms / 1e3) / 1e12 if ms else 0.0
        print(f"{per:9.2f} ms  {tf:6.1f} TF/s  {s}")


if __name__ == "__main__":
    main()
