"""Prove the logreg trainer's per-step cost stays flat beyond the 3 steps
the oracle windows — the round-8 verdict's task #1 (the exact analogue of
round 7's BPE task, same template as tools/bpe_scale_ab.py).

    python tools/logreg_scale_ab.py [sf_dir] [step_counts ...] [--no-ckpt]

Defaults: /root/testdata/sf0.1, step counts 16 and 64. For each count it
runs the SAME _lr_features/_lr_step loop the registered query ships
(including the LR_CKPT_EVERY lazy lineage truncation on w) and times each
step's 64-row weight materialization. Each gradient step appends three
joins to w's plan, so without truncation the analyzed plan grows linearly
with the step count — the connected_components 442-join failure class. A
flat per-step series through 64 steps is the evidence that class is
absent; a creeping one says shorten LR_CKPT_EVERY. `--no-ckpt` runs the
cadence-off control arm. Output: one JSON line, recorded in
BENCH_NOTES.md.

Within a cadence window the per-step collect re-runs from the last
checkpoint, so the raw series saw-tooths with period LR_CKPT_EVERY by
construction; the creep signal is the first-half vs second-half MEAN and
the per-window peaks, not individual steps.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from fpl_data_pipeline_spark import get_spark  # noqa: E402
from fpl_data_pipeline_spark.functions.learned import (  # noqa: E402
    LR_B,
    LR_CKPT_EVERY,
    _lr_features,
    _lr_step,
)
from fpl_data_pipeline_spark.tables import table  # noqa: E402


def run(spark, sf_dir: str, n_steps: int, ckpt_every: int) -> dict:
    d = table(spark, sf_dir, "documents")
    docfeat, lab, ntr = _lr_features(d)
    t0 = time.perf_counter()
    n_feat = docfeat.count()  # materializes the corpus pass once, untimed steps
    feat_sec = round(time.perf_counter() - t0, 2)
    w = spark.range(LR_B).select(
        F.col("id").alias("bucket"), F.lit(0).cast("long").alias("w6")
    )
    step_secs = []
    final_w = None
    for t in range(1, n_steps + 1):
        w = _lr_step(docfeat, lab, ntr, w)
        if ckpt_every and t % ckpt_every == 0 and t < n_steps:
            w = w.localCheckpoint(eager=False)
        t0 = time.perf_counter()
        final_w = w.collect()  # forces the chain (and any lazy ckpt) to here
        step_secs.append(round(time.perf_counter() - t0, 3))
    half = len(step_secs) // 2
    nonzero = sum(1 for r in final_w if r["w6"] != 0)
    return {
        "n_steps": n_steps,
        "ckpt_every": ckpt_every,
        "n_feat_rows": n_feat,
        "feat_sec": feat_sec,
        "step_secs": step_secs,
        "mean_first_half": round(sum(step_secs[:half]) / max(half, 1), 3),
        "mean_second_half": round(
            sum(step_secs[half:]) / max(len(step_secs) - half, 1), 3
        ),
        # per-cadence-window peak: the saw-tooth's envelope — flat peaks
        # across windows is the lineage-bounded signal
        "window_peaks": [
            round(max(step_secs[i : i + (ckpt_every or len(step_secs))]), 3)
            for i in range(0, len(step_secs), ckpt_every or len(step_secs))
        ],
        "n_nonzero_weights": nonzero,
    }


def main() -> None:
    argv = sys.argv[1:]
    ckpt_every = LR_CKPT_EVERY
    if "--no-ckpt" in argv:
        ckpt_every = 0
        argv = [a for a in argv if a != "--no-ckpt"]
    if "--ckpt" in argv:
        i = argv.index("--ckpt")
        ckpt_every = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    args = argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    counts = [int(x) for x in args[1:]] or [16, 64]
    spark = get_spark("logreg_scale_ab")
    out = {"sf_dir": sf_dir, "ckpt_every": ckpt_every, "runs": []}
    for n in counts:
        out["runs"].append(run(spark, sf_dir, n, ckpt_every))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
