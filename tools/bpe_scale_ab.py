"""Prove the BPE trainer's per-round cost stays flat beyond the 4 merges
the oracle windows — the round-7 verdict's task #2.

    python tools/bpe_scale_ab.py [sf_dir] [merge_counts ...]

Defaults: /root/testdata/sf0.1, merge counts 16 and 32. For each count it
runs the SAME bpe_round/bpe_merge_table loop the registered query ships
(including the BPE_CKPT_EVERY lazy lineage truncation) and times each
round's winner materialization — the 1-row argmax that next round's
replace() broadcasts, i.e. the only thing a round must compute. A flat
per-round series across 32 rounds is the evidence that lineage/job-count
growth (the connected_components 442-join failure class) is absent; a
creeping one says shorten BPE_CKPT_EVERY. Output: one JSON line, recorded
in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from fpl_data_pipeline_spark import get_spark  # noqa: E402
from fpl_data_pipeline_spark.operators.tokenizer import (  # noqa: E402
    BPE_CKPT_EVERY,
    bpe_round,
    bpe_vocab,
    bpe_vocab_from_words,
)
from fpl_data_pipeline_spark.tables import table  # noqa: E402


def stress_vocab(spark, sf_dir: str):
    """Vocab-scale stress: the synthetic corpus has only ~31 distinct
    trainable words, so per-round cost there says little about a real
    10^4-10^6-row vocabulary. Treat each in-document word TRIGRAM
    (concatenated, so it satisfies the [a-z0-9]+ unit contract) as a
    pseudo-word: same corpus, same collapse path (bpe_vocab_from_words),
    combinatorially realistic vocab size and word lengths (~15-20
    chars -> longer symbol sequences per round too)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " "),
                lambda w: w != "",
            )
        ).alias("pos", "w"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    tri = toks.select(
        F.concat("w", F.lead("w", 1).over(win), F.lead("w", 2).over(win)).alias(
            "word"
        )
    ).filter(F.col("word").isNotNull())
    return bpe_vocab_from_words(tri)


def run(spark, sf_dir: str, n_merges: int, stress: bool,
        ckpt_every: int = BPE_CKPT_EVERY) -> dict:
    vocab = (
        stress_vocab(spark, sf_dir)
        if stress
        else bpe_vocab(table(spark, sf_dir, "documents"))
    )
    t0 = time.perf_counter()
    n_vocab = vocab.count()  # materializes the corpus pass once, untimed rounds
    vocab_sec = round(time.perf_counter() - t0, 2)
    v = vocab
    round_secs = []
    merges = []
    for it in range(1, n_merges + 1):
        merge_row, v = bpe_round(v, it)
        t0 = time.perf_counter()
        rows = merge_row.collect()  # forces the winner's lazy checkpoint
        round_secs.append(round(time.perf_counter() - t0, 3))
        if not rows:
            break  # exhaustion contract: fewer rows than n_merges
        merges.append(rows[0]["merged"])
        if ckpt_every and it % ckpt_every == 0 and it < n_merges:
            v = v.localCheckpoint(eager=False)
    half = len(round_secs) // 2
    return {
        "n_merges": n_merges,
        "ckpt_every": ckpt_every,
        "n_vocab": n_vocab,
        "vocab_sec": vocab_sec,
        "round_secs": round_secs,
        "mean_first_half": round(sum(round_secs[:half]) / max(half, 1), 3),
        "mean_second_half": round(
            sum(round_secs[half:]) / max(len(round_secs) - half, 1), 3
        ),
        "last_merges": merges[-4:],
    }


def main() -> None:
    argv = sys.argv[1:]
    stress = "--stress" in argv
    argv = [a for a in argv if a != "--stress"]
    ckpt_every = BPE_CKPT_EVERY
    if "--ckpt" in argv:
        i = argv.index("--ckpt")
        ckpt_every = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    counts = [int(x) for x in argv[1:]] or [16, 32]
    spark = get_spark("bpe_scale_ab")
    out = {
        "sf_dir": sf_dir,
        "stress_trigram_vocab": stress,
        "ckpt_every": ckpt_every,
        "runs": [],
    }
    for n in counts:
        out["runs"].append(run(spark, sf_dir, n, stress, ckpt_every))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
