"""End-to-end corpus filter job: the funnel removes junk, exact dups, and
near dups; split and shards are deterministic."""

import json

import pandas as pd
from pyspark.sql import functions as F


def _corpus(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and it is a good day "
        "to write a long and meaningful document about many things you see"
    )
    rows = []
    for i in range(20):
        rows.append((i, good + f" variant {i}", "en", "src0", 0))
    rows.append((100, good + " variant 3", "en", "src0", 0))      # exact dup of 3
    near = good + " variant 7 extra"
    rows.append((101, near, "en", "src0", 0))                      # near dup of 7
    rows.append((102, "x", "en", "src0", 0))                       # junk (low quality)
    rows.append((103, "!!! ??? ,,, ###", "en", "src0", 0))         # junk (punct)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "pad"])
    pdf["n_chars"] = pdf["text"].str.len()
    return spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "n_chars"]]
    )


def test_corpus_filter_funnel(spark, tmp_path, capsys):
    src, out = str(tmp_path / "docs"), str(tmp_path / "filtered")
    _corpus(spark).write.parquet(src)

    from jobs.corpus_filter_job import main as job_main

    job_main([
        "--input", src, "--output", out,
        "--min-quality", "0.35", "--jaccard", "0.5",
        "--test-fraction", "0.25", "--shard-chars", "400",
    ])
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    funnel = json.loads(line)["funnel"]

    assert funnel["input"] == 24
    assert funnel["quality_gate"] <= 22            # junk docs gated
    assert funnel["exact_dedup"] == funnel["quality_gate"] - 1   # doc 100 dropped
    assert funnel["near_dedup"] < funnel["exact_dedup"]          # 101 + high-jaccard variants collapse
    assert funnel["output"] == funnel["near_dedup"]

    result = spark.read.parquet(out)
    assert set(result.select("split").distinct().toPandas()["split"]) <= {"train", "test"}
    # deterministic: re-running yields the identical table
    out2 = str(tmp_path / "filtered2")
    job_main([
        "--input", src, "--output", out2,
        "--min-quality", "0.35", "--jaccard", "0.5",
        "--test-fraction", "0.25", "--shard-chars", "400",
    ])
    a = result.select("doc_id", "split", "shard_id").orderBy("doc_id").collect()
    b = spark.read.parquet(out2).select("doc_id", "split", "shard_id").orderBy("doc_id").collect()
    assert a == b
