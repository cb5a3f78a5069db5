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


def test_corpus_filter_decontaminate_and_mixture(spark, tmp_path, capsys):
    """The decontamination stage drops exactly the training doc that shares
    a >=13-token verbatim run with an eval doc; the mixture stage then fills
    each source's exact token quota."""
    import pandas as pd

    # 20-token docs, all words unique per doc so near-dedup keeps everything
    def doc(i, prefix):
        return " ".join(f"{prefix}{i}w{j}" for j in range(20))

    rows = [(i, doc(i, "web"), "en", "web") for i in range(14)]
    rows += [(100 + i, doc(i, "book"), "en", "books") for i in range(14)]
    eval_span = " ".join(f"held{j}" for j in range(14))  # 14 eval tokens
    # doc 5 replaces its tail with the eval span -> 14-token verbatim run
    rows[5] = (5, "web5w0 web5w1 web5w2 web5w3 web5w4 web5w5 " + eval_span,
               "en", "web")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    src, ev, out = str(tmp_path / "docs"), str(tmp_path / "eval"), str(tmp_path / "o")
    spark.createDataFrame(pdf).write.parquet(src)
    spark.createDataFrame(
        pd.DataFrame([(900, "filler " + eval_span + " trailer")],
                     columns=["doc_id", "text"])
    ).write.parquet(ev)

    from jobs.corpus_filter_job import main as job_main

    job_main([
        "--input", src, "--output", out, "--min-quality", "0",
        "--jaccard", "0.99", "--decontaminate", ev, "--decon-ngram", "13",
        "--mixture-weights", '{"web": 1.0, "books": 1.0}',
        "--token-budget", "200", "--test-fraction", "0.25",
        "--shard-chars", "400",
    ])
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    funnel = json.loads(line)["funnel"]
    assert funnel["input"] == 28
    assert funnel["decontaminated"] == 27          # only doc 5 dropped
    # 100-token quota per source at 20 tokens/doc -> exactly 5 docs each
    assert funnel["mixture"] == 10
    result = spark.read.parquet(out)
    assert result.filter("doc_id = 5").count() == 0
    per_src = dict(
        result.groupBy("source").count().toPandas().itertuples(index=False)
    )
    assert per_src == {"web": 5, "books": 5}
