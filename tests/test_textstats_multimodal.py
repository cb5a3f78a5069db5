"""Text analysis + multimodal plumbing engine tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseriestokenizer_spark.functions.textstats import (
    md5_fingerprint,
    rolling_fingerprint_oracle,
    rolling_fingerprint_udf,
    with_lang_guess,
    with_quality,
    with_token_counts,
)
from timeseriestokenizer_spark.multimodal.binary_ops import (
    decode_media,
    extract_features,
    synth_media_from_documents,
)


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (0, "the cat sat on the mat and it is a good day to be alive"),
        (1, "der hund ist nicht zu haus und ich bin mit dem rad"),
        (2, "el perro es un animal que no se puede ver en la casa"),
        (3, "le chat est dans la maison et ce pour le moment"),
        (4, "这是一段中文文本没有空格"),
        (5, "xyzzy plugh frobnicate"),
        (6, "hello, world! 123 foo-bar."),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_lang_guess(spark, texts):
    out = {r["doc_id"]: r["lang_guess"] for r in with_lang_guess(texts).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "es"
    assert out[3] == "fr"
    assert out[4] == "zh"
    assert out[5] == "und"


def test_token_counts(spark, texts):
    out = {r["doc_id"]: r for r in with_token_counts(texts).collect()}
    assert out[6]["n_ws_tokens"] == 4
    # hello , world ! 123 foo - bar .  → 9 BPE-ish tokens
    assert out[6]["n_bpe_tokens"] == 9


def test_quality_bounds(spark, texts):
    out = with_quality(texts).toPandas()
    assert ((out["quality_score"] >= 0) & (out["quality_score"] <= 1)).all()
    scores = dict(zip(out["doc_id"], out["quality_score"]))
    assert scores[0] > scores[5]  # stopword-rich English beats gibberish


def test_rolling_fingerprint_parity(spark, texts):
    udf = rolling_fingerprint_udf()
    out = {r["doc_id"]: r["fp"] for r in texts.select("doc_id", udf("text").alias("fp")).collect()}
    for r in texts.collect():
        assert out[r["doc_id"]] == rolling_fingerprint_oracle(r["text"])


def test_md5_fingerprint_deterministic(spark, texts):
    a = texts.select("doc_id", md5_fingerprint("text").alias("fp")).toPandas()
    b = texts.select("doc_id", md5_fingerprint("text").alias("fp")).toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert a["fp"].nunique() == len(a)


def test_multimodal_pipeline(spark, texts):
    media = synth_media_from_documents(texts)
    m = media.toPandas()
    assert set(m.columns) == {"media_id", "kind", "payload", "meta"}
    feats = extract_features(media, feature_dim=8).toPandas()
    assert len(feats) == len(m)
    for _, r in feats.iterrows():
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-9  # normalized histogram
    # payload bytes are the UTF-8 text (metadata real even though decode fake)
    row4 = m[m.media_id == 4].iloc[0]
    assert bytes(row4["payload"]) == "这是一段中文文本没有空格".encode()
    assert row4["meta"]["n_bytes"] == len(bytes(row4["payload"]))


def test_decode_media_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "audio/mp3", fake=False)
    arr = decode_media(b"\x00\x01\x02\x03\x04", "image/fake", fake=True)
    assert arr.shape == (1, 4)


def test_feature_determinism(spark, texts):
    media = synth_media_from_documents(texts)
    a = extract_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    b = extract_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_wav_roundtrip_exact():
    import numpy as np

    from timeseriestokenizer_spark.multimodal.binary_ops import decode_wav, encode_wav

    rng = np.random.RandomState(5)
    samples = rng.randint(-32768, 32767, 777, dtype=np.int16)
    blob = encode_wav(samples, sample_rate=8000)
    back, rate = decode_wav(blob)
    assert rate == 8000 and back.shape == (777, 1)
    assert np.array_equal(back.ravel(), samples)


def test_bmp_roundtrip_exact():
    import numpy as np

    from timeseriestokenizer_spark.multimodal.binary_ops import decode_bmp, encode_bmp

    rng = np.random.RandomState(6)
    px = rng.randint(0, 256, (13, 7, 3), dtype=np.uint8)  # w*3 not 4-aligned
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_real_wav_decode_through_spark(spark):
    import numpy as np

    from timeseriestokenizer_spark.multimodal.binary_ops import (
        decode_wav,
        extract_features,
        synth_wav_media,
    )

    strings = ["the quick brown fox", "jumps over", "the lazy dog 123"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(strings)], "doc_id long, text string"
    )
    media = synth_wav_media(docs).cache()
    # payloads are REAL RIFF/WAVE: decode one on the driver
    row = media.orderBy("media_id").first()
    samples, rate = decode_wav(bytes(row["payload"]))
    expected = (
        np.frombuffer(strings[0].encode("utf-8")[:512], dtype=np.uint8).astype(np.int16)
        - 128
    ) * 257
    assert rate == 16000 and np.array_equal(samples.ravel(), expected)
    # and the distributed feature extractor takes the real-decode branch
    feats = extract_features(media, fake_decode=False).collect()
    assert len(feats) == len(strings)
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-9 for r in feats)
    media.unpersist()


def test_unknown_kind_raises_without_fake():
    import pytest as _pytest

    from timeseriestokenizer_spark.multimodal.binary_ops import decode_media

    with _pytest.raises(NotImplementedError, match="no pure-numpy codec"):
        decode_media(b"\xff\xfb\x90", "audio/mp3")


def test_resize_and_frame_sampling(spark):
    import numpy as np

    from timeseriestokenizer_spark.multimodal.binary_ops import (
        decode_bmp,
        encode_bmp,
        encode_video,
        resize_media,
        resize_pixels,
        sample_frames,
        sample_frames_media,
    )

    rng = np.random.RandomState(11)
    # local resize semantics: nearest-neighbor, exact corner pixels
    px = rng.randint(0, 256, (8, 6, 3), dtype=np.uint8)
    small = resize_pixels(px, 3, 4)
    assert small.shape == (4, 3, 3)
    assert (small[0, 0] == px[0, 0]).all()

    # distributed resize over real BMP payloads
    frames = [rng.randint(0, 256, (10, 9, 3), dtype=np.uint8) for _ in range(5)]
    media = spark.createDataFrame(
        [(i, "image/bmp", bytearray(encode_bmp(f))) for i, f in enumerate(frames)],
        "media_id long, kind string, payload binary",
    )
    resized = {r["media_id"]: bytes(r["payload"]) for r in resize_media(media, 4, 4).collect()}
    for i, f in enumerate(frames):
        assert np.array_equal(decode_bmp(resized[i]), resize_pixels(f, 4, 4))

    # video frame sampling: every 2nd frame decoded, others seeked over
    vid = encode_video(frames)
    sampled = sample_frames(vid, every_k=2)
    assert len(sampled) == 3
    assert all(np.array_equal(s, frames[j * 2]) for j, s in enumerate(sampled))

    vids = spark.createDataFrame(
        [(1, bytearray(vid)), (2, bytearray(encode_video(frames[:2])))],
        "media_id long, payload binary",
    )
    out = sample_frames_media(vids, every_k=2).toPandas()
    assert sorted(out[out.media_id == 1]["frame_idx"]) == [0, 2, 4]
    assert sorted(out[out.media_id == 2]["frame_idx"]) == [0]
    assert (out["width"] == 9).all() and (out["height"] == 10).all()
    assert all(abs(sum(f) - 1.0) < 1e-9 for f in out["feature"])


def test_corpus_report_composition(spark):
    """Per-(source, lang) report: volumes, token totals, and dup incidence
    computed against a hand-counted corpus."""
    from timeseriestokenizer_spark.functions.textstats import corpus_report

    rows = [
        (0, "the cat sat on the mat", "en", "web"),
        (1, "the cat sat on the mat", "en", "web"),   # exact dup of 0
        (2, "a completely different doc", "en", "web"),
        (3, "ein anderes dokument hier", "de", "web"),
        (4, "one doc from books source", "en", "books"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {
        (r["source"], r["lang"]): r for r in corpus_report(docs).collect()
    }
    web_en = got[("web", "en")]
    assert web_en["n_docs"] == 3
    assert web_en["n_dup_docs"] == 2          # docs 0 and 1
    assert web_en["total_ws_tokens"] == 6 + 6 + 4
    assert got[("web", "de")]["n_docs"] == 1
    assert got[("books", "en")]["n_dup_docs"] == 0
    assert 0.0 <= web_en["avg_quality"] <= 1.0


def test_rolling_fingerprint_long_doc_chunked_parity(spark):
    """One long outlier doc among many short ones exercises the
    length-bucketed chunking (the naive dense rows x maxlen matrix would
    pad every short doc to the outlier's length — ADVICE r3 OOM). Parity
    with the scalar oracle must hold across chunk boundaries."""
    from timeseriestokenizer_spark.functions.textstats import (
        rolling_fingerprint_oracle,
        rolling_fingerprint_udf,
    )

    texts = ["short doc %d" % i for i in range(300)]
    texts.append("x" * 200_000)  # long outlier
    texts.append("")  # empty doc
    df = spark.createDataFrame([(t,) for t in texts], "text string").coalesce(1)
    got = {
        r["text"][:40]: r["fp"]
        for r in df.select(
            "text", rolling_fingerprint_udf()("text").alias("fp")
        ).collect()
    }
    for t in texts:
        assert got[t[:40]] == rolling_fingerprint_oracle(t)


def test_redact_pii_staged_counts(spark):
    from timeseriestokenizer_spark.functions.textstats import redact_pii

    rows = [
        # one of each class; the 16-digit run must NOT match {10,15}
        (1, "mail a@b.com ip 12.34.56.78 acct 12345678901 ref 1234567890123456"),
        # email digits must not double-count as a long number (staged order)
        (2, "x12345678901@y.com only"),
        (3, "clean text, nothing to scrub 123"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r1 = got[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_longnum"]) == (1, 1, 1)
    assert r1["n_redactions"] == 3
    assert r1["redacted_len"] == len(
        "mail <EMAIL> ip <IP> acct <NUM> ref 1234567890123456"
    )
    r2 = got[2]
    assert (r2["n_email"], r2["n_ipv4"], r2["n_longnum"]) == (1, 0, 0)
    r3 = got[3]
    assert r3["n_redactions"] == 0
    import hashlib

    assert r3["redacted_md5"] == hashlib.md5(rows[2][1].encode()).hexdigest()
    # row-local scrub: zero exchanges, zero Python
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_hashing_tf_conservation_and_oracle(spark):
    """Feature hashing: total tf per doc == token count (collisions fold,
    never drop); bucket ids match DuckDB's md5 arithmetic exactly; plan is
    one exchange, all JVM."""
    import duckdb

    from timeseriestokenizer_spark.functions.features import hashing_tf

    rows = [
        (1, "the cat sat on the mat"),
        (2, "a b c a b a"),
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = hashing_tf(df, n_features=16)
    got = {(r["doc_id"], r["feature"]): r["tf"] for r in out.collect()}
    # conservation: sum of tf per doc == whitespace token count
    per_doc = {}
    for (d, _), tf in got.items():
        per_doc[d] = per_doc.get(d, 0) + tf
    assert per_doc == {1: 6, 2: 6, 3: 1}

    con = duckdb.connect()
    exp = {
        (d, f): tf
        for d, f, tf in con.execute(
            r"""
            WITH t(doc_id, text) AS (VALUES
              (1, 'the cat sat on the mat'),
              (2, 'a b c a b a'),
              (3, 'solo')),
            tok AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS w
              FROM t)
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) % 16
                     AS feature,
                   count(*) AS tf
            FROM tok GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == exp

    plan = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]  # AQE echoes the pre-AQE plan too
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Python" not in plan, plan


def test_oov_rate_known_fractions(spark):
    """OOV screening: handcrafted vocabulary overlap gives exact known
    fractions; fully-covered doc is 0.0, alien doc is 1.0; plan is
    JVM-only."""
    from timeseriestokenizer_spark.functions.textstats import oov_rate

    train = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "beta epsilon")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (1, "alpha beta beta"),          # all covered -> 0/3
            (2, "alpha zeta beta zeta"),     # 2 of 4 oov -> 0.5
            (3, "qqq www"),                  # fully alien -> 1.0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in oov_rate(train, ev).collect()}
    assert (out[1]["n_tok"], out[1]["n_oov"], out[1]["oov_frac"]) == (3, 0, 0.0)
    assert (out[2]["n_tok"], out[2]["n_oov"], out[2]["oov_frac"]) == (4, 2, 0.5)
    assert (out[3]["n_tok"], out[3]["n_oov"], out[3]["oov_frac"]) == (2, 2, 1.0)

    plan = (
        oov_rate(train, ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan, plan
