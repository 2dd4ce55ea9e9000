"""txt_bpe_merge_step fused Arrow kernel (round 11): the per-task
pair-count partials must reproduce the words-explode +
in-word-pair-explode + hash-aggregate spelling the oracle is
generated from, exactly — same pairs, same counts, at any
partitioning (integer partials are associative)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_wrangler_spark.operators import dedup, textstats


def _old_spelling(docs):
    words = docs.select(
        F.explode(
            F.split(dedup.normalize_text(F.col("text")), " ")
        ).alias("wd")
    ).where(F.length("wd") >= 2)
    return (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(wd) - 1),"
                    " i -> substring(wd, i, 2))"
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _kernel(docs):
    return (
        textstats.bpe_pair_partials(docs, text_col="text")
        .groupBy("pair")
        .agg(F.sum("n").alias("n"))
    )


def test_bpe_pair_partials_match_explode_spelling(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {(r[0], r[1]) for r in _kernel(docs).collect()}
    exp = {(r[0], r[1]) for r in _old_spelling(docs).collect()}
    assert got == exp and got


def test_bpe_pair_partials_unicode_null_and_odd_partitioning(spark):
    # multi-byte codepoints (substring is CHARACTER-indexed in both
    # engines), NULL text, empty text, 1-char words, repeated spaces
    # (normalize collapses them), and a forced odd partitioning so
    # several tasks emit overlapping partials that must sum exactly.
    rows = [
        (1, "héllo wörld"),
        (2, "日本語のテキスト です"),
        (3, None),
        (4, ""),
        (5, "a b c ab"),
        (6, "  Spaces   COLLAPSE  here  "),
        (7, "héllo wörld"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(5)
    got = {(r[0], r[1]) for r in _kernel(docs).collect()}
    exp = {(r[0], r[1]) for r in _old_spelling(docs).collect()}
    assert got == exp and got
    # spot-pin one multibyte pair so the slice unit cannot drift to
    # bytes silently: "héllo" twice -> "hé" count 2
    assert ("hé", 2) in got
