"""End-to-end training-data prep pipeline: the full cleaning chain a
100 TB corpus runs before tokenization — normalize -> exact dedup ->
boilerplate strip -> quality filter (Gopher rules) -> near-dup safety
net -> leakage-safe split — composed from the same operators the gate
checks one by one, verified here as a CHAIN on a corpus with every
defect planted.

Stage order matters and is itself under test: exact dedup runs BEFORE
the boilerplate pass, because surface-variant duplicates collapse to
identical texts whose every chunk would otherwise cross the
document-frequency threshold and be stripped as "boilerplate".
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from sqlite_vector_spark.functions.text import fingerprint, normalize_text, words
from sqlite_vector_spark.operators.dedup import boilerplate_strip, lsh_candidate_pairs
from sqlite_vector_spark.workload import _gopher_keep, _gopher_metrics

HEADER = "all rights reserved click here to read more"  # 8 words, chunk-aligned
GOOD_BODY = (
    "the quick brown fox jumps over a lazy dog and then runs far away to find more food "
    "while the sun sets over a quiet hill and a cold wind moves the dry leaves around"
)
BOOK_BODY = (
    "a completely different story where the king and a dragon argue about the price of "
    "tea while the castle burns slowly and the people of the town watch from a distance"
)


@pytest.fixture(scope="module")
def raw_corpus(spark):
    # planted defects: surface-variant duplicates (case/punct), an
    # exact duplicate, a junk doc, a boilerplate header on every doc
    rows = [
        (1, f"{HEADER} {GOOD_BODY}", "web"),
        (2, f"{HEADER} {GOOD_BODY.upper()}", "web"),   # case variant of 1
        (3, f"{HEADER} {GOOD_BODY}!!!", "web"),        # punct variant of 1
        (4, f"{HEADER} the a of and to", "web"),       # junk: too short
        (5, f"{HEADER} {BOOK_BODY}", "books"),
        (6, f"{HEADER} {BOOK_BODY}", "books"),         # exact dup of 5
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_full_prep_chain(spark, raw_corpus):
    # 1. normalize: surface variants collapse to identical text
    norm = raw_corpus.select("doc_id", "source", normalize_text(F.col("text")).alias("text"))

    # 2. exact dedup FIRST (keep smallest id per fingerprint): 1/2/3
    # collapse, 5/6 collapse
    deduped = (
        norm.withColumn("fp", fingerprint(F.col("text")))
        .withColumn("rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    assert sorted(r.doc_id for r in deduped.select("doc_id").collect()) == [1, 4, 5]

    # 3. boilerplate strip: the header survives in 3 distinct docs
    # (df = 3 >= min_df) and is removed from each; bodies are intact
    stripped = boilerplate_strip(deduped, size=8, min_df=3).join(
        deduped.select("doc_id", "source"), "doc_id"
    )
    by_id = {r.doc_id: r for r in stripped.collect()}
    assert all(by_id[d].n_removed == 1 for d in (1, 4, 5))
    assert HEADER not in by_id[1].clean_text
    assert by_id[1].clean_text.startswith("the quick brown fox")
    assert by_id[5].clean_text.startswith("a completely different story")

    clean = stripped.select("doc_id", "source", F.col("clean_text").alias("text"))

    # 4. quality filter: doc 4 is now 5 junk words -> dropped
    kept = clean.where(_gopher_keep(*_gopher_metrics(words("text"))))
    kept_ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert kept_ids == [1, 5]

    # 5. near-dup safety net finds nothing further (survivors share
    # no shingles once the boilerplate is gone)
    assert lsh_candidate_pairs(kept, "doc_id", "text").count() == 0

    # 6. leakage-safe split: deterministic content-hash bucket,
    # stable across re-runs of the whole chain
    split = kept.withColumn("fp", fingerprint(F.col("text"))).select(
        "doc_id", (F.pmod(F.col("fp"), F.lit(100)) < 90).alias("is_train")
    )
    assert {r.doc_id: r.is_train for r in split.collect()} == {
        r.doc_id: r.is_train for r in split.collect()
    }


def test_order_sensitivity_documented(spark, raw_corpus):
    """Stripping BEFORE exact dedup wipes duplicate docs entirely —
    the failure mode that motivates the stage order above."""
    norm = raw_corpus.select("doc_id", normalize_text(F.col("text")).alias("text"))
    wrong = boilerplate_strip(norm, size=8, min_df=3)
    gutted = {r.doc_id for r in wrong.where(F.col("clean_len") == 0).collect()}
    assert {1, 2, 3} <= gutted  # every chunk of the triplicate went over df
