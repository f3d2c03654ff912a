"""Composed corpus-curation pipeline: the end-to-end disposition pass
a training-data run executes before tokenization — dedup, test-set
decontamination, quality filter, split assignment — as ONE DataFrame
flow over the corpus.

Each signal is an already-oracled operator; this composes them and
assigns one disposition per document with a fixed precedence:

    duplicate > contaminated > low_quality > kept(+split)

Plan shape at 100 TB (the corpus scan feeds three thin side-channels
that join back on doc_id):
- dedup: one window over content_hash (single keyed shuffle of
  (id, hash) pairs);
- decontam: broadcast benchmark-gram semi-join (corpus grams never
  shuffle, see operators/decontam.py) whose flagged set is tiny;
- quality + split: pure map-side expressions;
- the final joins are id-keyed and thin (ids + enum + small ints) —
  the text column is read once and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score
from .decontam import contaminated_docs
from .dedup import exact_duplicates
from .sampling import hash_split

DEFAULT_SPLITS = {"train": 90, "val": 5, "test": 5}


def curate(
    corpus: DataFrame,
    benchmark: DataFrame,
    quality_min: float = 0.9,
    ngram_n: int = 3,
    splits: dict[str, int] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact_grams: bool = True,
) -> DataFrame:
    """(doc_id, disposition, canonical_id, n_hits, quality, split).

    disposition: 'duplicate' (non-canonical member of an exact-dup
    set), 'contaminated' (shares an n-gram with the benchmark),
    'low_quality' (quality < quality_min), else 'kept' — and only
    kept docs get a split label."""
    dup = exact_duplicates(corpus, id_col=id_col, text_col=text_col).select(
        id_col, "canonical_id"
    )
    flagged = contaminated_docs(
        corpus, benchmark, n=ngram_n, id_col=id_col, text_col=text_col,
        exact=exact_grams,
    )
    base = hash_split(
        corpus.select(
            F.col(id_col), quality_score(text_col).alias("quality")
        ),
        id_col,
        splits or DEFAULT_SPLITS,
    )
    out = (
        base.join(dup, id_col)
        .join(flagged, id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0).cast("long")))
    )
    disposition = (
        F.when(F.col(id_col) != F.col("canonical_id"), "duplicate")
        .when(F.col("n_hits") > 0, "contaminated")
        .when(F.col("quality") < quality_min, "low_quality")
        .otherwise("kept")
    )
    return out.select(
        id_col,
        disposition.alias("disposition"),
        "canonical_id",
        "n_hits",
        "quality",
        F.when(disposition == "kept", F.col("split"))
        .otherwise(F.lit(None).cast("string"))
        .alias("split"),
    )
