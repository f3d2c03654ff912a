"""Relation extraction: pattern match between mention pairs.

Dependency-pattern-lite (north_star stage): for every ordered pair of
linked mentions in the same sentence with m1 strictly before m2, the
token sequence strictly between them is matched against a broadcast
predicate-pattern dictionary ("works for" -> works_for, ...).

Implementation is a SINGLE PASS over linked mentions — no self-join.
A naive m1 x m2 self-join would execute the (expensive) upstream NER
subtree twice, since Spark does not share common subplans across the
two join inputs. Instead: groupBy (url, sentence_id) collecting the
<=marker_max mentions of a sentence into an array, expand ordered
pairs with higher-order array expressions (codegen, no UDF), then one
equi-join against sentences for the token array and one broadcast
join against the pattern dictionary.

Skew note: mentions per sentence are bounded (decode emits
non-overlapping spans, so <= num_words/1), keeping the pair expansion
per-row bounded; page-level skew is handled upstream by the url-hash
partitioning, and the groupBy key (url, sentence_id) is fine-grained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def extract_relations(
    linked: DataFrame, sentences: DataFrame, patterns: dict[str, str]
) -> DataFrame:
    """linked mentions + sentences(tokens) -> triples
    (subj, pred, obj, url, sentence_id).

    Delegates to extract_relations_rich with every pattern
    forward-direction and an empty ignore set — ONE pair-expansion /
    phrase-match implementation, so a fix to the pair rule or the gap
    arithmetic can never apply to one extractor only (round-4 review:
    the two copies had started life duplicated)."""
    return extract_relations_rich(
        linked,
        sentences,
        {k: (v, False) for k, v in patterns.items()},
        ignore_tokens=[],
    )


def extract_relations_rich(
    linked: DataFrame,
    sentences: DataFrame,
    patterns: dict[str, tuple[str, bool]],
    ignore_tokens: list[str],
) -> DataFrame:
    """Rich pattern matching, same single-pass plan shape as
    extract_relations (one groupBy + pair expansion in array
    expressions + one thin sentence join + one broadcast pattern
    join; zero UDFs), with two additions:

    - **inverse patterns**: a dictionary entry (pred, inverted=True)
      expresses the predicate with subject/object swapped — "globex
      was acquired by acme" emits acquired(acme, globex);
    - **adverb-tolerant gaps**: tokens in `ignore_tokens` are
      filtered from the inter-mention token sequence before lookup,
      so "was quickly acquired by" still matches "was acquired by".

    Output matches extract_relations' (subj, pred, obj, url,
    sentence_id) contract; the matched direction is folded into the
    column order. Reference scope note: the reference repo is NER-only
    (SURVEY.md §2.10) — this stage exists for the north_star's
    'dependency-pattern relation extraction' and extends it the way a
    dependency matcher treats adverbial modifiers as skippable."""
    spark = linked.sparkSession
    pat = spark.createDataFrame(
        [(k, v, inv) for k, (v, inv) in patterns.items()],
        "phrase string, pred string, inverted boolean",
    )
    grouped = (
        linked.filter(F.col("entity_id").isNotNull())
        .groupBy("url", "sentence_id")
        .agg(
            F.collect_list(
                F.struct("entity_id", "word_start_index", "word_end_index")
            ).alias("ms")
        )
    )
    pairs_expr = F.expr(
        "flatten(transform(ms, m1 -> "
        " transform(filter(ms, m2 -> m1.word_end_index <= m2.word_start_index), "
        "  m2 -> struct(m1.entity_id as first_id, m2.entity_id as second_id, "
        "              m1.word_end_index as gap_start, "
        "              m2.word_start_index - m1.word_end_index as gap_len))))"
    )
    pairs = (
        grouped.withColumn("pair", F.explode(pairs_expr))
        .select("url", "sentence_id", "pair.*")
    )
    toks = sentences.select("url", "sentence_id", "tokens").hint("merge")
    joined = pairs.join(toks, ["url", "sentence_id"])
    if ignore_tokens:
        phrase = F.array_join(
            F.expr(
                "filter(slice(tokens, gap_start + 1, gap_len), "
                "t -> NOT array_contains(_ignore, t))"
            ),
            " ",
        )
        joined = joined.withColumn(
            "_ignore", F.array(*[F.lit(t) for t in ignore_tokens])
        )
    else:
        # a zero-element F.array() is array<void> and breaks
        # array_contains resolution — and the filter is an identity
        # anyway, so the plain-extractor delegation keeps its exact
        # original expression shape
        phrase = F.array_join(
            F.expr("slice(tokens, gap_start + 1, gap_len)"), " "
        )
    phrased = joined.withColumn("phrase", phrase).drop("tokens", "_ignore")
    return (
        phrased.join(F.broadcast(pat), "phrase")
        .select(
            F.when(F.col("inverted"), F.col("second_id"))
            .otherwise(F.col("first_id"))
            .alias("subj"),
            "pred",
            F.when(F.col("inverted"), F.col("first_id"))
            .otherwise(F.col("second_id"))
            .alias("obj"),
            "url",
            "sentence_id",
        )
    )


def negative_triples(triples: DataFrame) -> DataFrame:
    """Deterministic negative sampling over the emitted triples — the
    standard training-data prep for KG-embedding models (TransE /
    DistMult corrupt-one-slot sampling, Bordes et al. 2013): each
    (subj, pred, obj) gets a corrupted object drawn pseudo-randomly
    from the corpus-wide object vocabulary, hash-derived so the
    sample is reproducible and resumable (no RNG state — a re-run or
    a partial retry emits byte-identical rows).

    The draw: rank the distinct objects (idx 0..n-1 in lexical
    order); pick = portable_hash64(subj|pred|obj) mod n; if the pick
    collides with the true object, take (pick+1) mod n. (Degenerate
    single-entity pools return the true object — unavoidable and
    harmless: downstream loss terms with neg == pos are dropped.)

    Output: (subj, pred, obj, neg_obj, url, sentence_id).

    Scale design (100 TB): the object pool is entity-vocabulary-sized
    — the ONE global sort here ranks that vocabulary, never triples
    (at 10^9 entities swap row_number for zipWithIndex-style
    per-partition offsets; same output contract). The two candidate
    lookups are broadcast hash joins on idx (the pool broadcasts at
    vocabulary scale; AQE falls back to a keyed join if it outgrows
    the threshold), and the triple side never shuffles: hash, mod,
    and the final CASE are map-side codegen.
    """
    from spanmarkerner_spark.functions.hashing import portable_hash64

    pool = (
        triples.select(F.col("obj").alias("cand"))
        .distinct()
        .withColumn(
            "idx", F.row_number().over(Window.orderBy("cand")) - 1
        )
    )
    n = pool.agg(F.count(F.lit(1)).cast("long").alias("n_pool"))
    picked = (
        triples.crossJoin(F.broadcast(n))
        .withColumn(
            "_pick",
            portable_hash64(F.concat_ws("|", "subj", "pred", "obj"))
            % F.col("n_pool"),
        )
        .withColumn("_pick2", (F.col("_pick") + 1) % F.col("n_pool"))
    )
    c1 = F.broadcast(pool.select(F.col("idx").alias("_pick"),
                                 F.col("cand").alias("_c1")))
    c2 = F.broadcast(pool.select(F.col("idx").alias("_pick2"),
                                 F.col("cand").alias("_c2")))
    return (
        picked.join(c1, "_pick")
        .join(c2, "_pick2")
        .select(
            "subj", "pred", "obj",
            F.when(F.col("_c1") == F.col("obj"), F.col("_c2"))
            .otherwise(F.col("_c1"))
            .alias("neg_obj"),
            "url", "sentence_id",
        )
    )


def triple_confidence(triples: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Corpus-level confidence scoring for extracted triples — the
    Knowledge-Vault-style aggregation step (Dong et al. 2014) that
    turns per-sentence extractions into a weighted graph: each
    distinct (subj, pred, obj) fact gets its extraction support
    (total occurrences), source diversity (distinct URLs — one page
    asserting a fact 50 times is weaker evidence than 50 pages
    asserting it once), and a pointwise-lift score
    lift = p(subj,obj) / (p(subj)·p(obj)) over the triple corpus —
    the exact-integer analogue of PMI (monotone in it), emitted as
    BIGINT ppm: support·N·scale DIV (n_subj·n_obj). High-lift,
    multi-source facts are the KG edges worth keeping; lift ~1e6
    (independence) marks co-occurrence noise.

    Output per distinct (subj, pred, obj):
      (subj, pred, obj, support, n_urls, n_subj, n_obj, lift_ppm)

    Overflow bound: support·N·scale must fit BIGINT — fine to
    N ≈ 3·10^6 at worst-case support=N; at web scale (10^9+ triples)
    divide in two steps ((support·scale DIV n_subj)·N DIV n_obj,
    documented precision trade) or score in log-domain doubles.

    Scale design (100 TB): all four aggregations are keyed on
    entity-vocabulary-thin columns with map-side partial aggregation
    — the exchanges carry (entity, count) pairs, never sentence rows.
    The subj/obj marginals are vocabulary-sized and broadcast back
    onto the fact table; N is a 1-row broadcast. The fact table
    itself shuffles once (the groupBy on (subj,pred,obj)) and never
    again.
    """
    t = triples.select("subj", "pred", "obj", "url")
    facts = t.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("support"),
        F.countDistinct("url").cast("long").alias("n_urls"),
    )
    n_subj = t.groupBy("subj").agg(
        F.count(F.lit(1)).cast("long").alias("n_subj")
    )
    n_obj = t.groupBy("obj").agg(
        F.count(F.lit(1)).cast("long").alias("n_obj")
    )
    n_total = t.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        facts.join(F.broadcast(n_subj), "subj")
        .join(F.broadcast(n_obj), "obj")
        .crossJoin(F.broadcast(n_total))
        .select(
            "subj",
            "pred",
            "obj",
            "support",
            "n_urls",
            "n_subj",
            "n_obj",
            F.expr(f"support * n_total * {scale} div (n_subj * n_obj)")
            .cast("long")
            .alias("lift_ppm"),
        )
    )


def relation_signatures(
    triples: DataFrame, entity_labels: DataFrame
) -> DataFrame:
    """Relation type-signature induction — the schema-induction step
    of open KG construction (NELL's category-relation coupling,
    Carlson et al. 2010): for each predicate, the distribution over
    (subject type, object type) pairs. A predicate whose mass
    concentrates on one signature ("acquired": org->org) is
    schema-consistent; mass off the dominant signature localizes
    extraction errors, and the induced signature set is the type
    constraint later extraction epochs filter against.

    entity_labels: (entity_id, label) — one row per entity (derive
    from linked mentions; enforce uniqueness upstream).

    Output per (pred, subj_label, obj_label):
      (pred, subj_label, obj_label, n, n_pred, share_ppm)
    share_ppm = exact BIGINT ppm of the predicate's triples carrying
    this signature.

    Scale design (100 TB): entity_labels is entity-vocabulary-sized
    and broadcast twice (subj leg, obj leg) — the triple table never
    shuffles for the joins; the signature groupBy exchanges
    (pred, label, label) triplets (predicate-vocabulary-thin, heavy
    map-side partial agg), and the per-pred totals re-aggregate from
    the signature table itself (predicate-vocabulary-sized), not from
    the triples a second time.
    """
    sl = entity_labels.select(
        F.col("entity_id").alias("subj"), F.col("label").alias("subj_label")
    )
    ol = entity_labels.select(
        F.col("entity_id").alias("obj"), F.col("label").alias("obj_label")
    )
    sig = (
        triples.select("subj", "pred", "obj")
        .join(F.broadcast(sl), "subj")
        .join(F.broadcast(ol), "obj")
        .groupBy("pred", "subj_label", "obj_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = sig.groupBy("pred").agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    return (
        sig.join(F.broadcast(totals), "pred")
        .select(
            "pred",
            "subj_label",
            "obj_label",
            "n",
            "n_pred",
            F.expr("n * 1000000 div n_pred").cast("long").alias("share_ppm"),
        )
    )


def fact_temporal_windows(
    triples: DataFrame,
    page_ts: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Fact observation windows — the temporal-KG scoping step
    (YAGO2-style fact timestamping, Hoffart et al. 2011: every fact
    carries the time span of its supporting observations). Web
    corpora are crawled repeatedly; the first/last time a triple is
    observed bounds its validity window, and observation recency is
    the freshness signal fact-ranking consumers (and re-crawl
    schedulers) read.

    triples: (subj, pred, obj, url) extraction output;
    page_ts: (url, warc_ts) — pages with a NULL ts are dropped
    (timestamp-less sources contribute no temporal evidence).

    Output per (subj, pred, obj):
      first_seen_epoch / last_seen_epoch — BIGINT unix seconds
      (bit-identical cross-engine under the UTC session pin),
      n_obs — timestamped supporting extractions,
      n_urls — distinct timestamped source pages,
      span_seconds — last - first (0 for single-snapshot facts).

    Scale design (100 TB): page_ts is projected to the thin
    (url, ts) pair before the join — the html/text bytes never move;
    the join shuffles on the url key both sides already share with
    every per-doc pipeline stage, and the triple groupBy is
    map-side-combinable with a key space orders of magnitude smaller
    than the extraction table. No broadcast is forced: at real scale
    BOTH sides are large, and AQE picks the strategy (and splits skew)
    from observed sizes.
    """
    ts = page_ts.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("_ts"),
    ).filter(F.col("_ts").isNotNull())
    joined = triples.select("subj", "pred", "obj", F.col(url_col).alias("url")).join(
        ts, "url"
    )
    epoch = F.unix_timestamp("_ts").cast("long")
    return (
        joined.select("subj", "pred", "obj", "url", epoch.alias("_es"))
        .groupBy("subj", "pred", "obj")
        .agg(
            F.min("_es").alias("first_seen_epoch"),
            F.max("_es").alias("last_seen_epoch"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.countDistinct("url").cast("long").alias("n_urls"),
        )
        .withColumn(
            "span_seconds",
            (F.col("last_seen_epoch") - F.col("first_seen_epoch")).cast("long"),
        )
    )


def functional_violations(
    triples: DataFrame,
    min_subjects: int = 3,
    func_threshold_ppm: int = 800_000,
) -> DataFrame:
    """Functional-predicate violation detection — the KG consistency
    check of Knowledge-Vault-style error localization (Dong et al.
    2014): a predicate that maps almost every subject to exactly ONE
    object ("born_in", "ceo_of") is functional, and a subject holding
    several objects under it localizes extraction errors (or genuine
    temporal change) better than any global score.

    Per predicate, functionality_ppm = subjects-with-exactly-one-
    distinct-object * 1e6 div subjects (exact BIGINT). Predicates
    with >= min_subjects subjects and functionality above
    func_threshold_ppm are treated as functional; the output is their
    VIOLATING (subj, pred) pairs:

      (pred, subj, n_objs, n_subj, functionality_ppm)

    Scale design (100 TB): the per-(pred,subj) distinct-object count
    is one map-side-combinable groupBy on a key finer than the
    predicate (no hot predicate pins a reducer); the per-pred
    functionality re-aggregates THAT table (predicate-vocabulary-
    sized), and joins back as a broadcast — the fact table shuffles
    exactly once.
    """
    ps = (
        triples.select("subj", "pred", "obj")
        .groupBy("pred", "subj")
        .agg(F.countDistinct("obj").cast("long").alias("n_objs"))
    )
    func = ps.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_subj"),
        F.sum(F.when(F.col("n_objs") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_single"),
    )
    func = func.withColumn(
        "functionality_ppm",
        F.expr("n_single * 1000000 div n_subj").cast("long"),
    ).filter(
        (F.col("n_subj") >= min_subjects)
        & (F.col("functionality_ppm") >= func_threshold_ppm)
    )
    return (
        ps.filter(F.col("n_objs") >= 2)
        .join(F.broadcast(func), "pred")
        .select("pred", "subj", "n_objs", "n_subj", "functionality_ppm")
    )


def fact_snapshot_status(
    windows: DataFrame, cut_epoch: int
) -> DataFrame:
    """Snapshot diff over fact observation windows — the KG
    freshness/delta classification downstream re-crawl and
    incremental-update jobs consume: facts first observed after the
    cut are 'new' (candidate additions), facts last observed before
    it are 'stale' (candidate retractions / re-verification queue),
    facts seen on both sides are 'stable'.

    windows: fact_temporal_windows() output. Pure per-row map — zero
    shuffles on top of the windows aggregation; composing the two is
    still the single triple-grain groupBy.
    """
    return windows.withColumn(
        "status",
        F.when(F.col("first_seen_epoch") >= cut_epoch, "new")
        .when(F.col("last_seen_epoch") < cut_epoch, "stale")
        .otherwise("stable"),
    )


def entity_type_majority(
    linked: DataFrame,
    entity_col: str = "entity_id",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Majority-vote entity typing + type-consistency audit — the KG
    canonicalization QA step: after linking, every mention of one
    canonical entity should carry the same NER type; the minority
    share localizes linking/NER disagreements (the same signal
    Knowledge-Vault-style pipelines use to gate low-agreement
    entities out of the graph). The reference emits per-mention
    labels only (span_marker/modeling.py predict()); this is the
    entity-grain consolidation over its output.

    linked: one row per linked mention carrying `entity_col` and
    `label_col`. Returns one row per entity:
      (entity_id, major_label, n_major, n_mentions, minority_ppm)
    major_label = most frequent label, ties broken by label ASC
    (total deterministic order); minority_ppm = exact BIGINT
    (n_mentions - n_major) * scale div n_mentions.

    Scale design (10^11 mentions): ONE keyed shuffle — the
    (entity, label) groupBy, whose key is FINER than per-entity so a
    celebrity entity cannot pin a reducer; everything after runs on
    the (entity, label) count table, which is bounded by
    n_entities * n_labels (label vocabularies are tiny). The per-
    entity argmax window and total re-aggregation both ride that thin
    table."""
    cnt = (
        linked.filter(F.col(entity_col).isNotNull())
        .select(
            F.col(entity_col).alias("entity_id"),
            F.col(label_col).alias("_lab"),
        )
        .groupBy("entity_id", "_lab")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    w = Window.partitionBy("entity_id").orderBy(
        F.desc("_c"), F.asc("_lab")
    )
    maj = (
        cnt.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "entity_id",
            F.col("_lab").alias("major_label"),
            F.col("_c").alias("n_major"),
        )
    )
    tot = cnt.groupBy("entity_id").agg(
        F.sum("_c").cast("long").alias("n_mentions")
    )
    return maj.join(tot, "entity_id").select(
        "entity_id",
        "major_label",
        "n_major",
        "n_mentions",
        F.expr(
            f"CAST((n_mentions - n_major) * {scale} div n_mentions AS LONG)"
        ).alias("minority_ppm"),
    )
