"""Incremental entity-canonicalization registry (plans/entity_registry).

Contract under test: after folding alias rows in over N epochs, read-
time resolution through the merge forest equals the BATCH
canonicalization (pipeline.apply_canonicalize = connected-components
min over all alias-ambiguity edges) of the union of those epochs —
including the adversarial ordering where a late epoch's alias bridges
two components that every earlier epoch kept distinct.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from spanmarkerner_spark import schemas
from spanmarkerner_spark.datagen import alias_rows
from spanmarkerner_spark.pipeline import apply_canonicalize
from spanmarkerner_spark.plans.entity_registry import (
    registry_micro_batch,
    resolve_entities,
)


def _alias_df(spark, rows):
    return spark.createDataFrame(
        [(a, e, f"Canon{e}", 0.9) for a, e in rows], schema=schemas.ALIAS_DICT
    )


def _batch_canonical(spark, rows):
    """Ground truth: batch CC-min over the full alias set — the
    orig -> canonical mapping for every entity id in the dictionary."""
    full = _alias_df(spark, rows)
    ents = full.select("entity_id").distinct().withColumn(
        "orig", F.col("entity_id")
    )
    out = apply_canonicalize(ents, full)
    return {r["orig"]: r["entity_id"] for r in out.collect()}


def _registry_mapping(spark, reg_dir, entity_ids):
    df = spark.createDataFrame(
        [(e,) for e in entity_ids], "entity_id long"
    ).withColumn("orig", F.col("entity_id"))
    res = resolve_entities(df, reg_dir)
    return {r["orig"]: r["entity_id"] for r in res.collect()}


def test_late_epoch_bridges_prior_components(spark, tmp_path):
    """Epochs 1+2 build two separate components; epoch 3's single
    alias merges them. Registry resolution must equal batch CC over
    the union, and must route everything to the global min id."""
    reg = str(tmp_path / "reg")
    e1 = [("acme", 10), ("acme", 20)]          # {10,20}
    e2 = [("globex", 30), ("globex", 40)]      # {30,40}
    e3 = [("the firm", 20), ("the firm", 30)]  # bridge -> {10,20,30,40}
    for i, rows in enumerate([e1, e2, e3], start=1):
        registry_micro_batch(_alias_df(spark, rows), i, reg)
        got = _registry_mapping(spark, reg, [10, 20, 30, 40])
        # compare against batch over the UNION of epochs seen so far
        union = (e1 + e2 + e3)[: 2 * i]
        want = _batch_canonical(spark, union)
        for ent, root in want.items():
            assert got[ent] == root, (i, ent, got, want)
    # final state: one component rooted at the global min
    assert got == {10: 10, 20: 10, 30: 10, 40: 10}


def test_registry_equals_batch_on_datagen_dict(spark, tmp_path):
    """Split the real datagen alias dictionary into 3 hash-assigned
    epochs (so ambiguous aliases straddle epochs) and pin resolution
    == apply_canonicalize over the full dictionary for EVERY entity."""
    reg = str(tmp_path / "reg")
    rows = [(a, e) for (a, e, _c, _p) in alias_rows()]
    epochs = {i: [] for i in range(3)}
    for j, r in enumerate(rows):
        epochs[j % 3].append(r)
    for i in range(3):
        registry_micro_batch(_alias_df(spark, epochs[i]), i, reg)
    ents = sorted({e for _a, e in rows})
    got = _registry_mapping(spark, reg, ents)
    want = _batch_canonical(spark, rows)
    assert got == want
    # sanity: the dictionary is actually ambiguous enough to merge
    assert any(got[e] != e for e in ents)


def test_registry_epoch_retry_is_idempotent(spark, tmp_path):
    """Replaying an epoch (foreachBatch retry) must leave both state
    tables byte-identical: deltas are dynamic-partition overwrites
    computed from prior-epoch state only."""
    reg = str(tmp_path / "reg")
    e1 = [("acme", 10), ("acme", 20), ("x", 50)]
    e2 = [("acme", 5), ("y", 50), ("y", 60)]
    registry_micro_batch(_alias_df(spark, e1), 1, reg)
    registry_micro_batch(_alias_df(spark, e2), 2, reg)

    def snapshot():
        m = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{reg}/merges").collect()
        )
        a = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{reg}/alias_rep").collect()
        )
        return m, a

    before = snapshot()
    registry_micro_batch(_alias_df(spark, e2), 2, reg)  # retry
    assert snapshot() == before
    # epoch 2's smaller id (5) must have become the component root
    got = _registry_mapping(spark, reg, [5, 10, 20, 50, 60])
    assert got == {5: 5, 10: 5, 20: 5, 50: 50, 60: 50}


def test_stream_alias_to_registry_matches_batch(spark, tmp_path):
    """End-to-end through Structured Streaming: two alias files
    arrive as separate micro-batches (maxFilesPerTrigger=1); the
    folded registry must equal batch canonicalization of the union."""
    from spanmarkerner_spark.plans.entity_registry import (
        stream_alias_to_registry,
    )

    src = str(tmp_path / "src")
    reg = str(tmp_path / "reg")
    ckpt = str(tmp_path / "ckpt")
    f1 = [("acme", 10), ("acme", 20)]
    f2 = [("globex", 30), ("globex", 20)]
    for i, rows in enumerate([f1, f2]):
        spark.createDataFrame(rows, "alias string, entity_id long").coalesce(
            1
        ).write.parquet(src, mode="append" if i else "overwrite")
    q = stream_alias_to_registry(spark, src, reg, ckpt)
    q.awaitTermination(300)
    got = _registry_mapping(spark, reg, [10, 20, 30])
    assert got == _batch_canonical(spark, f1 + f2)
    assert got == {10: 10, 20: 10, 30: 10}


def test_resolution_is_noop_without_merges(spark, tmp_path):
    """A registry holding only unambiguous aliases produces no merge
    records and resolution is the identity."""
    reg = str(tmp_path / "reg")
    registry_micro_batch(
        _alias_df(spark, [("a", 1), ("b", 2)]), 1, reg
    )
    got = _registry_mapping(spark, reg, [1, 2, 3])
    assert got == {1: 1, 2: 2, 3: 3}


def test_registry_matches_union_find_on_random_dictionaries(spark, tmp_path):
    """Randomized invariant: for seeded random (alias, entity) sets
    split into random epochs, registry resolution equals a python
    union-find (min-root) over the full alias graph — the same
    randomized-oracle pattern as the other cross-operator invariant
    tests. Catches ordering/merge-chain bugs no hand-picked case
    would."""
    import random

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        n_alias, n_ent = 12, 25
        rows = sorted(
            {
                (f"a{rng.randrange(n_alias)}", rng.randrange(1, n_ent + 1))
                for _ in range(40)
            }
        )
        n_epochs = rng.randrange(2, 5)
        epochs = {i: [] for i in range(n_epochs)}
        for r in rows:
            epochs[rng.randrange(n_epochs)].append(r)
        reg = str(tmp_path / f"reg{seed}")
        for i in range(n_epochs):
            registry_micro_batch(_alias_df(spark, epochs[i] or []), i, reg)
        # python union-find oracle (min root) over the full alias graph
        parent = {e: e for e in range(1, n_ent + 1)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        by_alias = {}
        for a, e in rows:
            by_alias.setdefault(a, []).append(e)
        for ents in by_alias.values():
            roots = sorted({find(e) for e in ents})
            for r in roots[1:]:
                parent[r] = roots[0]
        want = {e: find(e) for e in range(1, n_ent + 1)}
        got = _registry_mapping(spark, reg, list(range(1, n_ent + 1)))
        assert got == want, (seed, got, want)


def test_registry_resolution_survives_epoch_compaction(spark, tmp_path):
    """compact_epochs (plans/compaction.py) bin-packs the registry's
    many tiny epoch deltas; the merge forest's CONTENT — and therefore
    every resolution — must be unchanged (partition values preserved,
    only file packing changes)."""
    from spanmarkerner_spark.plans.compaction import compact_epochs

    reg = str(tmp_path / "reg")
    rows = [(a, e) for (a, e, _c, _p) in alias_rows()]
    for i in range(6):  # many tiny epochs -> many small files
        registry_micro_batch(
            _alias_df(spark, rows[i::6]), i, reg
        )
    ents = sorted({e for _a, e in rows})
    before = _registry_mapping(spark, reg, ents)
    for table in ("merges", "alias_rep"):
        compact_epochs(
            spark, f"{reg}/{table}", target_mb=128, partition_col="epoch"
        )
        # bin-packing must collapse each table to <=1 file per epoch
        import glob
        per_epoch = glob.glob(f"{reg}/{table}/epoch=*/*.parquet")
        epochs = glob.glob(f"{reg}/{table}/epoch=*")
        assert len(per_epoch) <= len(epochs)
    assert _registry_mapping(spark, reg, ents) == before
    assert before == _batch_canonical(spark, rows)


def test_registry_file_lineage_survives_checkpoint_loss(spark, tmp_path):
    """The r4-hardening discipline applied to the registry: stream two
    alias files through the FILE-LINEAGE wrapper, DELETE the streaming
    checkpoint, add a bridging third file and restart — the restarted
    stream (epoch ids back at 0) must reprocess only the new file,
    never overwrite the earlier deltas, and resolution must equal
    batch canonicalization over all three files. A direct retry of the
    same pending set is also byte-idempotent."""
    import shutil

    from spanmarkerner_spark.plans.entity_registry import (
        registry_micro_batch_by_file,
        stream_alias_to_registry_lineage,
    )
    from spanmarkerner_spark.plans.lineage import with_file_key

    src = str(tmp_path / "src")
    reg = str(tmp_path / "reg")
    ckpt = str(tmp_path / "ckpt")
    f1 = [("acme", 10), ("acme", 20)]
    f2 = [("globex", 30), ("globex", 40)]
    f3 = [("bridge", 20), ("bridge", 30)]  # merges both components
    for i, rows in enumerate([f1, f2]):
        spark.createDataFrame(rows, "alias string, entity_id long").coalesce(
            1
        ).write.parquet(src, mode="append" if i else "overwrite")
    q = stream_alias_to_registry_lineage(spark, src, reg, ckpt)
    q.awaitTermination(300)
    assert _registry_mapping(spark, reg, [10, 20, 30, 40]) == {
        10: 10, 20: 10, 30: 30, 40: 30,
    }
    merges_before = sorted(
        tuple(r) for r in spark.read.parquet(f"{reg}/merges").collect()
    )
    # checkpoint LOST; third file arrives; stream restarts at epoch 0
    shutil.rmtree(ckpt)
    spark.createDataFrame(
        f3, "alias string, entity_id long"
    ).coalesce(1).write.parquet(src, mode="append")
    q2 = stream_alias_to_registry_lineage(
        spark, src, reg, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(300)
    got = _registry_mapping(spark, reg, [10, 20, 30, 40])
    assert got == _batch_canonical(spark, f1 + f2 + f3)
    assert got == {e: 10 for e in (10, 20, 30, 40)}
    # earlier deltas intact (superset, nothing overwritten)
    merges_after = sorted(
        tuple(r) for r in spark.read.parquet(f"{reg}/merges").collect()
    )
    assert set(merges_before) <= set(merges_after)
    # direct same-batch retry: pending set empty -> byte-identical state
    keyed = with_file_key(
        spark.read.parquet(src), file_path_col=F.input_file_name()
    )
    registry_micro_batch_by_file(keyed, 0, reg)
    assert (
        sorted(tuple(r) for r in spark.read.parquet(f"{reg}/merges").collect())
        == merges_after
    )


def test_compact_merge_forest_flattens_chains_and_preserves_resolution(
    spark, tmp_path
):
    """Build a deliberately deep merge chain (each epoch bridges the
    current component to a SMALLER new entity, so every epoch adds one
    merge hop: 50->40->30->20->10). compact_merge_forest must (a) keep
    the resolution mapping identical, (b) leave every surviving merge
    record pointing DIRECTLY at the final root (depth 1), and (c) keep
    the registry ingestible afterwards (a later epoch merges on top of
    the compacted forest)."""
    from spanmarkerner_spark.plans.entity_registry import (
        compact_merge_forest,
    )

    reg = str(tmp_path / "reg")
    chain = [
        [("a1", 50), ("a1", 40)],
        [("a2", 40), ("a2", 30)],
        [("a3", 30), ("a3", 20)],
        [("a4", 20), ("a4", 10)],
    ]
    for i, rows in enumerate(chain):
        registry_micro_batch(_alias_df(spark, rows), i, reg)
    ents = [10, 20, 30, 40, 50]
    before = _registry_mapping(spark, reg, ents)
    assert before == {e: 10 for e in ents}
    n = compact_merge_forest(spark, reg)
    after_rows = spark.read.parquet(f"{reg}/merges").collect()
    assert n == len(after_rows) == 4
    assert all(r["winner"] == 10 for r in after_rows)  # depth 1
    assert _registry_mapping(spark, reg, ents) == before
    # ingestion continues on the compacted forest: epoch 9 bridges
    # the settled component to an even smaller root
    registry_micro_batch(_alias_df(spark, [("a5", 10), ("a5", 5)]), 9, reg)
    assert _registry_mapping(spark, reg, ents + [5]) == {
        e: 5 for e in ents + [5]
    }


def test_registry_canonicalizes_real_pipeline_output(spark):
    """End-to-end against the REAL NER->linking output: build the
    registry from the datagen alias dictionary split into two epochs,
    resolve the pipeline's linked mentions through it, and pin
    equality with the batch canonicalize stage on every mention."""
    import tempfile

    from spanmarkerner_spark.datagen import gen_pages
    from spanmarkerner_spark.pipeline import run_pipeline

    rows = gen_pages(20, seed=11)
    pages = spark.createDataFrame(rows, schema=schemas.PAGES)
    res = run_pipeline(pages, num_partitions=4)
    linked = res["linked"].select(
        "url", "sentence_id", "word_start_index", "entity_id"
    ).cache()
    dict_rows = [(a, e) for (a, e, _c, _p) in alias_rows()]
    full = _alias_df(spark, dict_rows)
    with tempfile.TemporaryDirectory() as td:
        reg = f"{td}/reg"
        registry_micro_batch(_alias_df(spark, dict_rows[0::2]), 0, reg)
        registry_micro_batch(_alias_df(spark, dict_rows[1::2]), 1, reg)
        via_registry = {
            tuple(r) for r in resolve_entities(linked, reg).collect()
        }
    via_batch = {tuple(r) for r in apply_canonicalize(linked, full).collect()}
    assert via_registry == via_batch and len(via_batch) > 0
    linked.unpersist()
