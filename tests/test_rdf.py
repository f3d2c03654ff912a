"""N-Triples export (functions/rdf.py): python-twin encoding equality,
escape ordering, and a real-pipeline export round trip."""

from __future__ import annotations

import re
import urllib.parse

import pyspark.sql.functions as F

from spanmarkerner_spark.functions.rdf import ntriples_lines, to_ntriples

NASTY = [
    "Alice Smith",
    'quote"inside',
    "back\\slash",
    "tab\there",
    "new\nline",
    "cr\rhere",
    "ünïcødé 北京",
    "<angle> {brace} |pipe| `tick`",
    "plus+and%percent",
    "",
]


def _py_iri(s: str, base: str) -> str:
    return f"<{base}{urllib.parse.quote_plus(s).replace('+', '%20')}>"


def _py_literal(s: str) -> str:
    s = (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    return f'"{s}"'


def test_ntriples_matches_python_twin_on_nasty_strings(spark):
    rows = [(s, "knows", o) for s in NASTY for o in NASTY[:3]]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = [r["line"] for r in ntriples_lines(df).collect()]
    want = [
        f"{_py_iri(s, 'urn:kg:')} {_py_iri('knows', 'urn:rel:')} "
        f"{_py_iri(o, 'urn:kg:')} ."
        for s, _p, o in rows
    ]
    assert got == want


def test_ntriples_literal_objects_escape_in_order(spark):
    df = spark.createDataFrame(
        [(s,) for s in NASTY], "v string"
    ).select(
        to_ntriples(
            F.lit("s"), F.lit("p"), F.col("v"), obj_is_literal=True
        ).alias("line"),
        "v",
    )
    for r in df.collect():
        assert r["line"].endswith(f" {_py_literal(r['v'])} ."), r
        # no raw control characters survive in the serialized line
        assert "\n" not in r["line"] and "\t" not in r["line"]


def test_nquads_carries_provenance_graph_term(spark):
    from spanmarkerner_spark.functions.rdf import nquads_lines

    df = spark.createDataFrame(
        [("Alice Smith", "knows", "Bob", "https://ex.com/p?q=1&r=2")],
        "subj string, pred string, obj string, url string",
    )
    [r] = nquads_lines(df).collect()
    assert r["line"] == (
        f"{_py_iri('Alice Smith', 'urn:kg:')} "
        f"{_py_iri('knows', 'urn:rel:')} "
        f"{_py_iri('Bob', 'urn:kg:')} "
        f"{_py_iri('https://ex.com/p?q=1&r=2', 'urn:src:')} ."
    )


def test_ntriples_export_of_real_triples_is_parseable(spark, tmp_path):
    """Export the pipeline's triples as N-Triples text and re-parse
    every line with the grammar regex: IRIs contain no forbidden
    characters, decoding recovers the original terms exactly."""
    from spanmarkerner_spark import schemas
    from spanmarkerner_spark.datagen import gen_pages
    from spanmarkerner_spark.pipeline import run_pipeline

    pages = spark.createDataFrame(gen_pages(15, seed=3), schema=schemas.PAGES)
    # TRIPLES carries LONG entity ids (schemas.py) — the export is a
    # string surface, so serialize the ids' string rendering
    tri = run_pipeline(pages, num_partitions=4)["triples"].select(
        F.col("subj").cast("string"), "pred", F.col("obj").cast("string")
    ).cache()
    out = str(tmp_path / "nt")
    ntriples_lines(tri).write.text(out)
    lines = [
        r["value"] for r in spark.read.text(out).collect() if r["value"]
    ]
    pat = re.compile(
        r"^<urn:kg:([^<>\" {}|^`\\]*)> <urn:rel:([^<>\" {}|^`\\]*)> "
        r"<urn:kg:([^<>\" {}|^`\\]*)> \.$"
    )
    parsed = set()
    for ln in lines:
        m = pat.match(ln)
        assert m, ln
        parsed.add(
            tuple(
                urllib.parse.unquote(g)  # %20-form: unquote, not _plus
                for g in m.groups()
            )
        )
    want = {tuple(r) for r in tri.collect()}
    assert parsed == want and len(want) > 0
    tri.unpersist()
