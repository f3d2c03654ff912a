"""RDF N-Triples serialization for the KG triple tables — codegen only.

The interop sink a knowledge-graph engine actually needs: emitted
(subj, pred, obj) rows rendered as W3C N-Triples lines so any triple
store (Jena, Virtuoso, Blazegraph, rdflib) can bulk-load the output.
The reference stops at per-document entity predictions
(span_marker/modeling.py predict()); this is the KG-side export of the
materialized graph.

Everything is JVM expressions (url_encode / regexp_replace / concat) —
zero Python UDFs, so serialization rides whole-stage codegen and an
export of 10^12 triples is a map-only stage writable straight to text
files, one shuffle-free pass.

Encoding contract (pinned against a python twin in tests):
- entity/predicate terms become IRIs under a caller-chosen base
  (default urn:kg: / urn:rel:), with percent-encoding equal to
  python's urllib.parse.quote_plus followed by '+' -> '%20' (spaces
  are %20 in IRIs; Spark's url_encode is the quote_plus twin, checked
  in the tests) — covers every character N-Triples forbids in IRIs
  (space, quotes, <, >, backslash, braces, non-ASCII);
- literal objects are double-quoted with the five N-Triples escapes
  (backslash first, then quote, newline, CR, tab).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _iri(col, base: str) -> Column:
    enc = F.regexp_replace(F.url_encode(col), r"\+", "%20")
    return F.concat(F.lit("<" + base), enc, F.lit(">"))


def escape_literal(col) -> Column:
    """N-Triples string-literal body: \\ " \\n \\r \\t escaped (the
    backslash pass MUST run first)."""
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    return F.regexp_replace(c, "\t", r"\\t")


def _terms(
    subj,
    pred,
    obj,
    ent_base: str = "urn:kg:",
    rel_base: str = "urn:rel:",
    obj_is_literal: bool = False,
) -> list[Column]:
    o = (
        F.concat(F.lit('"'), escape_literal(obj), F.lit('"'))
        if obj_is_literal
        else _iri(obj, ent_base)
    )
    return [_iri(subj, ent_base), _iri(pred, rel_base), o]


def to_ntriples(
    subj,
    pred,
    obj,
    ent_base: str = "urn:kg:",
    rel_base: str = "urn:rel:",
    obj_is_literal: bool = False,
) -> Column:
    """One N-Triples line per row: '<s> <p> <o> .' (entity object) or
    '<s> <p> "o" .' (literal object, e.g. attribute values)."""
    return F.concat_ws(
        " ", *_terms(subj, pred, obj, ent_base, rel_base, obj_is_literal),
        F.lit(".")
    )


def ntriples_lines(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    **kw,
) -> DataFrame:
    """(line string) — feed to df.write.text(...) for a bulk-loadable
    N-Triples export; map-only, partitioning preserved."""
    return triples.select(
        to_ntriples(F.col(subj), F.col(pred), F.col(obj), **kw).alias("line")
    )


def nquads_lines(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    graph: str = "url",
    graph_base: str = "urn:src:",
    **kw,
) -> DataFrame:
    """N-Quads: N-Triples plus a fourth graph/context IRI per line —
    the provenance form (which page asserted this fact), matching the
    triple table's url column. Same codegen-only contract."""
    terms = _terms(F.col(subj), F.col(pred), F.col(obj), **kw)
    return triples.select(
        F.concat_ws(
            " ", *terms, _iri(F.col(graph), graph_base), F.lit(".")
        ).alias("line")
    )
