"""Deterministic natural-language query surface (SURVEY.md §2.9).

The reference's NL engine is LLM-driven with a deterministic keyword
fallback router (nl_query.py:629-697) and a dispatch executor
(nl_query.py:699-945).  The LLM layers (N2/N6/N7/N9/N10) are out of
correctness scope; this module reproduces the deterministic spine:

  interpret_query ... exact port of the keyword fallback router's decision
                      table (query_type, entity_types_requested, filters,
                      quoted + capitalized entity mentions)
  execute_query ..... dispatches on query_type to the DataFrame operators
                      (entity search → P2/P4; relationship → J2 denorm;
                      path_finding → G8; aggregation → A1; timeline → G19;
                      overview → W1 top-k)
  entity_summary .... N8's markdown card from nodes/edges/aliases

Everything returns DataFrames; formatting to text happens only in
``entity_summary`` (driver-side, single entity).
"""
from __future__ import annotations

import re
from typing import Any, Dict

from pyspark.sql import DataFrame, functions as F

from . import analytics

_TYPE_RULES = [
    # (trigger words, query_type, entity_types, filters)
    (('relationship', 'related', 'connected', 'between'),
     'relationship_query', [], {}),
    (('obligation', 'deadline', 'must', 'shall'), 'fact_search', [], {}),
    (('path', 'connection', 'link'), 'path_finding', [], {}),
    (('how many', 'count', 'all'), 'aggregation', [], {}),
    (('parties', 'party', 'plaintiff', 'defendant', 'claimant', 'respondent'),
     'entity_search', ['Organization', 'Person'], {}),
    (('person', 'people', 'who', 'witness', 'witnesses'),
     'entity_search', ['Person'], {}),
    (('company', 'companies', 'organization', 'corporation'),
     'entity_search', ['Organization'], {}),
    (('allegation', 'allegations', 'claim', 'claims', 'allege'),
     'fact_search', [], {'fact_type': 'allegation'}),
    (('date', 'dates', 'when', 'timeline', 'chronolog', 'time'),
     'entity_search', ['Date'], {}),
    (('money', 'amount', 'dollar', 'payment', 'sum', 'damages', 'cost',
      'price', 'value'), 'entity_search', ['Money'], {}),
    (('location', 'where', 'place', 'address', 'city', 'state', 'country'),
     'entity_search', ['Location'], {}),
    (('document', 'contract', 'agreement', 'exhibit', 'filing', 'motion'),
     'entity_search', ['Document'], {}),
    (('fact', 'facts', 'information', 'detail', 'details'),
     'fact_search', [], {}),
    (('dispute', 'case', 'lawsuit', 'litigation', 'matter', 'summary',
      'summarize', 'overview', 'about'),
     'overview', ['Organization', 'Person', 'Fact'], {}),
]

_CAP_STOP = {'who', 'what', 'where', 'when', 'how', 'why', 'the'}


def interpret_query(query: str) -> Dict[str, Any]:
    """Keyword router — decision table and mention extraction match the
    reference fallback exactly (nl_query.py:629-697)."""
    low = query.lower()
    interp: Dict[str, Any] = {
        "query_type": "entity_search", "entities_mentioned": [],
        "relation_types": [], "filters": {}, "graph_operations": [],
        "entity_types_requested": [],
    }
    for words, qtype, etypes, filters in _TYPE_RULES:
        if any(w in low for w in words):
            interp["query_type"] = qtype
            interp["entity_types_requested"] = list(etypes)
            interp["filters"] = dict(filters)
            break
    quoted = re.findall(r'"([^"]+)"', query)
    interp["entities_mentioned"] = list(quoted)
    for cap in re.findall(r'\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\b', query):
        if cap not in interp["entities_mentioned"] and cap.lower() not in _CAP_STOP:
            interp["entities_mentioned"].append(cap)
    return interp


def execute_query(interp: Dict[str, Any], nodes: DataFrame, edges: DataFrame,
                  extractions: DataFrame | None = None,
                  limit: int = 25) -> DataFrame:
    """Dispatch an interpretation to the graph operators (N5 analogue)."""
    qtype = interp["query_type"]
    mentions = [m.lower() for m in interp.get("entities_mentioned", [])]
    etypes = interp.get("entity_types_requested") or []

    def name_match(col):
        cond = F.lit(False)
        for m in mentions:
            cond = cond | F.lower(col).contains(m)
        return cond

    if qtype == "aggregation":
        return analytics.graph_stats(nodes, edges)

    if qtype == "relationship_query":
        tri = (edges
               .join(nodes.select(F.col("id").alias("src"),
                                  F.col("canonical_name").alias("subj")), "src")
               .join(nodes.select(F.col("id").alias("dst"),
                                  F.col("canonical_name").alias("obj")), "dst")
               .select("subj", F.col("relation_type").alias("pred"), "obj"))
        if mentions:
            tri = tri.filter(name_match(F.col("subj"))
                             | name_match(F.col("obj")))
        return tri.limit(limit)

    if qtype == "path_finding" and len(mentions) >= 2:
        a = nodes.filter(F.lower("canonical_name").contains(mentions[0])) \
            .select("id").limit(1)
        hops = analytics.n_hop_neighborhood(edges, a, hops=4)
        targets = nodes.filter(F.lower("canonical_name").contains(mentions[1])) \
            .select("id")
        return hops.join(targets, "id").select("id", "hop")

    if qtype == "overview":
        return analytics.top_connected(nodes, edges, k=limit)

    if qtype == "fact_search":
        out = nodes.filter(F.col("type") == "Fact")
        ft = interp.get("filters", {}).get("fact_type")
        if ft:
            out = out.filter(F.col("properties")["fact_type"] == ft) \
                if "properties" in out.columns else out
        if mentions:
            out = out.filter(name_match(F.col("canonical_name")))
        return out.select("id", "canonical_name", "type").limit(limit)

    # entity_search (default); zero-result mention filters fall back to the
    # bare type search (the reference's schema-exploration fallback shape,
    # nl_query.py:1192-1304, deterministic subset).  The fallback is decided
    # INSIDE the plan — a broadcast 1-row any-match aggregate — so the whole
    # entity query is one Spark action (the earlier limit(1).count() probe
    # was a second action, doubling interactive latency).
    out = nodes
    if etypes:
        out = out.filter(F.col("type").isin(*etypes))
    if mentions:
        flagged = out.withColumn("_m", name_match(F.col("canonical_name")))
        any_m = flagged.agg(F.max("_m").alias("_any"))
        out = (flagged.crossJoin(F.broadcast(any_m))
               .filter(F.col("_m") | ~F.col("_any"))
               .drop("_m", "_any"))
    return out.select("id", "canonical_name", "type").limit(limit)


def query(question: str, nodes: DataFrame, edges: DataFrame,
          extractions: DataFrame | None = None) -> DataFrame:
    """N1 entry: interpret then execute."""
    return execute_query(interpret_query(question), nodes, edges, extractions)


# F7 — disambiguation match-scoring tiers (nl_query.py:298-349): exact 1.0 >
# suffix-normalized 0.95 > acronym 0.9 > alias-exact 0.85 > substring
# coverage (0.7/0.6-weighted) vs word overlap (0.5-weighted) max'd with
# alias containment 0.6.  Pure function usable from pandas UDFs and tests.
_F7_SUFFIXES = (' inc', ' inc.', ' llc', ' ltd', ' ltd.', ' corp', ' corp.',
                ' corporation', ' aerospace', ' group', ' company', ' co.')


def entity_match_score(query: str, canonical_name: str,
                       aliases: list | None = None) -> float:
    """How well an entity matches a disambiguation query (F7 tiers)."""
    query_lower = query.lower()
    entity_name = canonical_name.lower()
    if query_lower == entity_name:
        return 1.0

    def norm(s: str) -> str:
        s = s.lower()
        for suf in _F7_SUFFIXES:
            s = s.replace(suf, '')
        return s.strip()

    if norm(query_lower) == norm(entity_name):
        return 0.95
    if len(query_lower) <= 10 and query_lower.isupper():
        acronym = ''.join(w[0].upper() for w in entity_name.split() if w)
        if query_lower.upper() == acronym:
            return 0.9
    score = 0.0
    if query_lower in entity_name:
        score = len(query_lower) / len(entity_name) * 0.7
    elif entity_name in query_lower:
        score = len(entity_name) / len(query_lower) * 0.6
    qw, ew = set(query_lower.split()), set(entity_name.split())
    overlap = len(qw & ew)
    if overlap > 0:
        score = max(score, overlap / max(len(qw), len(ew)) * 0.5)
    for alias in (aliases or []):
        al = alias.lower()
        if query_lower == al:
            score = max(score, 0.85)
        elif query_lower in al or al in query_lower:
            score = max(score, 0.6)
    return score


def disambiguate(query: str, nodes: DataFrame, aliases: DataFrame,
                 k: int = 10) -> DataFrame:
    """Rank candidate entities for a query mention by the F7 tiers —
    candidate generation by containment (P4 shape), scoring via a
    vectorized pandas UDF over the bounded candidate set."""
    import pandas as pd
    from pyspark.sql import types as T

    q = query.lower()

    # no parameter annotations: the module's postponed annotations + the
    # function-local pandas import would leave pyspark unable to resolve the
    # 'pd.Series' hint strings
    @F.pandas_udf(T.DoubleType())
    def _score(name, als):
        return pd.Series([entity_match_score(q, n, list(a) if a is not None
                                             else []) for n, a in
                          zip(name, als)], dtype="float64")

    al = (aliases.groupBy(F.col("entity_id").alias("id"))
          .agg(F.collect_list("alias_text").alias("als")))
    cand = (nodes
            .join(al, "id", "left")
            .filter(F.lower("canonical_name").contains(q)
                    | F.lit(q).contains(F.lower("canonical_name"))
                    | F.exists(F.coalesce("als", F.array()),
                               lambda a: F.lower(a).contains(q)
                               | F.lit(q).contains(F.lower(a)))))
    return (cand.withColumn("match_score",
                            F.round(_score("canonical_name", "als"), 6))
            .select("id", "canonical_name", "type", "match_score")
            .orderBy(F.desc("match_score"), F.asc("id")).limit(k))


# N11 — canned query templates (server.py:1327-1378): the reference ships 10
# fixed lawyer questions routed through the same query engine; each maps to a
# deterministic dispatch here.
QUERY_TEMPLATES = {
    "parties": "Who are the main parties involved in this case?",
    "claims": "What claims or allegations are being made in this case?",
    "damages": "What damages or monetary relief is being sought?",
    "timeline": "What is the timeline of key events in this case?",
    "experts": "Who are the expert witnesses and what are their opinions?",
    "contracts": "What contracts or agreements are at issue?",
    "witnesses": "Who are the key witnesses in this case?",
    "evidence": "What are the key pieces of evidence in this case?",
    "relationships": "How are the parties related to each other?",
    "obligations": "What are the key contractual obligations at issue?",
}


def canned_query(key: str, nodes: DataFrame, edges: DataFrame,
                 extractions: DataFrame | None = None) -> DataFrame:
    """Run one of the reference's canned templates (N11) through the
    deterministic router + executor."""
    return query(QUERY_TEMPLATES[key], nodes, edges, extractions)


def entity_summary(entity_id: str, nodes: DataFrame, edges: DataFrame,
                   aliases: DataFrame) -> str:
    """Markdown entity card (N8, nl_query.py:1384-1431 shape)."""
    ent = nodes.filter(F.col("id") == entity_id).collect()
    if not ent:
        return f"No entity with id {entity_id}"
    ent = ent[0]
    als = [r["alias_text"] for r in
           aliases.filter(F.col("entity_id") == entity_id).collect()]
    out_edges = (edges.filter(F.col("src") == entity_id)
                 .join(nodes.select(F.col("id").alias("dst"),
                                    F.col("canonical_name").alias("target")), "dst")
                 .select("relation_type", "target").limit(20).collect())
    in_edges = (edges.filter(F.col("dst") == entity_id)
                .join(nodes.select(F.col("id").alias("src"),
                                   F.col("canonical_name").alias("source")), "src")
                .select("relation_type", "source").limit(20).collect())
    lines = [f"# {ent['canonical_name']}",
             f"- **type**: {ent['type']}",
             f"- **aliases**: {', '.join(als) if als else '(none)'}",
             "## Relationships"]
    for e in out_edges:
        lines.append(f"- {ent['canonical_name']} —{e['relation_type']}→ {e['target']}")
    for e in in_edges:
        lines.append(f"- {e['source']} —{e['relation_type']}→ {ent['canonical_name']}")
    return "\n".join(lines)
