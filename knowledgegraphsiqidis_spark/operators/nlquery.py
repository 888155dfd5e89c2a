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

from pyspark.sql import DataFrame, Window, functions as F

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


def _active(nodes: DataFrame) -> DataFrame:
    """status='active' with a column-presence guard: every reference store
    read is active-only (database.py:191-215), but a status-less nodes
    frame is explicitly supported — one guard shared by execute_query and
    ALL N6 helpers so the exploration fallback can never raise on a frame
    the direct path accepted (ADVICE r5)."""
    return (nodes.filter(F.col("status") == "active")
            if "status" in nodes.columns else nodes)


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
        out = _active(nodes).filter(F.col("type") == "Fact")
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
    # every reference store read is status='active' (database.py:191-215) —
    # tombstoned entities (P9) never surface through the query engine
    out = _active(nodes)
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


# ---------------------------------------------------------------------------
# N6 — schema-aware exploration fallback (nl_query.py:1192-1304).
#
# When a direct query returns nothing, the reference asks the LLM for up to
# three alternative search strategies over a live schema summary
# (SCHEMA_EXPLORATION_PROMPT, nl_query.py:178-201), executes each against
# the store, and unions + id-dedups the results; a strategy-generation
# failure falls back to sampling four common entity types
# (nl_query.py:1283-1287).  Here the strategy EXECUTOR is complete and
# DataFrame-native; strategy GENERATION is a pluggable ``strategy_fn(query,
# schema) -> list[dict]`` seam (the same seam pattern as the pipeline's
# ``extract_fn``) whose deterministic default derives strategies from the
# keyword router's decision table — an LLM caller can be dropped in without
# touching the executor.  Per-branch LIMITs mirror the reference's bounded
# store reads (20/type, 10/keyword, 200 edges, 50 facts) with an explicit
# ``orderBy(id)`` standing in for SQLite's implicit scan order so results
# are deterministic under any partitioning.

_N6_COMMON_TYPES = ('Date', 'Money', 'Organization', 'Person')  # :1285
_N6_SAMPLE_TYPES = ('Organization', 'Person', 'Document')       # :249
_N6_MAX_STRATEGIES = 3                                          # :1225
SCHEMA_CACHE_REFRESH_INTERVAL = 50                              # :45-48


def graph_schema(nodes: DataFrame, edges: DataFrame) -> str:
    """Live schema summary string (``_get_live_schema``, nl_query.py:218-260):
    entity-type counts desc, top-30 relation types desc, 5 sample names for
    key types, totals.  Driver-side by nature — the string feeds a prompt —
    but built from three bounded aggregations, never a full collect."""
    active = _active(nodes)
    etypes = sorted(((r["type"], r["n"]) for r in
                     active.groupBy("type").agg(F.count("*").alias("n"))
                     .collect()), key=lambda x: (-x[1], x[0]))
    rtypes = sorted(((r["relation_type"], r["n"]) for r in
                     edges.groupBy("relation_type").agg(F.count("*").alias("n"))
                     .collect()), key=lambda x: (-x[1], x[0]))[:30]
    parts = ["ENTITY TYPES:"]
    parts += [f"  - {t}: {n} entities" for t, n in etypes]
    parts.append("\nRELATIONSHIP TYPES:")
    parts += [f"  - {t}: {n} edges" for t, n in rtypes]
    parts.append("\nKEY ENTITIES (samples):")
    samples = (active.filter(F.col("type").isin(*_N6_SAMPLE_TYPES))
               .withColumn("_rn", F.row_number().over(
                   Window.partitionBy("type").orderBy("id")))
               .filter(F.col("_rn") <= 5)
               .select("type", "canonical_name").collect())
    by_type: Dict[str, list] = {}
    for r in samples:
        by_type.setdefault(r["type"], []).append(r["canonical_name"])
    for t in _N6_SAMPLE_TYPES:
        if by_type.get(t):
            parts.append(f"  {t}s: {', '.join(by_type[t])}")
    n_e = sum(n for _, n in etypes)
    n_r = edges.count()
    parts.append(f"\nTOTALS: {n_e} entities, {n_r} relationships")
    return "\n".join(parts)


class SchemaCache:
    """Schema string cached across queries, refreshed every
    ``SCHEMA_CACHE_REFRESH_INTERVAL`` calls (nl_query.py:45-48, :220-226)."""

    def __init__(self, interval: int = SCHEMA_CACHE_REFRESH_INTERVAL):
        self._interval, self._count, self._cached = interval, 0, None

    def get(self, nodes: DataFrame, edges: DataFrame,
            force_refresh: bool = False) -> str:
        self._count += 1
        if (self._cached is None or force_refresh
                or self._count >= self._interval):
            self._count = 0
            self._cached = graph_schema(nodes, edges)
        return self._cached


def default_strategies(query: str, schema: str = "") -> list:
    """Deterministic strategy generator: the router's decision table plays
    the role of the reference prompt's worked examples ("key dates" → Date
    entities, "obligations" → fact_type=obligation facts, ...)."""
    interp = interpret_query(query)
    mentions = interp.get("entities_mentioned", [])
    etypes = interp.get("entity_types_requested") or []
    out = []
    if etypes:
        out.append({"strategy_type": "type_search", "entity_types": etypes,
                    "reasoning": "router-mapped entity types"})
    if mentions:
        out.append({"strategy_type": "keyword_search", "keywords": mentions,
                    "reasoning": "quoted/capitalized mentions as keywords"})
    if interp["query_type"] == "fact_search" or interp.get("filters"):
        out.append({"strategy_type": "fact_search", "keywords": mentions,
                    "reasoning": "fact-shaped query"})
    if interp["query_type"] == "relationship_query":
        out.append({"strategy_type": "relationship_search",
                    "relation_types": [], "reasoning": "relationship query"})
    if not out:
        out.append({"strategy_type": "type_search",
                    "entity_types": list(_N6_COMMON_TYPES),
                    "reasoning": "no router signal; sample common types"})
    return out[:_N6_MAX_STRATEGIES]


def _n6_by_type(nodes: DataFrame, etype: str, n: int) -> DataFrame:
    # get_entities_by_type (database.py:191-196): active only, LIMIT n
    return (_active(nodes).filter(F.col("type") == etype)
            .orderBy("id").limit(n))


def _n6_by_name(nodes: DataFrame, aliases, kw: str, n: int) -> DataFrame:
    # search_entities_by_name (database.py:204-215): canonical OR alias
    # LIKE, active, LIMIT n
    pat = kw.lower()
    active = _active(nodes)
    hit = active.filter(F.lower("canonical_name").contains(pat))
    if aliases is not None:
        via = (aliases.filter(F.lower("alias_text").contains(pat))
               .select(F.col("entity_id").alias("id")).distinct())
        hit = (hit.unionByName(active.join(via, "id"))
               .dropDuplicates(["id"]))
    return hit.orderBy("id").limit(n)


def _n6_by_embedding(nodes: DataFrame, kw: str, k: int = 5,
                     thresh: float = 0.4) -> DataFrame:
    """Semantic branch of keyword_search (nl_query.py:1238-1249): embed the
    keyword, k=5 nearest entity embeddings, keep score > 0.4 (the lowered
    exploration threshold).  Entity side READS the persisted ``embedding``
    nodes column when present (materialize.with_node_embeddings — the
    reference reads its stored per-entity vectors, never re-embeds the
    store per query); only a frame built without the column falls back to
    embedding ``f"{name} {type}"`` on the fly.  The query embeds the bare
    keyword (generate_query_embedding)."""
    from ..functions import embedding as emb
    from . import similarity
    spark = nodes.sparkSession
    base = _active(nodes)
    if "embedding" not in base.columns:
        from .resolve import _embed_udf
        base = base.withColumn(
            "embedding",
            _embed_udf(F.concat_ws(" ", "canonical_name", "type")))
    qdf = spark.createDataFrame(
        [("__q__", emb.hash_embedding(kw).tolist())],
        "query_id string, query_vec array<double>")
    top = (similarity.cosine_topk(base, qdf, k=k, id_col="id",
                                  vec_col="embedding")
           .filter(F.col("cosine") > thresh)
           .select(F.col("vec_id").alias("id")))
    return nodes.join(top, "id").select(*nodes.columns)


def _n6_facts(nodes: DataFrame, keywords: list):
    """fact_search strategy (nl_query.py:1266-1281): first 50 ACTIVE Fact
    entities (the reference reads via get_entities_by_type, active-only —
    a tombstoned fact must neither surface nor displace an active one
    inside the LIMIT-50 window; ADVICE r5); keep those whose text contains
    any keyword (all when no keywords); emit both the fact rows and the
    fact entities."""
    facts = (_active(nodes).filter(F.col("type") == "Fact")
             .orderBy("id").limit(50))
    txt = (F.coalesce(F.col("properties")["full_text"],
                      F.col("canonical_name"))
           if "properties" in nodes.columns else F.col("canonical_name"))
    ftype = (F.coalesce(F.col("properties")["fact_type"], F.lit("fact"))
             if "properties" in nodes.columns else F.lit("fact"))
    if keywords:
        cond = F.lit(False)
        for kw in keywords:
            cond = cond | F.lower(txt).contains(kw.lower())
        facts = facts.filter(cond)
    rows = facts.select(ftype.alias("fact_type"), txt.alias("text"),
                        F.col("canonical_name").alias("entity_name"))
    return rows, facts


def explore_with_schema(query: str, nodes: DataFrame, edges: DataFrame,
                        aliases: DataFrame | None = None,
                        strategy_fn=None, schema: str | None = None,
                        schema_cache: "SchemaCache | None" = None) -> Dict[str, DataFrame]:
    """N6 executor: run up to three strategies, union + id-dedup
    (nl_query.py:1192-1304).  Returns ``{"entities", "edges", "facts"}``
    DataFrames (facts: fact_type/text/entity_name).  A ``strategy_fn``
    exception triggers the reference's common-types fallback
    (:1283-1287)."""
    if schema is None:
        schema = (schema_cache.get(nodes, edges) if schema_cache is not None
                  else graph_schema(nodes, edges))
    ent_frames, edge_frames, fact_frames = [], [], []
    try:
        gen = strategy_fn if strategy_fn is not None else default_strategies
        for st in list(gen(query, schema))[:_N6_MAX_STRATEGIES]:
            stype = st.get("strategy_type", "")
            if stype == "type_search":
                for t in st.get("entity_types", []):
                    ent_frames.append(_n6_by_type(nodes, t, 20))
            elif stype == "keyword_search":
                for kw in st.get("keywords", []):
                    ent_frames.append(_n6_by_name(nodes, aliases, kw, 10))
                    ent_frames.append(_n6_by_embedding(nodes, kw))
            elif stype == "relationship_search":
                rts = st.get("relation_types", [])
                if not rts:
                    continue
                # get_all_edges(limit=200) THEN the type filter — the
                # reference filters the bounded read, not the full table
                sel = (edges.orderBy("id").limit(200)
                       .filter(F.col("relation_type").isin(*rts)))
                edge_frames.append(sel)
                ids = (sel.select(F.col("src").alias("id"))
                       .unionByName(sel.select(F.col("dst").alias("id")))
                       .distinct())
                ent_frames.append(nodes.join(ids, "id").select(*nodes.columns))
            elif stype == "fact_search":
                rows, fents = _n6_facts(nodes, st.get("keywords", []))
                fact_frames.append(rows)
                ent_frames.append(fents)
    except Exception:
        ent_frames = [_n6_by_type(nodes, t, 10) for t in _N6_COMMON_TYPES]
        edge_frames, fact_frames = [], []

    def _union(frames, empty):
        if not frames:
            return empty.limit(0)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    spark = nodes.sparkSession
    empty_facts = spark.createDataFrame(
        [], "fact_type string, text string, entity_name string")
    return {
        "entities": _union(ent_frames, nodes).dropDuplicates(["id"]),
        "edges": _union(edge_frames, edges).dropDuplicates(["id"]),
        "facts": _union(fact_frames, empty_facts).dropDuplicates(),
    }


def query_with_exploration(question: str, nodes: DataFrame, edges: DataFrame,
                           aliases: DataFrame | None = None,
                           extractions: DataFrame | None = None,
                           strategy_fn=None,
                           schema_cache: "SchemaCache | None" = None) -> Dict[str, Any]:
    """N1 + N6 combined entry: dispatch the direct query; when it yields
    zero rows the reference falls through to schema-aware exploration
    (nl_query.py:941-943).  Returns ``{"direct", "explored"}`` plus — on
    the fallback path — the exploration's entities/edges/facts frames.
    The emptiness probe is one bounded action (``isEmpty`` = limit-1
    scan), paid only at this interactive surface."""
    direct = query(question, nodes, edges, extractions)
    if not direct.isEmpty():
        return {"direct": direct, "explored": False}
    out: Dict[str, Any] = explore_with_schema(
        question, nodes, edges, aliases=aliases, strategy_fn=strategy_fn,
        schema_cache=schema_cache)
    out["direct"] = direct
    out["explored"] = True
    return out
