"""Sequential reference-semantics oracle for E2E triple parity.

Replays the reference's deterministic extract→infer→resolve→store flow over
a transcript corpus, conversation by conversation in conv_id order, using the
REFERENCE's own kernels (StructuralExtractor, EntityNormalizer,
RelationshipInferrer) for every decision.  The storage layer is a minimal
in-memory stand-in for the SQLite store exposing exactly the operations the
ER loop uses, with matching semantics:

  - search_entities_by_name: substring LIKE over canonical_name + aliases,
    case-insensitive, insertion order, LIMIT (database.py:204-215)
  - _resolve_and_store_entities: find_best_match threshold 0.8; accept ≥0.9;
    accept 0.8-0.9 (vector store empty → extraction_pipeline.py:686-691);
    else create new (extraction_pipeline.py:615-733)
  - _store_relations + _find_entity_by_name fallback tiers
    (extraction_pipeline.py:773-798, 852-874)

The deterministic composition (structural parties/terms standing in as the
extracted-entity stream, per BASELINE.json north_star) is the same one the
Spark pipeline implements.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple


class _Store:
    def __init__(self):
        self.entities: List[dict] = []  # {id, type, canonical_name, aliases: [str]}

    def add(self, etype: str, name: str) -> int:
        eid = len(self.entities)
        self.entities.append({"id": eid, "type": etype,
                              "canonical_name": name, "aliases": []})
        return eid

    def add_alias(self, eid: int, alias: str) -> None:
        self.entities[eid]["aliases"].append(alias)

    def search(self, q: str, limit: int) -> List[dict]:
        ql = q.lower()
        out = []
        for e in self.entities:
            if ql in e["canonical_name"].lower() or any(
                    ql in a.lower() for a in e["aliases"]):
                out.append(e)
                if len(out) >= limit:
                    break
        return out


class _EntityView:
    """Duck-typed candidate for EntityNormalizer.find_best_match."""
    __slots__ = ("id", "type", "canonical_name")

    def __init__(self, e: dict):
        self.id = e["id"]
        self.type = e["type"]
        self.canonical_name = e["canonical_name"]


def _classify_party_type(name: str) -> str:
    return ("Organization"
            if any(c in name for c in ("Inc", "Corp", "LLC", "Ltd", "LLP"))
            else "Person")


def run_oracle(ref, conversations: List[Tuple[str, List[str]]],
               semantic_fn=None):
    """conversations: [(conv_id, [turn texts in turn_idx order])] — MUST be
    pre-sorted by conv_id.  Returns (triples set, store).

    The fact stream comes from OUR deterministic extractor (the pluggable
    semantic extractor's deterministic subset — the reference's own facts
    are LLM output); everything DOWNSTREAM of the stream (fact→edge rules,
    Fact entity storage, about-edge name resolution) runs through the
    REFERENCE's kernels/semantics: RelationshipInferrer fact rules and
    _store_facts (extraction_pipeline.py:800-850).

    ``semantic_fn(ref, conv_id, doc, entities, facts) -> (entities,
    relations, facts)`` models an LLM-SHAPED semantic extractor on top of
    the deterministic streams: it may append entities with arbitrary
    properties, emit DIRECT relations (the extended vocabulary,
    semantic_extractor.py:94 — these seed infer_relationships'
    existing_pairs and are stored alongside the inferred ones,
    extraction_pipeline.py:773-798), and rewrite the fact list (e.g.
    non-conversation-local related names).  Default None = the
    deterministic subset with no direct relations.
    """
    from knowledgegraphsiqidis_spark.functions import textops as _textops

    extractor = ref.StructuralExtractor()
    EN = ref.EntityNormalizer
    store = _Store()
    triples: set = set()

    for conv_id, texts in conversations:
        doc = "\n".join(texts)
        structural = extractor.extract(doc)
        facts = [ref.ExtractedFact(fact_type=f["fact_type"], text=f["text"],
                                   related_entities=list(f["related"]),
                                   properties={}, confidence=0.8)
                 for f in _textops.extract_facts(doc)]

        entities = [
            ref.ExtractedEntity(
                name=p.name, type=_classify_party_type(p.name),
                properties={"role": p.role, "source": "structural"},
                span_text=p.name, confidence=1.0)
            for p in structural.parties
        ] + [
            ref.ExtractedEntity(
                name=t.term, type="Reference",
                properties={"definition": t.definition, "source": "structural"},
                span_text=t.term, confidence=1.0)
            for t in structural.defined_terms
        ] + [
            # role-property persons (deterministic stand-in for LLM-produced
            # entity properties): client hint for attorney roles, company
            # hint for executive roles — the exact property keys the
            # reference's rules 3/5 read (semantic_extractor.py:636-664)
            ref.ExtractedEntity(
                name=p["name"], type="Person",
                properties={"role": p["role"],
                            ("client" if p["role"] in _textops.ATTORNEY_ROLES
                             else "company"): p["hint"]},
                span_text=p["name"], confidence=1.0)
            for p in _textops.extract_entity_props(doc)
        ]

        direct: list = []
        if semantic_fn is not None:
            entities, direct, facts = semantic_fn(ref, conv_id, doc,
                                                  entities, facts)
        # the reference stores the direct relations plus what the inferrer
        # adds; existing_pairs is seeded from the direct list, suppressing
        # inferred duplicates (semantic_extractor.py:604)
        relations = list(direct) + ref.RelationshipInferrer.infer_relationships(
            entities, list(direct), facts)

        # --- _resolve_and_store_entities (vector store empty) ---
        entity_map: Dict[str, int] = {}
        for ent in entities:
            if not ent.name or len(ent.name) < 2:
                continue
            ent_type = EN.validate_entity_type(ent.name, ent.type)
            normalized = EN.normalize_name(ent.name, ent_type)
            existing = store.search(ent.name, limit=10)
            if normalized != ent.name:
                for nm in store.search(normalized, limit=5):
                    if nm not in existing:
                        existing.append(nm)
            if existing:
                views = [_EntityView(e) for e in existing]
                best, score = EN.find_best_match(ent.name, views, ent_type,
                                                 threshold=0.8)
                if best is not None and score >= 0.8:
                    entity_map[ent.name] = best.id
                    if ent.name.lower() != best.canonical_name.lower():
                        store.add_alias(best.id, ent.name)
                    continue
            entity_map[ent.name] = store.add(ent_type, ent.name)

        # --- _store_relations + _find_entity_by_name ---
        def find_by_name(name: str) -> Optional[int]:
            if name in entity_map:
                return entity_map[name]
            nl = name.lower()
            for k, v in entity_map.items():
                if k.lower() == nl:
                    return v
            for k, v in entity_map.items():
                if nl in k.lower() or k.lower() in nl:
                    return v
            hits = store.search(name, limit=1)
            return hits[0]["id"] if hits else None

        for rel in relations:
            sid = entity_map.get(rel.source_name)
            tid = entity_map.get(rel.target_name)
            if sid is None or tid is None:
                sid = find_by_name(rel.source_name)
                tid = find_by_name(rel.target_name)
            if sid is not None and tid is not None:
                triples.add((store.entities[sid]["canonical_name"],
                             rel.relation_type,
                             store.entities[tid]["canonical_name"]))

        # --- _store_facts (extraction_pipeline.py:800-850): Fact entities
        # enter the SAME store (they become search candidates for later
        # conversations, like the reference's entities table), and each
        # resolvable related name gets an `about` edge.
        for fact in facts:
            fact_name = f"{fact.fact_type}: {fact.text[:50]}..."
            fid = store.add("Fact", fact_name)
            assert fid is not None
            for name in fact.related_entities:
                eid = entity_map.get(name)
                if eid is None:
                    eid = find_by_name(name)
                if eid is not None:
                    triples.add((fact_name, "about",
                                 store.entities[eid]["canonical_name"]))

    return triples, store
