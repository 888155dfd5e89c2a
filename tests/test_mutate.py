"""merge_entities / delete semantics vs the REFERENCE's own SQLite layer:
run the reference Database.merge_entities on a temp sqlite graph and the
Spark ops on the same rows; the resulting tables must agree row-for-row.
"""
import pytest
from pyspark.sql import functions as F

from tests._reference_oracle import load_reference


@pytest.fixture(scope="module")
def ref_db(tmp_path_factory):
    load_reference()  # stubs SDK imports + dummy key, adds reference to path
    from src.core.storage.database import Database
    from src.core.storage.models import Alias, Edge, Entity, Mention
    db = Database(str(tmp_path_factory.mktemp("ref") / "kg.db"))

    ents = {}
    for name, etype in [("ACME Corporation", "Organization"),
                        ("ACME Corp.", "Organization"),
                        ("John Smith", "Person"),
                        ("Case No. 1", "Document")]:
        e = Entity.create(type=etype, canonical_name=name, properties={},
                          confidence="confirmed")
        db.add_entity(e)
        ents[name] = e.id
    db.add_alias(Alias.create(ents["ACME Corp."], "the Acme", "extracted"))
    db.add_alias(Alias.create(ents["ACME Corporation"], "Buyer", "defined_term"))
    edges = [
        ("ACME Corp.", "party_to", "Case No. 1"),
        ("John Smith", "represents", "ACME Corp."),
        ("ACME Corporation", "opposes", "John Smith"),
        ("ACME Corp.", "affiliated_with", "ACME Corp."),  # becomes self-loop
    ]
    for s, r, t in edges:
        db.add_edge(Edge.create(source_entity_id=ents[s], target_entity_id=ents[t],
                                relation_type=r, properties={},
                                confidence="extracted", provenance_doc_id="d1"))
    db.add_mention(Mention.create(entity_id=ents["ACME Corp."], doc_id="d1",
                                  span_start=0, span_end=9,
                                  surface_text="ACME Corp",
                                  context_snippet="ACME Corp filed"))
    return db, ents


def _tables(db):
    cur = db.conn.cursor()
    nodes = [(r["id"], r["type"], r["canonical_name"], r["status"])
             for r in cur.execute(
                 "SELECT * FROM entities ORDER BY id").fetchall()]
    edges = [(r["id"], r["source_entity_id"], r["target_entity_id"],
              r["relation_type"])
             for r in cur.execute("SELECT * FROM edges ORDER BY id").fetchall()]
    aliases = sorted((r["entity_id"], r["alias_text"], r["source"])
                     for r in cur.execute("SELECT * FROM aliases").fetchall())
    mentions = sorted((r["entity_id"], r["doc_id"], r["span_start"])
                      for r in cur.execute("SELECT * FROM mentions").fetchall())
    return nodes, edges, aliases, mentions


def test_merge_matches_reference(spark, ref_db):
    from knowledgegraphsiqidis_spark.operators.mutate import merge_entities
    db, ents = ref_db
    nodes0, edges0, aliases0, mentions0 = _tables(db)

    sn = spark.createDataFrame(
        [(i, t, n, s) for i, t, n, s in nodes0],
        "id string, type string, canonical_name string, status string")
    se = spark.createDataFrame(
        edges0, "id string, src string, dst string, relation_type string")
    sa = spark.createDataFrame(
        aliases0, "entity_id string, alias_text string, source string")
    sm = spark.createDataFrame(
        mentions0, "entity_id string, doc_id string, span_start long")

    keep, lose = ents["ACME Corporation"], ents["ACME Corp."]
    db.merge_entities(keep, lose)
    got = merge_entities(sn, se, sa, sm, keep, lose)

    rn, re_, ra, rm = _tables(db)
    assert sorted((r["id"], r["type"], r["canonical_name"], r["status"])
                  for r in got["nodes"].collect()) == sorted(rn)
    assert sorted((r["id"], r["src"], r["dst"], r["relation_type"])
                  for r in got["edges"].collect()) == sorted(re_)
    assert sorted((r["entity_id"], r["alias_text"], r["source"])
                  for r in got["aliases"].collect()) == sorted(ra)
    assert sorted((r["entity_id"], r["doc_id"], r["span_start"])
                  for r in got["mentions"].collect()) == sorted(rm)
    # loser tombstoned, keeper active, self-loop edges preserved (reference
    # does NOT remove them)
    status = {r["id"]: r["status"] for r in got["nodes"].collect()}
    assert status[lose] == "tombstone" and status[keep] == "active"
    assert got["edges"].filter((F.col("src") == keep)
                               & (F.col("dst") == keep)).count() == 1


def test_delete_and_active_filter(spark):
    from knowledgegraphsiqidis_spark.operators.mutate import (
        active, delete_entities)
    nodes = spark.createDataFrame(
        [("e1", "Person", "A", "active"), ("e2", "Person", "B", "active")],
        "id string, type string, canonical_name string, status string")
    out = delete_entities(nodes, ["e2"])
    assert {r["id"]: r["status"] for r in out.collect()} == \
        {"e1": "active", "e2": "tombstone"}
    assert [r["id"] for r in active(out).collect()] == ["e1"]


def test_bulk_merge_repoints_chain_free_map(spark):
    from knowledgegraphsiqidis_spark.operators.mutate import merge_entities_bulk
    nodes = spark.createDataFrame(
        [("a", "Person", "A", "active"), ("b", "Person", "B", "active"),
         ("c", "Person", "C", "active")],
        "id string, type string, canonical_name string, status string")
    edges = spark.createDataFrame(
        [("x", "b", "c", "knows")],
        "id string, src string, dst string, relation_type string")
    mm = spark.createDataFrame([("b", "a"), ("c", "a")],
                               "lose_id string, keep_id string")
    got = merge_entities_bulk(nodes, edges, None, None, mm)
    assert got["aliases"] is None and got["mentions"] is None
    e = got["edges"].collect()[0]
    assert (e["src"], e["dst"]) == ("a", "a")
    status = {r["id"]: r["status"] for r in got["nodes"].collect()}
    assert status == {"a": "active", "b": "tombstone", "c": "tombstone"}
