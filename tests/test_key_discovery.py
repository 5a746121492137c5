"""Declared-key discovery (`SOURCE v` short form) and multi-catalog graphs.

Reference analog: FK-constraint auto-discovery in
create_property_graph.cpp:117-153 (test create_pg_with_pk_fk.test).  Spark
tables carry no enforced constraints, so the metadata source is table
properties: 'duckpgq.key' on the vertex table, 'duckpgq.fk.<col>' on the
edge table.
"""

import pytest

from duckpgq_extension_spark import PGQSession
from duckpgq_extension_spark.errors import PGQBinderError

from .conftest import rows


@pytest.fixture(scope="module")
def meta_tables(spark):
    spark.sql("DROP TABLE IF EXISTS kd_v")
    spark.sql("DROP TABLE IF EXISTS kd_e")
    spark.sql("DROP TABLE IF EXISTS kd_e2")
    spark.sql(
        "CREATE TABLE kd_v (id BIGINT, name STRING) USING parquet "
        "TBLPROPERTIES ('duckpgq.key' = 'id')"
    )
    spark.sql("INSERT INTO kd_v VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    # one FK to kd_v per endpoint column, like REFERENCES constraints
    spark.sql(
        "CREATE TABLE kd_e (src BIGINT, dst BIGINT) USING parquet "
        "TBLPROPERTIES ('duckpgq.fk.src' = 'kd_v(id)', "
        "'duckpgq.fk.dst' = 'kd_v(id)')"
    )
    spark.sql("INSERT INTO kd_e VALUES (1, 2), (2, 3)")
    # a single declared FK: the unambiguous discovery case
    spark.sql(
        "CREATE TABLE kd_e2 (src BIGINT, other BIGINT) USING parquet "
        "TBLPROPERTIES ('duckpgq.fk.src' = 'kd_v')"
    )
    spark.sql("INSERT INTO kd_e2 VALUES (1, 10), (3, 30)")
    yield
    for t in ("kd_v", "kd_e", "kd_e2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_discovery_ambiguous_raises_reference_error(spark, meta_tables):
    # two fk properties target kd_v -> parity with
    # create_pg_with_pk_fk.test's "Multiple primary key - foreign key"
    s = PGQSession(spark)
    with pytest.raises(PGQBinderError, match="Multiple primary key - foreign key"):
        s.execute(
            """CREATE PROPERTY GRAPH kd_pg_bad
               VERTEX TABLES ( kd_v LABEL KV )
               EDGE TABLES ( kd_e SOURCE kd_v DESTINATION kd_v LABEL KE )"""
        )


def test_discovery_single_fk_and_declared_pk(spark, meta_tables):
    # kd_e2 has exactly one declared fk to kd_v ('duckpgq.fk.src' = 'kd_v',
    # pk resolved from kd_v's 'duckpgq.key'); both endpoints discover it
    s = PGQSession(spark)
    s.execute("DROP PROPERTY GRAPH IF EXISTS kd_pg")
    s.execute(
        """CREATE PROPERTY GRAPH kd_pg
           VERTEX TABLES ( kd_v LABEL KV )
           EDGE TABLES ( kd_e2 SOURCE kd_v DESTINATION kd_v LABEL KE )"""
    )
    got = rows(
        s.graph_table(
            """kd_pg MATCH (a:KV)-[e:KE]->(b:KV)
               COLUMNS (a.id AS aid, b.id AS bid)"""
        )
    )
    # src doubles as both endpoints' fk -> self-pairs (1,1) and (3,3)
    assert got == [(1, 1), (3, 3)]


def test_discovery_missing_metadata_raises(spark, meta_tables):
    spark.createDataFrame([(1, 2)], "src long, dst long").createOrReplaceTempView(
        "kd_plain_e"
    )
    s = PGQSession(spark)
    with pytest.raises(PGQBinderError, match="no declared key metadata"):
        s.execute(
            """CREATE PROPERTY GRAPH kd_pg_missing
               VERTEX TABLES ( kd_v LABEL KVm )
               EDGE TABLES ( kd_plain_e SOURCE kd_v DESTINATION kd_v LABEL KEm )"""
        )


def test_multi_catalog_qualified_graph(spark):
    """Property graph over tables in a second database (schema) via
    qualified names — the ATTACH-database analog (attach_pg.test)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS pgq_other")
    spark.sql("DROP TABLE IF EXISTS pgq_other.mv")
    spark.sql("DROP TABLE IF EXISTS pgq_other.me")
    spark.sql("CREATE TABLE pgq_other.mv (id BIGINT, name STRING) USING parquet")
    spark.sql("INSERT INTO pgq_other.mv VALUES (1, 'x'), (2, 'y'), (3, 'z')")
    spark.sql("CREATE TABLE pgq_other.me (src BIGINT, dst BIGINT) USING parquet")
    spark.sql("INSERT INTO pgq_other.me VALUES (1, 2), (2, 3), (3, 1)")
    try:
        s = PGQSession(spark)
        s.execute("DROP PROPERTY GRAPH IF EXISTS mc_pg")
        s.execute(
            """CREATE PROPERTY GRAPH mc_pg
               VERTEX TABLES ( pgq_other.mv LABEL MV )
               EDGE TABLES ( pgq_other.me
                             SOURCE KEY (src) REFERENCES pgq_other.mv (id)
                             DESTINATION KEY (dst) REFERENCES pgq_other.mv (id)
                             LABEL ME )"""
        )
        got = rows(
            s.graph_table(
                """mc_pg MATCH (a:MV)-[e:ME]->(b:MV)
                   COLUMNS (a.name AS an, b.name AS bn)"""
            )
        )
        assert got == [("x", "y"), ("y", "z"), ("z", "x")]
        # whole-graph algorithm across the qualified tables
        wcc = s.weakly_connected_component("mc_pg", "MV", "ME")
        assert {r[1] for r in wcc.collect()} == {1}
        # 2-hop var-length over qualified tables (BFS route)
        two = s.graph_table(
            """mc_pg MATCH (a:MV)-[e:ME]->{2,2}(b:MV)
               WHERE a.id = 1 COLUMNS (b.id AS bid)"""
        )
        assert rows(two) == [(3,)]
    finally:
        spark.sql("DROP TABLE IF EXISTS pgq_other.mv")
        spark.sql("DROP TABLE IF EXISTS pgq_other.me")
