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


# ---------------------------------------------------------------------------
# information_schema constraint discovery (catalog.constraint_primary_key /
# constraint_foreign_keys): the ANSI surface Unity Catalog and other
# constraint-bearing V2 catalogs (Delta under Unity) expose informational
# PRIMARY KEY / FOREIGN KEY through.  The session catalog has none, so the
# tests emulate it with a real `information_schema` database holding the
# three ANSI tables — which exercises every line of the lookup path except
# the remote catalog itself.  Reference analog: reading DuckDB's constraint
# catalog in create_property_graph.cpp:117-153.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def info_schema(spark):
    from duckpgq_extension_spark import catalog as C

    spark.sql("CREATE DATABASE IF NOT EXISTS information_schema")
    spark.sql("DROP TABLE IF EXISTS information_schema.table_constraints")
    spark.sql("DROP TABLE IF EXISTS information_schema.key_column_usage")
    spark.sql("DROP TABLE IF EXISTS information_schema.referential_constraints")
    spark.sql(
        "CREATE TABLE information_schema.table_constraints "
        "(constraint_schema STRING, constraint_name STRING, "
        "table_schema STRING, table_name STRING, "
        "constraint_type STRING) USING parquet"
    )
    spark.sql(
        "CREATE TABLE information_schema.key_column_usage "
        "(constraint_schema STRING, constraint_name STRING, "
        "table_schema STRING, table_name STRING, "
        "column_name STRING, ordinal_position INT) USING parquet"
    )
    spark.sql(
        "CREATE TABLE information_schema.referential_constraints "
        "(constraint_schema STRING, constraint_name STRING, "
        "unique_constraint_schema STRING, unique_constraint_name STRING) "
        "USING parquet"
    )
    # data tables: kd_cv has a PK (id) — plus a DELIBERATELY wrong
    # duckpgq.key property to prove constraints take precedence; kd_cv2
    # has a composite PK (a, b); kd_ce has one FK src -> kd_cv(id)
    spark.sql("DROP TABLE IF EXISTS kd_cv")
    spark.sql("DROP TABLE IF EXISTS kd_cv2")
    spark.sql("DROP TABLE IF EXISTS kd_ce")
    spark.sql(
        "CREATE TABLE kd_cv (id BIGINT, name STRING) USING parquet "
        "TBLPROPERTIES ('duckpgq.key' = 'name')"
    )
    spark.sql("INSERT INTO kd_cv VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("CREATE TABLE kd_cv2 (a BIGINT, b BIGINT) USING parquet")
    spark.sql("CREATE TABLE kd_ce (src BIGINT, other BIGINT) USING parquet")
    spark.sql("INSERT INTO kd_ce VALUES (1, 10), (3, 30)")
    spark.sql(
        "INSERT INTO information_schema.table_constraints VALUES "
        "('default', 'pk_kd_cv', 'default', 'kd_cv', 'PRIMARY KEY'), "
        "('default', 'pk_kd_cv2', 'default', 'kd_cv2', 'PRIMARY KEY'), "
        "('default', 'fk_kd_ce_src', 'default', 'kd_ce', 'FOREIGN KEY'), "
        # a DIFFERENT schema reusing the exact constraint names — the
        # schema-matched joins must never mix these in (ADVICE r5)
        "('kd_xs', 'pk_kd_cv', 'kd_xs', 'decoy_v', 'PRIMARY KEY'), "
        # and a cross-schema reference: kd_ce.other -> kd_xs.xs_v(id)
        "('kd_xs', 'pk_xs_v', 'kd_xs', 'xs_v', 'PRIMARY KEY'), "
        "('default', 'fk_kd_ce_other', 'default', 'kd_ce', 'FOREIGN KEY')"
    )
    spark.sql(
        "INSERT INTO information_schema.key_column_usage VALUES "
        "('default', 'pk_kd_cv', 'default', 'kd_cv', 'id', 1), "
        # composite PK inserted out of order: ordinal_position must win
        "('default', 'pk_kd_cv2', 'default', 'kd_cv2', 'b', 2), "
        "('default', 'pk_kd_cv2', 'default', 'kd_cv2', 'a', 1), "
        "('default', 'fk_kd_ce_src', 'default', 'kd_ce', 'src', 1), "
        "('kd_xs', 'pk_kd_cv', 'kd_xs', 'decoy_v', 'decoy_col', 1), "
        "('kd_xs', 'pk_xs_v', 'kd_xs', 'xs_v', 'id', 1), "
        "('default', 'fk_kd_ce_other', 'default', 'kd_ce', 'other', 1)"
    )
    spark.sql(
        "INSERT INTO information_schema.referential_constraints VALUES "
        "('default', 'fk_kd_ce_src', 'default', 'pk_kd_cv'), "
        "('default', 'fk_kd_ce_other', 'kd_xs', 'pk_xs_v')"
    )
    C._INFOSCHEMA.clear()  # earlier tests cached "absent" for this session
    yield
    C._INFOSCHEMA.clear()
    spark.sql("DROP DATABASE IF EXISTS information_schema CASCADE")
    for t in ("kd_cv", "kd_cv2", "kd_ce"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_constraint_pk_beats_property(spark, info_schema):
    from duckpgq_extension_spark import catalog as C

    # the table property says 'name'; the catalog constraint says 'id'
    assert C.declared_primary_key(spark, "kd_cv") == ["id"]
    # composite key comes back in ordinal order despite insert order
    assert C.declared_primary_key(spark, "kd_cv2") == ["a", "b"]


def test_constraint_fk_assembly(spark, info_schema):
    from duckpgq_extension_spark import catalog as C

    got = sorted(C.constraint_foreign_keys(spark, "kd_ce"))
    # same-schema reference stays short; cross-schema one is qualified
    assert got == [
        (["other"], "kd_xs.xs_v", ["id"]),
        (["src"], "kd_cv", ["id"]),
    ]
    # tables without constraints fall through to [] (then properties)
    assert C.constraint_foreign_keys(spark, "kd_cv") == []
    # the decoy schema's same-named constraints must never leak in: the
    # PK of kd_cv is 'id', not the decoy's 'decoy_col'
    assert C.constraint_primary_key(spark, "kd_cv") == ["id"]


def test_constraint_discovery_short_form_ddl(spark, info_schema):
    # `SOURCE kd_cv` with no KEY clause: keys come from the
    # information_schema FK, end to end through CREATE PROPERTY GRAPH
    s = PGQSession(spark)
    s.execute("DROP PROPERTY GRAPH IF EXISTS kd_cpg")
    s.execute(
        """CREATE PROPERTY GRAPH kd_cpg
           VERTEX TABLES ( kd_cv LABEL KCV )
           EDGE TABLES ( kd_ce SOURCE kd_cv DESTINATION kd_cv LABEL KCE )"""
    )
    got = rows(
        s.graph_table(
            """kd_cpg MATCH (a:KCV)-[e:KCE]->(b:KCV)
               COLUMNS (a.id AS aid, b.id AS bid)"""
        )
    )
    assert got == [(1, 1), (3, 3)]
    s.execute("DROP PROPERTY GRAPH kd_cpg")


def test_no_infoschema_falls_back_to_properties(spark, meta_tables):
    from duckpgq_extension_spark import catalog as C

    # force a re-probe against a catalog prefix that has no info schema
    C._INFOSCHEMA.clear()
    spark.sql("DROP DATABASE IF EXISTS information_schema CASCADE")
    assert C.constraint_primary_key(spark, "kd_v") == []
    assert C.declared_primary_key(spark, "kd_v") == ["id"]  # property route
    C._INFOSCHEMA.clear()


def test_delta_constraint_route_gated():
    # Delta's own constraint surface needs the delta-spark jars (absent in
    # this container); under Unity, Delta PK/FK land in information_schema
    # and ride the exact path tested above.
    pytest.importorskip("delta")
