"""Label-inheritance goldens ported from
test/sql/pattern_matching/inheritance_support.test (F3 fixture)."""

import pytest
from pyspark.sql import Row

from duckpgq_extension_spark import PGQNotImplementedError, PGQSession

from .conftest import rows


@pytest.fixture(scope="module")
def inh(spark):
    spark.createDataFrame(
        [Row(id=i, name=n) for i, n in enumerate(["Daniel", "Tavneet", "Gabor", "Peter", "David"])],
        "id long, name string",
    ).createOrReplaceTempView("inh_person")
    spark.createDataFrame(
        [Row(personId=a, organisationId=b) for a, b in
         [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 0), (4, 3)]],
        "personId long, organisationId long",
    ).createOrReplaceTempView("inh_worksat")
    spark.createDataFrame(
        [
            Row(name="VU", id=0, mask=1),
            Row(name="UvA", id=1, mask=1),
            Row(name="EY", id=2, mask=2),
            Row(name="CWI", id=3, mask=2),
        ],
        "name string, id long, mask int",
    ).createOrReplaceTempView("inh_org")
    s = PGQSession(spark)
    s.execute(
        """CREATE PROPERTY GRAPH inh_pg
           VERTEX TABLES (
               inh_person LABEL Person,
               inh_org LABEL Organisation IN mask (university, company)
           )
           EDGE TABLES (
               inh_worksat SOURCE KEY (personId) REFERENCES inh_person (id)
                           DESTINATION KEY (organisationId) REFERENCES inh_org (id)
                           LABEL worksAt
           )"""
    )
    return s


def test_main_label_unfiltered(inh):
    df = inh.graph_table(
        """inh_pg MATCH (p:Person)-[w:worksAt]->(u:organisation)
           COLUMNS (p.id AS pid, p.name AS pname, u.id AS uid, u.name AS uname)"""
    )
    assert rows(df) == sorted(
        [
            (0, "Daniel", 1, "UvA"),
            (0, "Daniel", 2, "EY"),
            (0, "Daniel", 3, "CWI"),
            (1, "Tavneet", 2, "EY"),
            (1, "Tavneet", 3, "CWI"),
            (2, "Gabor", 3, "CWI"),
            (3, "Peter", 0, "VU"),
            (4, "David", 3, "CWI"),
        ],
        key=lambda t: tuple(map(str, t)),
    )


def test_sublabel_university(inh):
    df = inh.graph_table(
        """inh_pg MATCH (p:Person)-[w:worksAt]->(u:university)
           COLUMNS (p.id AS pid, p.name AS pname, u.id AS uid, u.name AS uname, u.mask AS m)"""
    )
    assert rows(df) == [(0, "Daniel", 1, "UvA", 1), (3, "Peter", 0, "VU", 1)]


def test_sublabel_company_case_insensitive(inh):
    df = inh.graph_table(
        """inh_pg MATCH (p:Person)-[w:worksAt]->(u:COMPANY)
           COLUMNS (p.id AS pid, u.name AS uname)"""
    )
    assert rows(df) == [
        (0, "CWI"),
        (0, "EY"),
        (1, "CWI"),
        (1, "EY"),
        (2, "CWI"),
        (4, "CWI"),
    ]


def test_sublabel_reverse_edge(inh):
    df = inh.graph_table(
        """inh_pg MATCH (u:university)<-[w:worksAt]-(p:person)
           COLUMNS (p.id AS pid, p.name AS pname, u.name AS uname, u.mask AS m)"""
    )
    assert rows(df) == [(0, "Daniel", "UvA", 1), (3, "Peter", "VU", 1)]


def test_path_modes_accepted_on_single_edge(inh):
    # beyond-reference: TRAIL/SIMPLE/ACYCLIC are implemented (the
    # reference rejects them, match.cpp:96-99); on a single-edge pattern
    # over distinct vertex tables every mode equals WALK
    for mode in ("WALK PATH", "TRAIL", "SIMPLE", "ACYCLIC"):
        df = inh.graph_table(
            f"""inh_pg MATCH {mode} (p:Person)-[w:worksAt]->(u:organisation)
                COLUMNS (p.id AS pid)"""
        )
        assert df.count() == 8, mode
