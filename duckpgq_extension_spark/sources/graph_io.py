"""Portable property-graph export/import (directory of parquet + metadata).

Reference analog: the reference bootstraps graphs with DuckDB's
`import database 'data/SNB0.003'` — a directory of table files plus
schema — followed by CREATE PROPERTY GRAPH (test/sql/snb/snb.test:9-53),
and resolves graphs over ATTACHed databases (create_pg/attach_pg.test).
Spark has no ATTACH; the idiomatic equivalent is a self-contained
directory of parquet tables plus the graph's catalog metadata, readable
from any driver that can reach the path (an object-store prefix at
cluster scale — the graph.json is tiny driver-side state, the tables
stay distributed parquet).

Layout::

    {path}/graph.json            catalog metadata (PropertyGraph.to_dict)
    {path}/tables/{table}/       one parquet dir per backing table

Scale notes: export writes each backing table once with its current
partitioning (pass partition_by to lay out edge tables by src for
shuffle-free adjacency reads — see sources/io.write_bucketed_edges for
the bucketed variant); import registers temp views over the parquet
dirs, so reads stay lazy/pruned — nothing is materialized at import
time.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from ..catalog import PropertyGraph, table_df
from ..errors import PGQBinderError

_FORMAT_VERSION = 1


def _safe_dirname(table_name: str) -> str:
    """Qualified names (cat.db.tbl) map to one flat dir; '/' cannot occur
    in SQL identifiers parts, '.' separates them."""
    return table_name.replace(".", "%2E") if "." in table_name else table_name


def export_property_graph(
    session,
    graph: str,
    path: str,
    mode: str = "error",
) -> dict:
    """Write `graph`'s backing tables (parquet) + catalog metadata under
    `path`.  `mode` is the Spark write mode for the table dirs
    ("error"/"overwrite").  Returns the written metadata dict."""
    pg = session.catalog.get(graph)
    spark: SparkSession = session.spark
    meta = pg.to_dict()
    meta["format_version"] = _FORMAT_VERSION
    tables = sorted(
        {t.table_name for t in pg.vertex_tables + pg.edge_tables}
    )
    meta["table_dirs"] = {}
    for t in tables:
        d = _safe_dirname(t)
        table_df(spark, t).write.mode(mode).parquet(
            os.path.join(path, "tables", d)
        )
        meta["table_dirs"][t] = os.path.join("tables", d)
    tmp = os.path.join(path, "graph.json.tmp")
    os.makedirs(path, exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(path, "graph.json"))
    return meta


def import_property_graph(
    session,
    path: str,
    name: str | None = None,
    or_replace: bool = False,
    register_views: bool = True,
):
    """Load an exported graph: register each table dir as a temp view
    (named like the original table) and recreate the catalog entry.

    `name` renames the graph on import; `register_views=False` skips the
    view registration when same-named tables already exist in the session
    (the metadata-only half of ATTACH semantics)."""
    meta_path = os.path.join(path, "graph.json")
    if not os.path.exists(meta_path):
        raise PGQBinderError(f"No exported property graph at '{path}' "
                             "(missing graph.json)")
    with open(meta_path) as f:
        meta = json.load(f)
    ver = meta.get("format_version")
    if ver != _FORMAT_VERSION:
        raise PGQBinderError(
            f"Unsupported graph export format_version {ver!r} "
            f"(this build reads {_FORMAT_VERSION})"
        )
    spark: SparkSession = session.spark
    if register_views:
        # qualified names flatten to their last identifier for the temp
        # views; two distinct tables sharing that segment would silently
        # shadow each other (last write wins) — refuse instead
        flat_names: dict[str, str] = {}
        for t in meta["table_dirs"]:
            v = t.split(".")[-1].lower()
            if v in flat_names and flat_names[v] != t:
                raise PGQBinderError(
                    f"Cannot import: tables '{flat_names[v]}' and '{t}' both "
                    f"flatten to view '{v}'; import with register_views=False "
                    "and register disambiguated views yourself"
                )
            flat_names[v] = t
        for t, d in meta["table_dirs"].items():
            df = spark.read.parquet(os.path.join(path, d))
            # qualified source names land in a flat temp view named by the
            # last identifier part (catalog-qualified targets cannot be
            # created as temp views)
            view = t.split(".")[-1]
            df.createOrReplaceTempView(f"`{view}`")
    d = {k: meta[k] for k in ("name", "vertex_tables", "edge_tables")}
    if name is not None:
        d = dict(d, name=name)
    if register_views:
        # rewrite qualified table references to the flat view names the
        # block above registered
        def flat(td):
            td = dict(td, table_name=td["table_name"].split(".")[-1])
            for k in ("source_reference", "destination_reference"):
                if td.get(k):
                    td[k] = td[k].split(".")[-1]
            return td

        d["vertex_tables"] = [flat(td) for td in d["vertex_tables"]]
        d["edge_tables"] = [flat(td) for td in d["edge_tables"]]
    pg = PropertyGraph.from_dict(d, spark)
    session.catalog.create(pg, or_replace=or_replace)
    return pg
