"""Batched multi-source BFS / shortest-path / weighted-SSSP operators.

Spark re-expression of the reference's CSR scalar kernels:
- iterativelength (multi-source BFS, 512 searches per pass via bitset
  lanes — /root/reference/src/core/functions/scalar/iterativelength.cpp:34-143,
  LANE_LIMIT at src/include/duckpgq/core/utils/duckpgq_utils.hpp:10)
- shortestpath (parent tracking + interleaved [v,e,v,...,v] output —
  src/core/functions/scalar/shortest_path.cpp:148-216)
- reachability (src/core/functions/scalar/reachability.cpp:165-254)
- cheapest_path_length (multi-lane Bellman-Ford —
  src/core/functions/scalar/cheapest_path_length.cpp:52-163)

The batching trick transfers directly: instead of per-(src,dst) traversals,
ALL searches advance together in ONE join per BFS level — the frontier is a
DataFrame keyed by (search origin, current vertex), so a single
frontier-to-edges hash join per level serves every search at once.  That is
the 512-lane idea with the lane count unbounded.

Scale notes (100 TB / 1000 executors):
- The adjacency DataFrame is hash-partitioned by `src` and cached once, so
  every per-level join co-partitions with the frontier and only the frontier
  side shuffles.
- Every level truncates lineage via `materialize()` (iterative unions
  otherwise build an O(levels)-deep plan and re-execute from scratch):
  `localCheckpoint` by default; set `spark.duckpgq.reliableCheckpoint=true`
  + a checkpoint dir for executor-loss-tolerant reliable checkpoints.
- Vertex ids are natural long keys — no dense 0..N-1 renumbering (a CSR
  artifact) and therefore no global sort at build time.
- Path tracking needs an `edge_id`.  Callers designate an existing unique
  edge column (`EDGE ID (col)` in the property-graph DDL routes it here);
  without one we fall back to `monotonically_increasing_id()` — fully
  distributed (no global sort), but the ids are then per-query artifacts,
  not stable across runs.  Supply a real id column whenever path contents
  must be reproducible.
- ANY SHORTEST ties break DETERMINISTICALLY: each BFS level keeps the
  lexicographically-smallest path array per (src, dst).  The reference
  keeps an arbitrary shortest path (shortest_path.cpp:28-29); emitting the
  lex-min one is a strict refinement (still "a shortest path") that makes
  results reproducible and oracle-checkable.  The induction holds because a
  lex-min shortest path's prefix is itself the lex-min shortest path to its
  endpoint (same-length prefixes compare element-wise).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..errors import PGQCapacityError, PGQNotImplementedError

_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}

_obs_seq = itertools.count()

RELIABLE_CHECKPOINT_CONF = "spark.duckpgq.reliableCheckpoint"

def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Lineage-truncating materialization for iterative loops.

    Defaults to `localCheckpoint` (executor-local blocks, no HDFS write —
    right for local mode and healthy clusters).  Setting the runtime conf
    `spark.duckpgq.reliableCheckpoint=true` (plus
    `sparkContext.setCheckpointDir(...)`; see PGQSession.set_checkpoint_dir)
    switches every iterative kernel to reliable `.checkpoint()`, which
    survives executor loss — preferable for long BFS/pagerank runs on a
    1000-executor cluster where losing one executor's local blocks would
    otherwise fail the whole query."""
    spark = df.sparkSession
    if spark.conf.get(RELIABLE_CHECKPOINT_CONF, "false").lower() == "true":
        return df.checkpoint(eager=eager)
    try:
        return df.localCheckpoint(eager=eager)
    except Exception:
        if hasattr(df, "_jdf"):
            raise  # classic py4j session: a real execution error, don't mask
        # Spark Connect build without localCheckpoint support (it became
        # server-side API in 4.0; older Connect clients lack it): persist +
        # count is the API-portable materialization.  It does NOT cut
        # lineage, so prefer the reliable-checkpoint conf (+ a checkpoint
        # dir) on Connect for deeply iterative workloads.
        out = df.persist()
        if eager:
            out.count()
        _bound_connect_persist_residue(out)
        return out


# Connect-fallback persisted frames, oldest first.  Because the fallback
# does NOT cut lineage, any frame here can be recomputed from its plan, so
# unpersisting an old one is always correct — just potentially slower.  Keep
# the most recent few (current + previous level of an iterative kernel plus
# slack for interleaved kernels) and release the rest so a deep traversal
# doesn't accumulate one cached copy of the frontier per level for the
# session lifetime.
_CONNECT_PERSISTED: list = []
_CONNECT_PERSIST_KEEP = 8


def _bound_connect_persist_residue(df: DataFrame) -> None:
    _CONNECT_PERSISTED.append(df)
    while len(_CONNECT_PERSISTED) > _CONNECT_PERSIST_KEEP:
        old = _CONNECT_PERSISTED.pop(0)
        try:
            old.unpersist()
        except Exception:  # session torn down; nothing to release
            pass


def default_parallelism(spark) -> int:
    """Kernel repartition width.  `sparkContext` does not exist on Spark
    Connect sessions — fall back to the shuffle-partition conf there (the
    same knob a cluster operator tunes for us)."""
    try:
        return spark.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001 - Connect session
        try:
            return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        except (TypeError, ValueError):  # e.g. "auto" under AQE management
            return 200


def checkpoint_with_count(df: DataFrame) -> tuple[DataFrame, int]:
    """Lineage-truncating checkpoint + row count in ONE Spark job.

    An Observation collects count(1) while the checkpoint job materializes
    the frame, so iterative loops get their emptiness/convergence signal
    for free instead of launching a second `isEmpty`/`count` job per level
    — per-level driver round-trips halve, which dominates small-frontier
    BFS levels (the reference's kernels are single-process and have no
    analog of this cost)."""
    obs = Observation(f"__pgq_ckpt_{next(_obs_seq)}")
    out = materialize(df.observe(obs, F.count(F.lit(1)).alias("n")))
    return out, obs.get["n"]


def require_integral_keys(df: DataFrame, cols: list[str], context: str) -> None:
    """Bind-time guard for the places that splice NATURAL vertex/edge ids
    into long arrays (EDGE ID columns, named-path fixed segments): a
    non-integral value would cast to NULL and corrupt the array.
    Quantified patterns and whole-graph algorithms no longer need this —
    they route composite/string keys through the collision-checked
    xxhash64 surrogate (compiler._key_hash), the no-global-sort analog of
    the reference's dense CSR renumbering (csr_creation.cpp)."""
    types = {f.name.lower(): f.dataType.simpleString() for f in df.schema.fields}
    for c in cols:
        dt = types.get(c.lower())
        if dt not in _INTEGRAL_TYPES:
            raise PGQNotImplementedError(
                f"{context}: key column '{c}' has type '{dt}'; path-finding "
                "and whole-graph algorithms require integral vertex keys "
                "(map non-numeric keys to dense long ids first)"
            )


def edge_frame(
    edf: DataFrame,
    src_col: str,
    dst_col: str,
    undirected: bool = False,
    weight_col: str | None = None,
    edge_id_col: str | None = None,
    with_edge_ids: bool = False,
) -> DataFrame:
    """Normalize an edge table to (src, dst[, edge_id][, weight]).

    Undirected graphs get both orientations with the same edge_id (the
    reference builds its undirected CSR the same way:
    compressed_sparse_row.cpp:208-223).
    """
    cols = [F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst")]
    if with_edge_ids:
        if edge_id_col is not None:
            cols.append(F.col(edge_id_col).cast("long").alias("edge_id"))
        else:
            # distributed fallback: per-partition monotonic ids, no global
            # sort.  Ids are per-query artifacts (not stable across runs) —
            # designate a real edge id column for reproducible path output.
            edf = edf.withColumn("__pgq_eid", F.monotonically_increasing_id())
            cols.append(F.col("__pgq_eid").alias("edge_id"))
    if weight_col is not None:
        cols.append(F.col(weight_col).alias("weight"))
    edges = edf.select(*cols)
    if undirected:
        swapped = edges.withColumn("__t", F.col("src")).withColumn(
            "src", F.col("dst")
        ).withColumn("dst", F.col("__t")).drop("__t")
        edges = edges.unionByName(swapped)
    return edges


# Session adjacency cache — the Spark analog of the reference's
# session-lifetime CSR cache (DuckPGQ builds the CSR on first MATCH and
# keeps it in DuckPGQState::csr_list until an explicit delete_csr,
# /root/reference/src/duckpgq_state.cpp:167-185): every kernel call used to re-shuffle
# and re-checkpoint the same edge set.  Keyed by the edge frame's ANALYZED
# plan: a semanticHash probe confirmed by Catalyst's sameResult (the same
# two-step Spark's own exchange-reuse does), so re-registering a view over
# DIFFERENT files is a guaranteed miss (the file index lives in the plan)
# while the same logical edges hit.  In-place mutation of the same files
# within one session serves the cached snapshot — the reference's CSR has
# identical semantics — clear_prep_cache() is the delete_csr analog.
# Eviction drops OUR reference only (FIFO past _PREP_CACHE_MAX); blocks are
# freed by the ContextCleaner once no live query references the frame, so
# eviction can never break an in-flight query.
_PREP_CACHE: dict[int, tuple] = {}  # id(session) -> (weakref(session), entries)
_PERSIST_CACHE: dict[int, tuple] = {}  # same shape, persist-based frames
_PREP_CACHE_MAX = 16


def clear_prep_cache(spark=None) -> None:
    """Drop cached adjacency frames (all sessions, or one session's) —
    the delete_csr analog.  Persist-based entries are unpersisted (their
    lineage is intact, so an in-flight query just recomputes)."""
    keys = list(_PERSIST_CACHE) if spark is None else [id(spark)]
    for k in keys:
        hit = _PERSIST_CACHE.pop(k, None)
        if hit is not None:
            for entry in hit[1]:
                try:
                    entry[-1].unpersist()
                except Exception:  # session already stopped
                    pass
    if spark is None:
        _PREP_CACHE.clear()
    else:
        _PREP_CACHE.pop(id(spark), None)


def _cache_probe(store: dict, df: DataFrame):
    """(entries, jplan) for a cache probe; (None, None) when uncacheable
    (Spark Connect: no _jdf) or disabled via SPARK_GRAFT_ADJ_CACHE=0."""
    import os
    import weakref

    if os.environ.get("SPARK_GRAFT_ADJ_CACHE", "1") == "0":
        return None, None
    try:
        jplan = df._jdf.queryExecution().analyzed()
    except Exception:
        return None, None
    spark = df.sparkSession
    key = id(spark)
    hit = store.get(key)
    if hit is None or hit[0]() is not spark:  # id() reuse after session GC
        hit = (weakref.ref(spark), [])
        store[key] = hit
    return hit[1], jplan


def persist_partitioned(
    df: DataFrame, num_partitions: int | None = None, key: str = "src"
) -> DataFrame:
    """Repartition-by-key + persist, cached per session like _prep_edges.

    persist (NOT checkpoint) because these frames feed per-round joins
    that rely on the surviving HashPartitioning(key) — a checkpointed
    frame surfaces as UnknownPartitioning and re-shuffles every round
    (see temporal_reachability's adjacency note).  Lineage stays intact,
    so evicting + unpersisting can never break an in-flight query — it
    just recomputes.  Uncached contexts (Spark Connect, cache disabled)
    fall back to the bounded persist-residue list, mirroring the
    per-call lifecycle callers used to manage by hand."""
    n = num_partitions or default_parallelism(df.sparkSession)
    entries, jplan = _cache_probe(_PERSIST_CACHE, df)
    if entries is not None:
        h = jplan.semanticHash()
        for en, ek, eh, ep, cached in entries:
            if en == n and ek == key and eh == h and ep.sameResult(jplan):
                return cached
    out = df.repartition(n, key).persist()
    # eager populate: a lazy persist makes the FIRST consuming query pay
    # columnar-cache serialization inside its own stages (measured: WCC
    # first run 12.6 s lazy vs 5.1 s eager at sf0.1, r6); one cheap
    # count() job up front keeps every consumer on the fast path
    out.count()
    if entries is not None:
        entries.append((n, key, jplan.semanticHash(), jplan, out))
        while len(entries) > _PREP_CACHE_MAX:
            old = entries.pop(0)
            try:
                old[-1].unpersist()
            except Exception:
                pass
    else:
        _bound_connect_persist_residue(out)
    return out


def _prep_edges(edges: DataFrame, num_partitions: int | None) -> DataFrame:
    """Materialize the adjacency hash-partitioned by src, cached per
    session (see _PREP_CACHE above).

    Checkpoint (not just persist) on purpose: it severs the upstream
    logical plan, so (a) per-level joins don't re-analyze an arbitrarily
    deep user plan, and (b) Catalyst's Union constraint propagation never
    sees exotic upstream operators (scalar subqueries in a derived edge
    view trip `UnionBase.rewriteConstraints` otherwise).
    """
    if num_partitions == 0:
        # caller vouches the input is already laid out by src (e.g. a
        # bucketed table from sources.io.write_bucketed_edges) — skip the
        # repartition shuffle entirely
        return materialize(edges)
    n = num_partitions or default_parallelism(edges.sparkSession)
    entries, jplan = _cache_probe(_PREP_CACHE, edges)
    if entries is not None:
        h = jplan.semanticHash()
        for en, eh, ep, cached in entries:
            if en == n and eh == h and ep.sameResult(jplan):
                return cached
    out = materialize(edges.repartition(n, "src"))
    if entries is not None:
        entries.append((n, jplan.semanticHash(), jplan, out))
        while len(entries) > _PREP_CACHE_MAX:
            entries.pop(0)
    return out


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame | None = None,
    max_hops: int | None = None,
    track_paths: bool = False,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    k: int = 1,
    all_shortest: bool = False,
    max_rows: int | None = None,
    hops_per_round: int = 1,
) -> DataFrame:
    """All-pairs-from-sources BFS: returns (src, dst, dist [, path]).

    src   = search origin vertex id
    dst   = reached vertex id
    dist  = hop count of the shortest path (0 for src itself)
    path  = interleaved [v0, e0, v1, e1, ..., vk] matching the reference's
            shortestpath output convention (shortest_path.cpp:213-216);
            [src] alone for the zero-hop path (shortest_path.cpp:158-166).

    Unreachable pairs are simply absent (the caller's join produces no row,
    which is the DataFrame analog of the reference's NULL result,
    iterativelength.cpp:132-140).

    When several shortest paths tie, the lexicographically-smallest path
    array is kept (deterministic; see module notes).  The reference keeps
    an arbitrary one (shortest_path.cpp:28-29) — any shortest path is a
    valid ANY SHORTEST answer, so this is a compatible refinement.

    k > 1 (beyond-reference `SHORTEST k`, which the reference rejects,
    top_k.test:33-49) keeps the k best walks per (src, dst) ordered by
    (dist, lexicographic path) — up to k rows per pair.  Correct for WALK
    semantics because the k best walks to a vertex extend the k best walks
    to its predecessors; entries beyond k are pruned permanently, bounding
    state at k rows per pair regardless of cycles.

    hops_per_round (length-only mode, i.e. track_paths=False/k=1): relax
    this many adjacency steps lazily inside ONE checkpoint job per round
    (hop j's min-deduped candidates feed hop j+1; all hops union into the
    min-dist merge before the visited anti-join).  Correctness holds for
    any value: every candidate dist is the length of a real walk (never
    an underestimate), any pair first reachable at depth d has a
    predecessor in the max-dist frontier, and `max_hops` still binds
    exactly (the last round is clamped).  Tie-break modes (track_paths /
    k>1 / all_shortest) need per-level candidate sets and stay
    single-hop.

    Default is 1 — a RECORDED NEGATIVE RESULT (round 5): hops_per_round=2
    measured SLOWER across every BFS-backed query at sf0.1 (reachability
    2.63→3.12 s, closeness 2.84→3.49 s, harmonic 2.70→3.47 s,
    eccentricity 2.89→3.14 s; shortest_len a wash), because hop 2 expands
    from hop 1's min-deduped candidates BEFORE the visited anti-join — on
    the dense mid-BFS frontiers of these queries most hop-1 candidates
    are already visited, so the second join is mostly wasted work, and
    that waste grows (not shrinks) with data volume.  This differs from
    temporal_reachability's fused multi-hop (a label-improvement lattice:
    re-relaxing a label is never wasted if it improves) where the same
    trick measured ~2× faster.  Keep 1 unless the frontier is known
    sparse at every level (e.g. long chains), where 2 halves the
    job-latency floor.

    max_rows: cap on the ACCUMULATED result rows, intended for
    all_shortest (the other modes are bounded at k rows per (src, dst)
    pair by construction, but the cap applies there too if set).
    ALL-SHORTEST path counts grow combinatorially on diamond-rich
    graphs; when the cap is crossed the traversal raises PGQCapacityError
    at the end of the offending level — a loud, catchable failure instead
    of an executor OOM.  The count rides the per-level checkpoint
    Observation, so the cap adds no extra Spark job.
    """
    if k > 1 and not track_paths:
        raise ValueError("k > 1 requires track_paths (paths break ties)")
    if all_shortest and (k > 1 or not track_paths):
        raise ValueError("all_shortest requires track_paths and k == 1")
    if track_paths and "edge_id" not in edges.columns:
        raise ValueError("track_paths requires an edge_id column (use edge_frame)")
    edges = _prep_edges(edges, num_partitions)
    try:
        if sources is None:
            srcs = edges.select("src").union(edges.select(F.col("dst").alias("src"))).distinct()
        else:
            srcs = sources.toDF("src").distinct()

        frontier = srcs.select(
            F.col("src"), F.col("src").alias("dst"), F.lit(0).alias("dist")
        )
        if track_paths:
            frontier = frontier.withColumn("path", F.array(F.col("src")))
        visited = materialize(frontier)
        frontier = visited
        level = 0
        total_rows = 0
        plain = not track_paths and k == 1 and not all_shortest
        hpr = max(1, hops_per_round) if plain else 1
        while True:
            if max_hops is not None and level >= max_hops:
                break
            if plain and hpr > 1:
                hops = hpr if max_hops is None else min(hpr, max_hops - level)
                level += hops
                cur = frontier.select("src", "dst", "dist")
                laps = []
                for _ in range(hops):
                    cur = (
                        cur.alias("f")
                        .join(edges.alias("e"), F.col("f.dst") == F.col("e.src"))
                        .select(
                            F.col("f.src").alias("src"),
                            F.col("e.dst").alias("dst"),
                            (F.col("f.dist") + 1).alias("dist"),
                        )
                        # lazy per-hop min-dedup: stops frontier×edges
                        # fan-out from compounding across hops (all inside
                        # this round's one job)
                        .groupBy("src", "dst")
                        .agg(F.min("dist").alias("dist"))
                    )
                    laps.append(cur)
                cand = laps[0]
                for lap in laps[1:]:
                    cand = cand.unionByName(lap)
                if len(laps) > 1:
                    cand = cand.groupBy("src", "dst").agg(
                        F.min("dist").alias("dist")
                    )
                nxt = cand.join(
                    visited.select("src", "dst"), ["src", "dst"], "left_anti"
                )
                nxt, n_new = checkpoint_with_count(nxt)
                if n_new == 0:
                    break
                if max_rows is not None:
                    total_rows = total_rows + n_new
                    if total_rows > max_rows:
                        raise PGQCapacityError(
                            f"bfs_distances exceeded max_rows={max_rows} at "
                            f"level {level} ({total_rows} rows accumulated). "
                            "Bound the traversal with max_hops or restrict "
                            "the source set."
                        )
                visited = visited.unionByName(nxt)
                if level % 10 in (0, 1):
                    visited = materialize(visited)
                # interior hops' neighborhoods were fully explored inside
                # this round — only the deepest rows can reach anything new
                frontier = nxt.where(F.col("dist") == F.lit(level))
                continue
            level += 1
            expanded = (
                frontier.alias("f")
                .join(edges.alias("e"), F.col("f.dst") == F.col("e.src"))
                .select(
                    F.col("f.src").alias("src"),
                    F.col("e.dst").alias("dst"),
                    (F.col("f.dist") + 1).alias("dist"),
                    *(
                        [
                            F.concat(
                                F.col("f.path"),
                                F.array(F.col("e.edge_id"), F.col("e.dst")),
                            ).alias("path")
                        ]
                        if track_paths
                        else []
                    ),
                )
            )
            if k > 1:
                # keep the lex-smallest candidates that fit the remaining
                # per-pair capacity (k minus walks already kept); later
                # levels only ever ADD longer walks, so adding in level
                # order == ranking by (dist, path)
                from pyspark.sql import Window

                counts = visited.groupBy("src", "dst").agg(
                    F.count("*").alias("__cnt")
                )
                w = Window.partitionBy("src", "dst").orderBy("path")
                nxt = (
                    expanded.withColumn("__rn", F.row_number().over(w))
                    .join(counts, ["src", "dst"], "left")
                    .where(
                        F.col("__rn")
                        <= F.lit(k) - F.coalesce(F.col("__cnt"), F.lit(0))
                    )
                    .drop("__rn", "__cnt")
                )
            elif track_paths and all_shortest:
                # ALL SHORTEST (beyond-reference, rejected by the reference
                # match.cpp:81-104): keep EVERY distinct path that first
                # reaches a pair this level — all have dist == level, and
                # every shortest path's prefix is a shortest path to its
                # penultimate vertex, so extending the full per-vertex path
                # set is exhaustive.  One row per path; path count per pair
                # can grow combinatorially on dense diamond-rich graphs
                # (inherent to the semantics — bound with quantifier upper
                # bounds or selective sources).
                nxt = expanded.dropDuplicates(["src", "dst", "path"])
                nxt = nxt.join(visited.select("src", "dst"), ["src", "dst"], "left_anti")
            elif track_paths:
                # deterministic tie-break: lexicographically-smallest path
                # per (src, dst) this level (see module notes); same shuffle
                # key + map-side partial agg as dropDuplicates
                nxt = expanded.groupBy("src", "dst").agg(
                    F.min("dist").alias("dist"), F.min("path").alias("path")
                )
                nxt = nxt.join(visited.select("src", "dst"), ["src", "dst"], "left_anti")
            else:
                nxt = expanded.dropDuplicates(["src", "dst"])
                nxt = nxt.join(visited.select("src", "dst"), ["src", "dst"], "left_anti")
            nxt, n_new = checkpoint_with_count(nxt)
            if n_new == 0:
                break
            if max_rows is not None:
                total_rows = total_rows + n_new
                if total_rows > max_rows:
                    raise PGQCapacityError(
                        f"bfs_distances(all_shortest={all_shortest}) exceeded "
                        f"max_rows={max_rows} at level {level} "
                        f"({total_rows} paths accumulated): shortest-path "
                        "multiplicity is growing combinatorially.  Bound the "
                        "traversal with max_hops / a quantifier upper bound, "
                        "restrict the source set, or raise max_rows."
                    )
            # each level is already materialized, so the accumulated visited
            # set is a cheap union of checkpointed frames — no extra job;
            # re-checkpoint occasionally so deep (high-diameter) graphs don't
            # grow an O(levels)-wide union plan in the per-level anti-join
            visited = visited.unionByName(nxt)
            if level % 10 == 0:
                visited = materialize(visited)
            frontier = nxt
        return visited
    finally:
        edges.unpersist()


def bfs_all_paths(
    edges: DataFrame,
    sources: DataFrame | None = None,
    mode: str = "ACYCLIC",
    max_hops: int | None = None,
    num_partitions: int | None = None,
    max_rows: int | None = None,
) -> DataFrame:
    """Enumerate ALL distinct non-repeating paths (one row per path):
    (src, dst, dist, path) with the interleaved [v0, e0, v1, ...] array.

    Beyond-reference: the reference rejects every path mode except WALK
    (match.cpp:96-99).  Modes:
      ACYCLIC — no repeated vertex;
      TRAIL   — no repeated edge (by edge_id, so an undirected edge's two
                orientations count as the same edge);
      SIMPLE  — no repeated vertex, except the path may close back to its
                start as its final step (and then stops extending).

    Unlike bfs_distances there is no per-(src,dst) dedup — every distinct
    path is a row.  Termination needs no upper bound: a path consumes a
    vertex (ACYCLIC/SIMPLE) or an edge (TRAIL) per step, so depth is
    bounded by |V| / |E|.  Output size can still be combinatorial in
    dense graphs — bound it with quantifier upper bounds or selective
    sources, like any path-enumeration engine; `max_rows` caps the
    accumulated path count and raises PGQCapacityError at the end of
    the offending level (piggybacking the per-level checkpoint count —
    no extra job) instead of letting an executor OOM.

    Scale shape: identical to bfs_distances — adjacency checkpointed
    hash-partitioned by src once, one frontier join per level, lineage
    truncated per level; the per-path `seen` array adds O(path length)
    state per row but no extra shuffle.
    """
    mode = mode.upper()
    if mode not in ("ACYCLIC", "TRAIL", "SIMPLE"):
        raise ValueError(f"bfs_all_paths mode must be ACYCLIC/TRAIL/SIMPLE, got {mode!r}")
    if "edge_id" not in edges.columns:
        raise ValueError("bfs_all_paths requires an edge_id column (use edge_frame)")
    edges = _prep_edges(edges, num_partitions)
    try:
        if sources is None:
            srcs = edges.select("src").union(edges.select(F.col("dst").alias("src"))).distinct()
        else:
            srcs = sources.toDF("src").distinct()
        frontier = srcs.select(
            F.col("src"),
            F.col("src").alias("dst"),
            F.lit(0).alias("dist"),
            F.array(F.col("src")).alias("path"),
            # seen: vertices consumed (ACYCLIC/SIMPLE) or edge ids (TRAIL)
            (
                F.array().cast("array<long>")
                if mode == "TRAIL"
                else F.array(F.col("src"))
            ).alias("seen"),
        )
        out = materialize(frontier)
        frontier = out
        level = 0
        total_rows = 0
        while True:
            if max_hops is not None and level >= max_hops:
                break
            level += 1
            f, e = frontier.alias("f"), edges.alias("e")
            joined = f.join(e, F.col("f.dst") == F.col("e.src"))
            if mode == "TRAIL":
                keep = ~F.array_contains(F.col("f.seen"), F.col("e.edge_id"))
                new_seen = F.concat(F.col("f.seen"), F.array(F.col("e.edge_id")))
            elif mode == "ACYCLIC":
                keep = ~F.array_contains(F.col("f.seen"), F.col("e.dst"))
                new_seen = F.concat(F.col("f.seen"), F.array(F.col("e.dst")))
            else:  # SIMPLE: closure back to the start vertex is allowed
                keep = (~F.array_contains(F.col("f.seen"), F.col("e.dst"))) | (
                    F.col("e.dst") == F.col("f.src")
                )
                new_seen = F.concat(F.col("f.seen"), F.array(F.col("e.dst")))
            expanded = joined.where(keep).select(
                F.col("f.src").alias("src"),
                F.col("e.dst").alias("dst"),
                (F.col("f.dist") + 1).alias("dist"),
                F.concat(
                    F.col("f.path"), F.array(F.col("e.edge_id"), F.col("e.dst"))
                ).alias("path"),
                new_seen.alias("seen"),
            )
            nxt, n_new = checkpoint_with_count(expanded)
            if n_new == 0:
                break
            if max_rows is not None:
                total_rows = total_rows + n_new
                if total_rows > max_rows:
                    raise PGQCapacityError(
                        f"bfs_all_paths(mode={mode!r}) exceeded "
                        f"max_rows={max_rows} at level {level} "
                        f"({total_rows} paths accumulated): path enumeration "
                        "is growing combinatorially.  Bound the traversal "
                        "with max_hops / a quantifier upper bound, restrict "
                        "the source set, or raise max_rows."
                    )
            out = out.unionByName(nxt)
            if level % 10 == 0:
                out = materialize(out)
            frontier = nxt
            if mode == "SIMPLE":
                # a closed path (dst == start, dist > 0) must not extend:
                # anything after the closure would repeat the start vertex
                frontier = nxt.where(
                    (F.col("dst") != F.col("src")) | (F.col("dist") == 0)
                )
        return out.drop("seen")
    finally:
        edges.unpersist()


def iterative_length(
    edges: DataFrame,
    pairs: DataFrame,
    max_hops: int | None = None,
) -> DataFrame:
    """Reference `iterativelength` (hop count per (src,dst) pair, NULL when
    unreachable).  `pairs` has columns (src, dst)."""
    dist = bfs_distances(edges, sources=pairs.select("src"), max_hops=max_hops)
    return pairs.join(dist, ["src", "dst"], "left").select(
        pairs["src"], pairs["dst"], dist["dist"].alias("dist")
    )


def reachability(edges: DataFrame, pairs: DataFrame) -> DataFrame:
    """Reference `reachability`: boolean per (src,dst) pair."""
    dist = bfs_distances(edges, sources=pairs.select("src"))
    return pairs.join(dist, ["src", "dst"], "left").select(
        pairs["src"], pairs["dst"], dist["dist"].isNotNull().alias("reachable")
    )


def bidirectional_length(
    edges: DataFrame,
    pairs: DataFrame,
    max_hops: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Point-to-point shortest hop counts via meet-in-the-middle BFS.

    Spark re-expression of the reference's bidirectional perf variant
    (src/core/functions/scalar/iterativelength_bidirectional.cpp:12-41):
    expand a forward frontier from the src side and a backward frontier
    from the dst side, always growing the globally smaller one, and read
    distances off frontier meets.  On a graph with branching factor B and
    true distance L this touches O(B^(L/2)) vertices per side instead of
    O(B^L) — the win the reference's variant exists for, and the reason
    to prefer this over `iterative_length` for a handful of point queries
    on a huge graph (the multi-source batched BFS stays the right call
    when the source set is large).

    Semantics are identical to `iterative_length`: one row (src, dst,
    dist) per reachable input pair within `max_hops`; unreachable pairs
    are absent.

    Correctness invariant: after f forward and b backward levels, every
    path of length d <= f + b has a cut vertex v at position f with
    fwd_dist(v) <= f and bwd_dist(v) = d - f <= b, so the pair's meet
    minimum equals its true distance as soon as that minimum is <= f + b.
    A pair is "resolved" exactly then; searches whose pairs are all
    resolved are pruned from the frontiers.

    Scale notes: both adjacency orientations are checkpointed
    hash-partitioned by their join key (forward by src, reversed by dst),
    so per-level joins shuffle only the frontier side; `best` stays
    bounded by the input pair count and rides each meet update's
    checkpoint job via an Observation (no extra count jobs).
    """
    pairs = (
        pairs.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    pairs, n_pairs = checkpoint_with_count(pairs)
    fwd = _prep_edges(edges.select("src", "dst"), num_partitions)
    bwd = _prep_edges(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        num_partitions,
    )
    try:
        # visited/frontier schema: (origin, v, dist); forward origins are
        # pair srcs, backward origins are pair dsts.  All three seed frames
        # (forward, backward, the src==dst zero-distance meets) materialize
        # in ONE tagged job with three Observations — point queries are
        # fixed-cost-dominated, so pre-loop jobs matter as much as
        # per-level jobs.
        def tag(df, t):
            return df.select(
                F.lit(t).alias("__t"), "a", "b", F.lit(0).alias("dist")
            )

        seeds = (
            tag(
                pairs.select(F.col("src").alias("a")).distinct()
                .withColumn("b", F.col("a")),
                0,
            )
            .unionByName(
                tag(
                    pairs.select(F.col("dst").alias("a")).distinct()
                    .withColumn("b", F.col("a")),
                    1,
                )
            )
            .unionByName(
                tag(
                    pairs.where(F.col("src") == F.col("dst"))
                    .select(F.col("src").alias("a"), F.col("dst").alias("b")),
                    2,
                )
            )
        )
        obs = Observation(f"__pgq_bidir_{next(_obs_seq)}")
        seeds = materialize(
            seeds.observe(
                obs,
                F.sum((F.col("__t") == 0).cast("long")).alias("nf"),
                F.sum((F.col("__t") == 1).cast("long")).alias("nb"),
                F.sum((F.col("__t") == 2).cast("long")).alias("nr"),
            )
        )
        vals = obs.get
        n_f, n_b = int(vals["nf"] or 0), int(vals["nb"] or 0)
        n_resolved = int(vals["nr"] or 0)

        def untag(t, c1, c2):
            return seeds.where(F.col("__t") == t).select(
                F.col("a").alias(c1), F.col("b").alias(c2), "dist"
            )

        fvis = untag(0, "origin", "v")
        bvis = untag(1, "origin", "v")
        best = untag(2, "src", "dst")
        ffront, bfront = fvis, bvis

        def merge_best(best, new_meets, depth_sum):
            """Fold new meets into the per-pair minimum; the resolved count
            (best <= f + b) is observed during the checkpoint job."""
            merged = (
                best.unionByName(new_meets)
                .groupBy("src", "dst")
                .agg(F.min("dist").alias("dist"))
            )
            obs = Observation(f"__pgq_bidir_{next(_obs_seq)}")
            merged = merged.observe(
                obs,
                F.sum((F.col("dist") <= F.lit(depth_sum)).cast("long")).alias("n"),
            )
            return materialize(merged), int(obs.get["n"] or 0)
        f = b = 0
        exhausted = False
        while n_resolved < n_pairs:
            if max_hops is not None and f + b >= max_hops:
                break
            if n_f == 0 and n_b == 0:
                # both sides exhausted: every unresolved pair's searches ran
                # to completion, so its accumulated meet minimum is already
                # its exact distance (or it is unreachable and has no meet)
                exhausted = True
                break
            # expand the smaller *non-exhausted* frontier (an exhausted
            # side's searches are complete, so its pairs' bests are final)
            expand_fwd = n_b == 0 or (n_f != 0 and n_f <= n_b)
            adj = fwd if expand_fwd else bwd
            front = ffront if expand_fwd else bfront
            vis = fvis if expand_fwd else bvis
            nxt = (
                front.alias("f")
                .join(adj.alias("e"), F.col("f.v") == F.col("e.src"))
                .select(
                    F.col("f.origin").alias("origin"),
                    F.col("e.dst").alias("v"),
                    (F.col("f.dist") + 1).alias("dist"),
                )
                .dropDuplicates(["origin", "v"])
                .join(vis.select("origin", "v"), ["origin", "v"], "left_anti")
            )
            nxt, n_new = checkpoint_with_count(nxt)
            vis = vis.unionByName(nxt)
            if expand_fwd:
                f += 1
                fvis, ffront, n_f = vis, nxt, n_new
                other_vis = bvis
            else:
                b += 1
                bvis, bfront, n_b = vis, nxt, n_new
                other_vis = fvis
            if n_new == 0:
                continue  # exhaustion handled at the top of the loop
            # incremental meets: only the rows added this level can create
            # new (pair, cut-vertex) combinations
            meets = (
                nxt.alias("n")
                .join(other_vis.alias("o"), F.col("n.v") == F.col("o.v"))
                .select(
                    F.col(f"{'n' if expand_fwd else 'o'}.origin").alias("src"),
                    F.col(f"{'o' if expand_fwd else 'n'}.origin").alias("dst"),
                    (F.col("n.dist") + F.col("o.dist")).alias("dist"),
                )
                .join(pairs, ["src", "dst"], "left_semi")
            )
            best, n_resolved = merge_best(best, meets, f + b)
            if n_resolved < n_pairs:
                # prune searches whose pairs are all resolved.  n_f/n_b
                # intentionally keep their pre-prune values (recounting the
                # pruned frontiers would cost a Spark job per iteration);
                # the smaller-side heuristic may therefore run on stale
                # sizes for one level after a partial resolve — a latency
                # trade, never a correctness one (exhaustion is only
                # declared by an actually-empty expansion)
                active = pairs.join(
                    best.where(F.col("dist") <= F.lit(f + b)),
                    ["src", "dst"],
                    "left_anti",
                )
                ffront = ffront.join(
                    active.select(F.col("src").alias("origin")).distinct(),
                    "origin",
                    "left_semi",
                )
                bfront = bfront.join(
                    active.select(F.col("dst").alias("origin")).distinct(),
                    "origin",
                    "left_semi",
                )
        out = best if exhausted else best.where(F.col("dist") <= F.lit(f + b))
        if max_hops is not None:
            out = out.where(F.col("dist") <= F.lit(max_hops))
        return out.select("src", "dst", "dist")
    finally:
        fwd.unpersist()
        bwd.unpersist()


def cheapest_path_distances(
    edges: DataFrame,
    sources: DataFrame | None = None,
    max_iters: int | None = None,
    num_partitions: int | None = None,
    track_paths: bool = False,
    hops_per_round: int = 1,
) -> DataFrame:
    """Weighted SSSP from every source: (src, dst, cost[, path]).

    Batched Bellman-Ford relaxation — all sources relax together in one
    join per round, converging in at most |V|-1 rounds (the reference's
    multi-lane Bellman-Ford, cheapest_path_length.cpp:52-136).  Weights are
    assumed non-negative (the reference makes the same assumption).

    hops_per_round > 1 relaxes that many adjacency steps lazily inside
    ONE merge + checkpoint job (hop k's min-aggregated candidates feed
    hop k+1; all hops union into the merge); semantics are unchanged
    (each round still certifies convergence via the improvement count,
    and max_iters counts ROUNDS).  Default is 1 — a RECORDED NEGATIVE
    RESULT (round 5, fresh-session medians-of-3 at sf0.1):
    hops_per_round=2 measured cheapest_path_vertices 8.0→11.1 s and
    match_cheapest 8.1→10.0 s (track_paths: the second hop re-shuffles
    full path arrays through an extra struct-min groupBy), and
    length-only cheapest_path 7.96→8.23 s (a wash — the relaxation
    frontier is dense nearly every round, so hop 2's extra join buys few
    rounds).  Contrast temporal_reachability's fused multi-hop, which
    measured ~2× faster — its frontier shrinks to improved labels only.
    The parameter stays for sparse-frontier graphs (long weighted
    chains), where 2 halves the job-latency floor.  Re-measured at the
    10x tier (r6, length-only, 3 sources, warm): hops 1/2/3 all land
    18-21 s — the candidate join volume dominates and multi-hop does
    not reduce it; still a wash.  Also tried and rejected (r6): a
    persist-chain for dist (checkpoint every 5th round only, so the
    full-outer join's (src,dst) hash partitioning survives between
    rounds) — no measurable win, because the per-round cost is the
    frontier x adjacency candidate join + min-agg, not the small
    dist-side exchange.

    track_paths=True (beyond-reference — the reference only returns the
    LENGTH, cheapest_path_length.cpp) additionally returns the path
    array of one cheapest path, ties broken to the lexicographically
    smallest array.  With an `edge_id` column on the edge frame the
    array is interleaved [v, e, v, ..., v] like bfs_distances (so the
    MATCH compiler's vertices()/edges()/path_length() slicing applies
    unchanged); otherwise it is vertex-only.  The (cost, path) pair is the relaxation order; with
    strictly positive weights this order has optimal substructure (two
    equal-cost candidates to the same vertex are never prefix-related,
    so extension preserves their lexicographic order), making the
    tie-break deterministic and engine-independent.  NOTE: exact
    tie-breaking relies on exact cost equality — use integer-valued
    weights (float summation order can perturb equal costs by 1 ulp and
    flip which path is 'the' minimum).
    """
    if "weight" not in edges.columns:
        raise ValueError("cheapest_path_distances requires a weight column")
    edges = _prep_edges(edges, num_partitions)
    try:
        if track_paths and max_iters is None:
            # Termination guard: with a ZERO-weight cycle the lexicographic
            # tie-break can descend forever (each lap through the cycle can
            # produce an equal-cost, lexicographically smaller path, e.g.
            # [5,4,9] -> [5,4,2,4,9] -> [5,4,2,4,2,4,9] ...), so __improved
            # never reaches 0.  Strictly positive weights restore optimal
            # substructure (docstring) and bound the loop; verify that up
            # front — one column-pruned min() over the already-persisted edge
            # frame — instead of hanging.  Callers that genuinely want the
            # bounded-lap semantics can pass max_iters explicitly.
            min_w = edges.agg(F.min(F.col("weight").cast("double"))).first()[0]
            if min_w is not None and min_w <= 0:
                raise ValueError(
                    "cheapest_path_distances(track_paths=True) requires strictly "
                    f"positive weights (min weight found: {min_w}); a zero-weight "
                    "cycle makes the equal-cost lexicographic tie-break descend "
                    "forever.  Pass max_iters to bound the relaxation explicitly."
                )
        if sources is None:
            srcs = edges.select("src").union(edges.select(F.col("dst").alias("src"))).distinct()
        else:
            srcs = sources.toDF("src").distinct()
        # seed frame's lineage is a trivial projection over the (possibly
        # user-supplied) source list — no checkpoint needed before round 1;
        # round 1's merge materializes it together with the first relaxation,
        # saving one Spark job per call.
        #
        # NOTE on partitioning (tried and reverted, r3): pre-seeding dist
        # dense (sources x vertices) and merging with a LEFT join was
        # measured SLOWER (10.2 s vs 7.0 s warm at sf0.1) — PySpark's
        # localCheckpoint surfaces the frame as `Scan ExistingRDD
        # UnknownPartitioning(0)`, so a per-round dist exchange is
        # unavoidable at this layer and the dense seed only added upfront
        # jobs.  The per-round cost here is sequential-stage latency
        # (~0.3-0.5 s x optimal-path depth), a local-mode constant that
        # amortizes away on a real cluster where data >> scheduling.
        dist = srcs.select(
            F.col("src"),
            F.col("src").alias("dst"),
            F.lit(0.0).cast("double").alias("cost"),
            *([F.array(F.col("src")).alias("path")] if track_paths else []),
            F.lit(True).alias("__improved"),
        )
        rounds = 0
        while True:
            rounds += 1
            if max_iters is not None and rounds > max_iters:
                break
            # relax only from rows improved last round (the frontier is a
            # zero-cost FILTER over the checkpointed dist, not a separate
            # materialization).  Relaxation emits RAW candidate rows — the
            # min-aggregation happens once, in the union merge below (or
            # between hops when hops_per_round > 1, to bound row growth
            # before the next adjacency join).
            def _relax(frame):
                relaxed = frame.alias("f").join(
                    edges.alias("e"), F.col("f.dst") == F.col("e.src")
                )
                if track_paths:
                    step = (
                        F.array(F.col("e.edge_id"), F.col("e.dst"))
                        if "edge_id" in edges.columns
                        else F.array(F.col("e.dst"))
                    )
                    return relaxed.select(
                        F.col("f.src").alias("src"),
                        F.col("e.dst").alias("dst"),
                        (F.col("f.cost") + F.col("e.weight").cast("double")).alias("cost"),
                        F.concat(F.col("f.path"), step).alias("path"),
                    )
                return relaxed.select(
                    F.col("f.src").alias("src"),
                    F.col("e.dst").alias("dst"),
                    (F.col("f.cost") + F.col("e.weight").cast("double")).alias("cost"),
                )

            def _agg_min(frame):
                # struct min = (cost, path) lexicographic — the order with
                # optimal substructure (see docstring)
                if track_paths:
                    return (
                        frame.groupBy("src", "dst")
                        .agg(F.min(F.struct("cost", "path")).alias("cp"))
                        .select(
                            "src", "dst", F.col("cp.cost").alias("cost"),
                            F.col("cp.path").alias("path"),
                        )
                    )
                return frame.groupBy("src", "dst").agg(F.min("cost").alias("cost"))

            cur = dist.where(F.col("__improved")).select(
                "src", "dst", "cost", *(["path"] if track_paths else [])
            )
            n_hops = max(1, hops_per_round)
            hops = []
            for i in range(n_hops):
                raw = _relax(cur)
                hops.append(raw)
                if i + 1 < n_hops:
                    cur = _agg_min(raw)
            cand = hops[0]
            for h in hops[1:]:
                cand = cand.unionByName(h)
            # UNION merge: old rows and raw candidates flow into ONE
            # groupBy(src, dst) min — one Exchange per round where the old
            # full-outer formulation paid two (candidate pre-aggregation +
            # dist re-shuffle) plus the sort-merge join's two sorts.
            # Map-side partial aggregation performs the same candidate
            # reduction the dropped pre-aggregation did.  The improvement
            # count still rides the checkpoint job -> ONE Spark job/round.
            if track_paths:
                # Tie-break: struct min over (cost, path, __cand) — a
                # strictly cheaper candidate wins; at equal cost a
                # lexicographically smaller path wins; at equal (cost, path)
                # the old row's 0 flag wins, so __cand=1 on the winner is
                # exactly the old `better` predicate.  Candidate cost/path
                # are never NULL here (frontier rows are non-NULL and
                # weights are validated strictly positive above), so struct
                # sort ordering's NULLS-FIRST quirk cannot pick a bogus
                # winner the way an unmatched full-outer side could.
                # NULL-cost candidates (possible only via NULL weights when
                # max_iters skips the positive-weight validation) must LOSE
                # as they did under the old explicit predicate — drop them
                # before the min so NULLS-FIRST cannot crown one.
                merged = (
                    dist.select("src", "dst", "cost", "path")
                    .withColumn("__cand", F.lit(0))
                    .unionByName(
                        cand.where(F.col("cost").isNotNull())
                        .withColumn("__cand", F.lit(1))
                    )
                    .groupBy("src", "dst")
                    .agg(F.min(F.struct("cost", "path", "__cand")).alias("m"))
                    .select(
                        "src", "dst",
                        F.col("m.cost").alias("cost"),
                        F.col("m.path").alias("path"),
                        (F.col("m.__cand") == 1).alias("__improved"),
                    )
                )
            else:
                # Primitive-only aggregates keep this a codegen
                # HashAggregate: min over everything gives the new cost;
                # min over the old row's echo (__oc, NULL on candidates)
                # gives the previous cost, and improvement is
                # "no previous" or "strictly cheaper" — identical to the
                # old `better` predicate including its NULL semantics.
                merged = (
                    dist.select(
                        "src", "dst", "cost", F.col("cost").alias("__oc")
                    )
                    .unionByName(
                        cand.withColumn("__oc", F.lit(None).cast("double"))
                    )
                    .groupBy("src", "dst")
                    .agg(
                        F.min("cost").alias("cost"),
                        F.min("__oc").alias("__oc"),
                    )
                    .select(
                        "src", "dst", "cost",
                        (
                            F.col("__oc").isNull()
                            | (F.col("cost") < F.col("__oc"))
                        ).alias("__improved"),
                    )
                )
            obs = Observation(f"__pgq_bf_{next(_obs_seq)}")
            merged = merged.observe(
                obs, F.sum(F.col("__improved").cast("int")).alias("n")
            )
            dist = materialize(merged)
            if not obs.get["n"]:
                break
        return dist.select(
            "src", "dst", "cost", *(["path"] if track_paths else [])
        )
    finally:
        edges.unpersist()


def integral_keys(df: DataFrame, cols: list[str]) -> bool:
    """True iff every named column has an integral type (usable directly
    as a BFS vertex id); non-integral keys route through the xxhash64
    surrogate instead (reference analog: dense renumbering at CSR build
    supports arbitrary key types, csr_creation.cpp)."""
    types = {f.name.lower(): f.dataType.simpleString() for f in df.schema.fields}
    return all(types.get(c.lower()) in _INTEGRAL_TYPES for c in cols)


def temporal_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    ts_col: str = "ts",
    start_ts: int | None = None,
    num_partitions: int | None = None,
    hops_per_round: int = 1,
    ts_prune: bool = False,
) -> DataFrame:
    """Time-respecting reachability (beyond-reference): earliest arrival
    time at every vertex reachable from each seed along edges whose
    timestamps never decrease — the temporal-graph semantics where an
    edge can only be taken AFTER reaching its source (information/
    contagion spread, payment-flow tracing, event-causality queries).

    Returns (src, dst, arrival): seed, reached vertex, and the earliest
    time the walk can sit on `dst` (the seed itself arrives at
    `start_ts`, or the epoch if unset; unreachable pairs are absent,
    like bfs_distances).

    Label-correcting relaxation on earliest-arrival (arrival times are
    monotone along a walk, so the fixpoint is unique and order-free,
    Bellman-Ford-style).  Two round-count levers make this the cheapest
    shape we measured (r5; the r4 version ran TWO jobs per round and one
    hop per round — 2x17 jobs at sf0.1):
      - the per-pair min merge, the improvement flag and the convergence
        count all ride ONE full-outer merge + checkpoint job per round
        (the Bellman-Ford/Observation template cheapest_path uses);
      - each round relaxes `hops_per_round` adjacency steps inside that
        single job (candidates from hop 1 feed hop 2 lazily, each hop
        min-aggregated to keep the join fan-in bounded), so the round
        count is ceil(longest time-respecting path / hops_per_round).
        Default 1 (re-measured round 10 on the r10 reference host,
        median-of-3 fresh sessions): fused multi-hop is a NET LOSS here —
        sf0.1 group wall 7.2 s (hops=1) vs 10.0 s (4) vs 12.9 s (2), sf1
        temporal_reach solo 17.6 s (1) vs 30.3 s (4) — and hops>1 runs
        are far noisier (single group runs up to 40 s: the deep fused
        plan re-relaxes every hop-k candidate, not just improved pairs,
        so candidate volume grows with reach instead of with the
        improving frontier).  The knob stays for graphs whose frontier
        SHRINKS with depth (long sparse temporal chains), where fusing
        genuinely halves the merge count; an earlier host measured
        hops=4 at 11.2 s vs 17.2 s (hops=2) at sf1 — the trade is
        host- and graph-dependent, so the default is the stable end.

    `ts_prune` (round 10, default off): per round, pre-filter the
    adjacency to `ts >= min arrival over the improved frontier` — an
    EXACT monotone-label bound (every frontier pair relaxes only edges
    with ts >= its own arrival >= that minimum), whose scalar rides the
    round's existing Observation for free.  Measured NEGATIVE at
    in-memory bench scales — the changing per-round literal recompiles
    the round's codegen, costing more than the cached-batch skipping
    saves (sf0.1: 7.1 -> 11.0 s, sf1: 11.2 -> 11.7 s) — hence opt-in.
    Turn it on when the adjacency is a ts-range-partitioned standing
    table at real scale: there the same predicate is genuine partition
    pruning (whole files never opened), a different cost regime from a
    row-filter over an in-memory cache.  The cached adjacency is sorted
    within partitions by ts either way, so the in-memory batch stats
    are tight whenever the filter IS on.
    Rounds remain frontier-driven: only pairs improved last round are
    re-relaxed.  Same scale shape as cheapest_path: adjacency
    checkpointed hash-partitioned by src, frontier-only shuffle.

    Adjacency layout: `.persist()` (NOT localCheckpoint) on purpose — a
    checkpointed frame surfaces as `Scan ExistingRDD UnknownPartitioning`
    so every round re-shuffles the static edge set, while a persisted
    InMemoryRelation KEEPS its HashPartitioning(src) and Catalyst skips
    the adjacency-side exchange in every hop join (only the small
    frontier side shuffles).  Lineage depth is not a concern here: the
    adjacency is a one-step projection, not an iterated frame.
    (Negative result, r5: broadcasting the adjacency instead was 1.5-6x
    SLOWER at sf0.1 — F.broadcast over a checkpointed frame re-collects
    and re-ships it on every round's query; do not retry.)
    """
    parts = num_partitions or default_parallelism(edges.sparkSession)
    adj = (
        edges.select("src", "dst", F.col(ts_col).cast("long").alias("__ts"))
        .repartition(parts, "src")
        # Sorting each cached partition by __ts gives the in-memory
        # columnar cache tight per-batch (min,max) __ts stats, so the
        # per-round monotone-bound filter below (`__ts >= bound`) skips
        # whole cached batches instead of row-filtering them — the
        # in-memory analog of time-bucketed partition pruning.  An
        # intra-partition sort: HashPartitioning(src) is preserved, the
        # hop join still skips the adjacency-side exchange.
        .sortWithinPartitions("__ts")
        .persist()
    )
    t0 = F.lit(int(start_ts)) if start_ts is not None else F.lit(0)
    dist = seeds.toDF("vid").distinct().select(
        F.col("vid").alias("src"),
        F.col("vid").alias("dst"),
        t0.cast("long").alias("arrival"),
        F.lit(True).alias("__improved"),
    )
    try:
        return _temporal_fixpoint(adj, dist, hops_per_round, ts_prune)
    finally:
        adj.unpersist()


def write_temporal_index(
    edges: DataFrame,
    path: str,
    ts_col: str = "ts",
    n_buckets: int = 16,
) -> None:
    """Materialize a ts-range-bucketed STANDING adjacency on disk: the
    edge set rewritten PARTITIONED BY an equal-width timestamp bucket
    (one directory per bucket) plus a one-row bounds parquet — the
    temporal analog of similarity.write_ivf_index (layout paid once,
    every traversal afterwards amortizes it).

    Why this layout: temporal_reachability's per-round monotone bound
    (every frontier pair relaxes only edges with ts >= its own arrival
    >= the round's minimum improved arrival) is EXACT, but as an
    in-memory row filter it measured NEGATIVE in r10 (the changing
    per-round literal recompiles the round's codegen for less than the
    cached-batch skipping saves).  Against this standing table the same
    predicate becomes FILE-LEVEL partition pruning — bucket directories
    wholly below the bound are never opened (PartitionFilters in the
    scan, pinned by test_paths), plus a pushed min/max row-group filter
    inside the boundary bucket — a different cost regime: at 100 TB a
    late round reads nprobe-like slices of the edge set instead of all
    of it.  Within each bucket directory rows are sorted by __ts so the
    residual `__ts >= bound` predicate skips whole row groups too.
    """
    from pyspark.sql import Row

    e = edges.select("src", "dst", F.col(ts_col).cast("long").alias("__ts"))
    lo, hi = e.agg(F.min("__ts"), F.max("__ts")).first()
    if lo is None:  # empty edge set: one empty bucket, degenerate meta
        lo, hi = 0, 0
    width = max(1, (int(hi) - int(lo)) // int(n_buckets) + 1)
    spark = edges.sparkSession
    spark.createDataFrame(
        [Row(lo=int(lo), width=int(width), n_buckets=int(n_buckets))],
        "lo long, width long, n_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    (
        e.withColumn(
            "__tsb", F.expr(f"CAST((__ts - {int(lo)}) DIV {width} AS INT)")
        )
        .sortWithinPartitions("__tsb", "__ts")
        .write.mode("overwrite")
        .partitionBy("__tsb")
        .parquet(f"{path}/edges")
    )


_TEMPORAL_META_CACHE: dict = {}


def _temporal_index_scan(spark, path: str, lo: int, width: int, bound,
                         base: DataFrame | None = None):
    """One relaxation round's adjacency scan over a write_temporal_index
    directory: `__tsb >= bucket(bound)` is static partition pruning
    (PartitionFilters — bucket directories below the bound are never
    opened; plan-pinned in test_paths), `__ts >= bound` the pushed
    residual filter inside the boundary bucket.  Pass `base` (the
    relation read once) to share one file index across rounds instead of
    re-listing the directory every round."""
    scan = base if base is not None else spark.read.parquet(f"{path}/edges")
    if bound is not None:
        b = (int(bound) - lo) // width
        if b > 0:
            scan = scan.where(F.col("__tsb") >= b)
        scan = scan.where(F.col("__ts") >= int(bound))
    return scan.select("src", "dst", "__ts")


def temporal_reachability_from_index(
    spark,
    path: str,
    seeds: DataFrame,
    start_ts: int | None = None,
) -> DataFrame:
    """temporal_reachability against a `write_temporal_index` directory:
    value-identical to the in-memory kernel (same fixpoint, same merge
    and fold order, so the oracle is shared), but each round re-plans
    its adjacency scan as

        __tsb >= bucket(bound)  AND  __ts >= bound

    where `bound` is the round's minimum improved arrival (riding the
    existing Observation for free).  The first predicate is static
    partition pruning — bucket directories below the bound are never
    opened — the second a pushed parquet filter that min/max-skips row
    groups inside the boundary bucket.  EXACT: every frontier pair
    (s, u, a) only relaxes edges with ts >= a >= bound, so no candidate
    is lost (see _temporal_fixpoint).

    Bucket metadata is contract-small standing state (one row), cached
    driver-side per (path, mtime) like the IVF centroid cache; non-local
    paths (no mtime) skip the cache rather than risk staleness.
    """
    import os

    mdir = f"{path}/meta"
    try:
        mkey = (mdir, os.path.getmtime(mdir))
    except OSError:
        mkey = None
    meta = _TEMPORAL_META_CACHE.get(mkey) if mkey is not None else None
    if meta is None:
        r = spark.read.parquet(mdir).first()
        meta = (int(r["lo"]), int(r["width"]))
        if mkey is not None:
            _TEMPORAL_META_CACHE.clear()  # bounded: one standing index at a time
            _TEMPORAL_META_CACHE[mkey] = meta
    lo, width = meta

    # read the relation ONCE: every round's filter re-plans against the
    # same cached file index (partition pruning still happens per round at
    # planning time) instead of paying a fresh directory listing + schema
    # read per round (guide §6 file-listing cost is driver-side)
    base = spark.read.parquet(f"{path}/edges")

    def adj_for_bound(bound):
        return _temporal_index_scan(spark, path, lo, width, bound, base=base)

    t0 = F.lit(int(start_ts)) if start_ts is not None else F.lit(0)
    dist = seeds.toDF("vid").distinct().select(
        F.col("vid").alias("src"),
        F.col("vid").alias("dst"),
        t0.cast("long").alias("arrival"),
        F.lit(True).alias("__improved"),
    )
    return _temporal_fixpoint(None, dist, 1, adj_for_bound=adj_for_bound)


def _temporal_fixpoint(adj, dist, hops_per_round, ts_prune=False,
                       adj_for_bound=None):
    # Monotone-label bound: every frontier pair (s, u, a) relaxes only
    # edges with ts >= a >= (min arrival over the frontier), so the
    # adjacency can be pre-filtered each round with that scalar — EXACT
    # pruning (no candidate is lost), and the scalar rides the round's
    # existing Observation for free.  Within a round's chained hops
    # arrivals only grow, so one bound covers all hops.  Applied only
    # under `ts_prune` (see temporal_reachability's docstring for the
    # measured in-memory negative result and the partition-pruning
    # regime it exists for).
    bound = None
    while True:
        frontier = dist.where(F.col("__improved")).select("src", "dst", "arrival")
        if adj_for_bound is not None:
            # standing-index route: the bound becomes partition pruning on
            # the ts-bucketed scan (see temporal_reachability_from_index)
            adj_r = adj_for_bound(bound)
        elif ts_prune and bound is not None:
            adj_r = adj.where(F.col("__ts") >= F.lit(bound))
        else:
            adj_r = adj
        hops = []
        cur = frontier
        for _ in range(max(1, hops_per_round)):
            cur = (
                cur.alias("f")
                .join(adj_r.alias("e"), F.col("f.dst") == F.col("e.src"))
                .where(F.col("e.__ts") >= F.col("f.arrival"))
                .select(
                    F.col("f.src").alias("src"),
                    F.col("e.dst").alias("dst"),
                    F.col("e.__ts").alias("arrival"),
                )
                .groupBy("src", "dst")
                .agg(F.min("arrival").alias("arrival"))
            )
            hops.append(cur)
        cand = hops[0]
        for h in hops[1:]:
            cand = cand.unionByName(h)
        if len(hops) > 1:
            cand = cand.groupBy("src", "dst").agg(F.min("arrival").alias("arrival"))
        better = F.col("c.arrival").isNotNull() & (
            F.col("d.arrival").isNull()
            | (F.col("c.arrival") < F.col("d.arrival"))
        )
        merged = (
            dist.select("src", "dst", "arrival").alias("d")
            .join(
                cand.alias("c"),
                (F.col("d.src") == F.col("c.src"))
                & (F.col("d.dst") == F.col("c.dst")),
                "full_outer",
            )
            .select(
                F.coalesce(F.col("d.src"), F.col("c.src")).alias("src"),
                F.coalesce(F.col("d.dst"), F.col("c.dst")).alias("dst"),
                F.when(better, F.col("c.arrival"))
                .otherwise(F.col("d.arrival"))
                .alias("arrival"),
                better.alias("__improved"),
            )
        )
        obs = Observation(f"__pgq_tr_{next(_obs_seq)}")
        merged = merged.observe(
            obs,
            F.sum(F.col("__improved").cast("int")).alias("n"),
            F.min(F.when(F.col("__improved"), F.col("arrival"))).alias("minarr"),
        )
        dist = materialize(merged)
        if not obs.get["n"]:
            return dist.select("src", "dst", "arrival")
        bound = obs.get["minarr"]


def temporal_latest_departure(
    edges: DataFrame,
    targets: DataFrame,
    ts_col: str = "ts",
    horizon: int = 0,
    **kw,
) -> DataFrame:
    """Latest-departure dual of temporal_reachability: for each target,
    the LATEST time a walk may leave each vertex and still reach the
    target along non-decreasing edge timestamps by `horizon` — "how
    long can this node wait before the last feasible route closes",
    the deadline-side question of temporal-graph analysis.

    Computed on the TIME-REVERSED graph (edges flipped, ts' =
    horizon - ts): earliest arrival there equals horizon minus the
    latest departure here, so the verified earliest-arrival kernel does
    all the work.  Returns (target, vid, latest_departure); vertices
    with no feasible route are absent.  Same cost model and levers
    (hops_per_round) as temporal_reachability.
    """
    rev = edges.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        (F.lit(int(horizon)) - F.col(ts_col)).alias("__rts"),
    )
    ea = temporal_reachability(rev, targets, ts_col="__rts", **kw)
    return ea.select(
        F.col("src").alias("target"),
        F.col("dst").alias("vid"),
        (F.lit(int(horizon)) - F.col("arrival")).alias("latest_departure"),
    )
