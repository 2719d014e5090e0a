"""Gelly Graph API facade — SURVEY.md §2.13.

Reference: flink-gelly org/apache/flink/graph/Graph.java (the ~1800-LoC
user-facing graph abstraction: vertex/edge DataSets + transform methods).
The library algorithms live in operators/graph.py; THIS module mirrors the
Graph class's own surface — construction, map/translate/join/filter
transforms, degrees, set operations, neighborhood aggregations, validation,
and the three iteration entry points.

Representation: ``vertices`` is a DataFrame (id, value); ``edges`` is a
DataFrame (src, dst, value) — the exact Vertex<K, VV> / Edge<K, K, EV>
tuple shapes. Value columns may hold any Spark type (Gelly's VV/EV); a
missing value is a SQL NULL (Gelly's NullValue).

Everything is lazy DataFrame composition — each method returns a new Graph
over transformed frames; nothing collects. Degree methods keep
zero-degree vertices (Graph.java outDegrees coGroups against the vertex
set), filters re-validate edge endpoints (subgraph semantics), and set
operations replicate the reference's exact dedup rules (union dedups
vertices only; intersect matches on the full (src, dst, value) triple).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from flink_1_6_0_spark.operators import graph as galgo


class Graph:
    """Gelly ``Graph<K, VV, EV>`` (Graph.java:95)."""

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        for col in ("id", "value"):
            if col not in vertices.columns:
                raise ValueError(f"vertices must have column {col!r}")
        for col in ("src", "dst", "value"):
            if col not in edges.columns:
                raise ValueError(f"edges must have column {col!r}")
        self.vertices = vertices.select("id", "value")
        self.edges = edges.select("src", "dst", "value")

    # -- construction (Graph.fromDataSet overloads, Graph.java:171-260) ------

    @staticmethod
    def from_dataset(edges: DataFrame, vertex_initializer=None) -> "Graph":
        """Graph.fromDataSet(edges[, vertexValueInitializer]): vertex set =
        distinct edge endpoints; value = initializer(id) or NULL."""
        if "value" not in edges.columns:
            edges = edges.withColumn("value", F.lit(None))
        ids = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        value = vertex_initializer(F.col("id")) if vertex_initializer else F.lit(None)
        return Graph(ids.withColumn("value", value), edges)

    @staticmethod
    def from_csv(
        spark,
        edges_path: str,
        vertices_path: str | None = None,
        vertex_initializer=None,
    ) -> "Graph":
        """Graph.fromCsvReader (GraphCsvReader.java): edge CSV (src, dst[,
        value]); optional vertex CSV (id, value). Headerless, comma-delim —
        the reference's defaults."""
        e = spark.read.csv(edges_path, inferSchema=True)
        if len(e.columns) not in (2, 3):
            raise ValueError(
                f"edge CSV must have 2 (src,dst) or 3 (src,dst,value) fields, got {len(e.columns)}"
            )
        e = e.toDF(*["src", "dst", "value"][: len(e.columns)])
        if vertices_path is None:
            return Graph.from_dataset(e, vertex_initializer)
        v = spark.read.csv(vertices_path, inferSchema=True)
        if len(v.columns) != 2:
            raise ValueError(f"vertex CSV must have 2 (id,value) fields, got {len(v.columns)}")
        v = v.toDF("id", "value")
        if "value" not in e.columns:
            e = e.withColumn("value", F.lit(None))
        return Graph(v, e)

    def run(self, algorithm):
        """Graph.run(GraphAlgorithm) — apply a library algorithm or analytic
        to this graph; ``algorithm`` is any callable of (vertices, edges)."""
        return algorithm(self.vertices, self.edges)

    # -- accessors -----------------------------------------------------------

    def get_vertices(self) -> DataFrame:
        return self.vertices

    def get_edges(self) -> DataFrame:
        return self.edges

    def get_triplets(self) -> DataFrame:
        """Graph.getTriplets: (src_id, dst_id, src_value, dst_value,
        edge_value) — two joins against the vertex set."""
        sv = self.vertices.select(F.col("id").alias("src"), F.col("value").alias("src_value"))
        tv = self.vertices.select(F.col("id").alias("dst"), F.col("value").alias("dst_value"))
        return (
            self.edges.withColumnRenamed("value", "edge_value")
            .join(sv, "src")
            .join(tv, "dst")
            .select("src", "dst", "src_value", "dst_value", "edge_value")
        )

    def number_of_vertices(self) -> int:
        return self.vertices.count()

    def number_of_edges(self) -> int:
        return self.edges.count()

    # -- map / translate (Graph.java:380-520) --------------------------------

    def map_vertices(self, expr) -> "Graph":
        """mapVertices: new value = expr(id, value) — pass a Column built
        from F.col('id') / F.col('value')."""
        return Graph(self.vertices.withColumn("value", expr), self.edges)

    def map_edges(self, expr) -> "Graph":
        return Graph(self.vertices, self.edges.withColumn("value", expr))

    def translate_graph_ids(self, fn) -> "Graph":
        """translateGraphIds: fn is Column → Column applied to id, src, dst."""
        return Graph(
            self.vertices.withColumn("id", fn(F.col("id"))),
            self.edges.withColumn("src", fn(F.col("src"))).withColumn(
                "dst", fn(F.col("dst"))
            ),
        )

    def translate_vertex_values(self, fn) -> "Graph":
        return Graph(self.vertices.withColumn("value", fn(F.col("value"))), self.edges)

    def translate_edge_values(self, fn) -> "Graph":
        return Graph(self.vertices, self.edges.withColumn("value", fn(F.col("value"))))

    # -- joins (Graph.java:523-700) ------------------------------------------

    def join_with_vertices(self, inputs: DataFrame, fn) -> "Graph":
        """joinWithVertices: inputs (id, val); matched vertices get
        fn(old_value, new_val), unmatched keep their value (the reference's
        coGroup emits the original when the input side is empty). Duplicate
        input ids apply ONE arbitrary row (the reference consumes only the
        first of the coGroup iterator — equally order-dependent); a match
        whose value is NULL still counts as a match (join marker, not a
        value-null test)."""
        j = self.vertices.join(
            inputs.select(F.col("id"), F.col(inputs.columns[1]).alias("__new"))
            .dropDuplicates(["id"])
            .withColumn("__hit", F.lit(True)),
            "id",
            "left",
        )
        value = F.when(F.col("__hit"), fn(F.col("value"), F.col("__new"))).otherwise(
            F.col("value")
        )
        return Graph(j.select("id", value.alias("value")), self.edges)

    def _join_edges(self, inputs: DataFrame, fn, keys: list[str]) -> "Graph":
        in_cols = inputs.columns
        sel = [F.col(c).alias(k) for c, k in zip(in_cols[: len(keys)], keys)]
        sel.append(F.col(in_cols[len(keys)]).alias("__new"))
        j = self.edges.join(
            inputs.select(*sel).dropDuplicates(keys).withColumn("__hit", F.lit(True)),
            keys,
            "left",
        )
        value = F.when(F.col("__hit"), fn(F.col("value"), F.col("__new"))).otherwise(
            F.col("value")
        )
        return Graph(self.vertices, j.select("src", "dst", value.alias("value")))

    def join_with_edges(self, inputs: DataFrame, fn) -> "Graph":
        """joinWithEdges: inputs (src, dst, val) matched on both endpoints."""
        return self._join_edges(inputs, fn, ["src", "dst"])

    def join_with_edges_on_source(self, inputs: DataFrame, fn) -> "Graph":
        return self._join_edges(inputs, fn, ["src"])

    def join_with_edges_on_target(self, inputs: DataFrame, fn) -> "Graph":
        return self._join_edges(inputs, fn, ["dst"])

    # -- filters (Graph.java:703-760) ----------------------------------------

    def subgraph(self, vertex_predicate, edge_predicate) -> "Graph":
        """subgraph: filter vertices AND edges; surviving edges must also
        keep both endpoints in the surviving vertex set (two semi-joins —
        one shuffle each, no fan-out)."""
        v = self.vertices.filter(vertex_predicate)
        ids = v.select("id")
        e = (
            self.edges.filter(edge_predicate)
            .join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst", "value")
        )
        return Graph(v, e)

    def filter_on_vertices(self, vertex_predicate) -> "Graph":
        return self.subgraph(vertex_predicate, F.lit(True))

    def filter_on_edges(self, edge_predicate) -> "Graph":
        return Graph(self.vertices, self.edges.filter(edge_predicate))

    # -- degrees (Graph.java:764-800) ----------------------------------------

    def _degrees(self, key: str) -> DataFrame:
        deg = self.edges.groupBy(F.col(key).alias("id")).agg(F.count("*").alias("degree"))
        return (
            self.vertices.select("id")
            .join(deg, "id", "left")
            .select("id", F.coalesce("degree", F.lit(0)).alias("degree"))
        )

    def out_degrees(self) -> DataFrame:
        """outDegrees — zero-degree vertices included (coGroup semantics)."""
        return self._degrees("src")

    def in_degrees(self) -> DataFrame:
        return self._degrees("dst")

    def get_degrees(self) -> DataFrame:
        """getDegrees = outDegrees of the undirected graph (in + out)."""
        both = self.edges.select(F.col("src").alias("id")).union(
            self.edges.select(F.col("dst").alias("id"))
        )
        deg = both.groupBy("id").agg(F.count("*").alias("degree"))
        return (
            self.vertices.select("id")
            .join(deg, "id", "left")
            .select("id", F.coalesce("degree", F.lit(0)).alias("degree"))
        )

    # -- direction / structure (Graph.java:803-830) --------------------------

    def reverse(self) -> "Graph":
        return Graph(
            self.vertices,
            self.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "value"
            ),
        )

    def get_undirected(self) -> "Graph":
        """getUndirected: edges ∪ reversed edges (duplicates kept, as in the
        reference)."""
        return Graph(self.vertices, self.edges.unionByName(self.reverse().edges))

    # -- add / remove (Graph.java:1030-1180) ---------------------------------

    def add_vertices(self, new_vertices: DataFrame) -> "Graph":
        """addVertices: existing vertices win on id collision
        (VerticesUnionCoGroup keeps the original)."""
        fresh = new_vertices.select("id", "value").join(
            self.vertices.select("id"), "id", "left_anti"
        )
        return Graph(self.vertices.unionByName(fresh), self.edges)

    def add_edges(self, new_edges: DataFrame) -> "Graph":
        """addEdge adds missing endpoint vertices (NULL value) alongside the
        edges."""
        if "value" not in new_edges.columns:
            new_edges = new_edges.withColumn("value", F.lit(None))
        new_edges = new_edges.select("src", "dst", "value")
        endpoints = (
            new_edges.select(F.col("src").alias("id"))
            .union(new_edges.select(F.col("dst").alias("id")))
            .distinct()
            .withColumn("value", F.lit(None))
        )
        return self.add_vertices(endpoints)._with_edges(
            self.edges.unionByName(new_edges)
        )

    def _with_edges(self, edges: DataFrame) -> "Graph":
        return Graph(self.vertices, edges)

    def remove_vertices(self, to_remove: DataFrame) -> "Graph":
        """removeVertices: drop matching ids and ALL incident edges."""
        ids = to_remove.select("id")
        v = self.vertices.join(ids, "id", "left_anti")
        e = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst", "value")
        )
        return Graph(v, e)

    def remove_edges(self, to_remove: DataFrame) -> "Graph":
        """removeEdges: drop every edge matching (src, dst) — the reference
        removes all copies regardless of value (Graph.java removeEdge)."""
        return Graph(
            self.vertices,
            self.edges.join(to_remove.select("src", "dst"), ["src", "dst"], "left_anti"),
        )

    # -- set operations (Graph.java:1183-1280) -------------------------------

    def union(self, other: "Graph") -> "Graph":
        """union: vertices deduped on the full (id, value) tuple; edges
        concatenated with duplicates kept (Graph.java:1185-1199)."""
        return Graph(
            self.vertices.unionByName(other.vertices).distinct(),
            self.edges.unionByName(other.edges),
        )

    def difference(self, other: "Graph") -> "Graph":
        """difference = removeVertices(other.vertices) (Graph.java:1207)."""
        return self.remove_vertices(other.vertices)

    def intersect(self, other: "Graph", distinct_edges: bool = True) -> "Graph":
        """intersect: edges equal on (src, dst, value) in both graphs;
        vertices rebuilt from the surviving endpoints with NULL values.
        ``distinct_edges=True`` dedups; False keeps pairwise matches (each
        copy on one side consumes one copy on the other — replicated with
        per-copy sequence numbers, one window each side). NULL edge values
        compare EQUAL (the reference's NullValue is a real value; a plain
        equi-join on value would make every facade-default graph intersect
        to empty), via a null-safe join condition."""
        ob = other.edges.select(
            F.col("src").alias("__s"), F.col("dst").alias("__d"), F.col("value").alias("__v")
        )
        cond = (
            (F.col("src") == F.col("__s"))
            & (F.col("dst") == F.col("__d"))
            & F.col("value").eqNullSafe(F.col("__v"))
        )
        if distinct_edges:
            matched = self.edges.join(ob, cond, "left_semi").distinct()
        else:
            w = Window.partitionBy("src", "dst", "value").orderBy(F.monotonically_increasing_id())
            a = self.edges.withColumn("__n", F.row_number().over(w))
            wb = Window.partitionBy("__s", "__d", "__v").orderBy(F.monotonically_increasing_id())
            b = ob.withColumn("__n2", F.row_number().over(wb))
            matched = a.join(b, cond & (F.col("__n") == F.col("__n2")), "left_semi").drop("__n")
        return Graph.from_dataset(matched)

    # -- validation (Graph.validate, validation/InvalidVertexIdsValidator) ---

    def validate(self) -> bool:
        """True iff every edge endpoint id exists in the vertex set."""
        ids = self.vertices.select("id")
        bad = (
            self.edges.select(F.col("src").alias("id"))
            .union(self.edges.select(F.col("dst").alias("id")))
            .join(ids, "id", "left_anti")
        )
        return bad.isEmpty()

    # -- neighborhood aggregations (Graph.java:840-1020, 1430-1520) ----------

    def _incident(self, direction: str) -> DataFrame:
        """Edges keyed by the owning vertex per EdgeDirection (IN/OUT/ALL)."""
        out_e = self.edges.select(F.col("src").alias("id"), F.col("dst").alias("nb"), "value")
        in_e = self.edges.select(F.col("dst").alias("id"), F.col("src").alias("nb"), "value")
        if direction == "out":
            return out_e
        if direction == "in":
            return in_e
        if direction == "all":
            return out_e.unionByName(in_e)
        raise ValueError(f"direction must be in|out|all, got {direction!r}")

    def reduce_on_edges(self, agg_fn, direction: str = "out") -> DataFrame:
        """reduceOnEdges: per-vertex aggregate of incident EDGE values —
        agg_fn maps the edge-value Column to an aggregate Column
        (e.g. F.min). Returns (id, agg_value)."""
        return (
            self._incident(direction)
            .groupBy("id")
            .agg(agg_fn(F.col("value")).alias("agg_value"))
        )

    def reduce_on_neighbors(self, agg_fn, direction: str = "out") -> DataFrame:
        """reduceOnNeighbors: per-vertex aggregate of NEIGHBOR vertex values.
        One join to fetch neighbor values, one aggregation."""
        nbr_vals = self._incident(direction).join(
            self.vertices.select(F.col("id").alias("nb"), F.col("value").alias("nb_value")),
            "nb",
        )
        return nbr_vals.groupBy("id").agg(agg_fn(F.col("nb_value")).alias("agg_value"))

    def group_reduce_on_edges(self, fn, schema, direction: str = "out") -> DataFrame:
        """groupReduceOnEdges: arbitrary per-vertex function over the full
        incident edge group — the escape hatch for non-algebraic
        aggregations, Arrow-batched via applyInPandas. fn(pdf) → pdf over
        columns (id, nb, value)."""
        return self._incident(direction).groupBy("id").applyInPandas(fn, schema)

    # -- iterations (Graph.java:1540-1700) -----------------------------------

    def run_vertex_centric_iteration(self, message_fn, update_fn, iterations: int, **kw) -> DataFrame:
        """runVertexCentricIteration — state is (id, value); the user fns see
        exactly those columns (operators/graph.run_vertex_centric contract)."""
        return galgo.run_vertex_centric(
            self.vertices, self.edges, message_fn, update_fn, iterations, **kw
        )

    def run_gather_sum_apply_iteration(
        self, gather_fn, sum_fn, apply_fn, iterations: int, **kw
    ) -> DataFrame:
        """runGatherSumApplyIteration — the edge 'value' column rides into
        the neighbor view as payload."""
        return galgo.run_gather_sum_apply(
            self.vertices, self.edges, gather_fn, sum_fn, apply_fn, iterations, **kw
        )

    def run_scatter_gather_iteration(self, scatter_fn, gather_fn, iterations: int, **kw) -> DataFrame:
        return galgo.run_scatter_gather(
            self.vertices, self.edges, scatter_fn, gather_fn, iterations, **kw
        )
