"""Gelly Graph API facade tests (graph_api.py vs Graph.java semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_6_0_spark.graph_api import Graph


def _g(spark) -> Graph:
    # directed square with a chord: 0→1→2→3→0, 0→2; vertex values = id*10
    v = spark.createDataFrame([(i, i * 10) for i in range(4)], "id long, value long")
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0), (3, 0, 4.0), (0, 2, 5.0)],
        "src long, dst long, value double",
    )
    return Graph(v, e)


def test_from_dataset_builds_vertices_from_endpoints(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    g = Graph.from_dataset(e, vertex_initializer=lambda i: i * 2)
    assert {(r.id, r.value) for r in g.vertices.collect()} == {(1, 2), (2, 4), (3, 6)}
    assert g.number_of_vertices() == 3 and g.number_of_edges() == 2


def test_triplets_and_degrees(spark):
    g = _g(spark)
    t = {(r.src, r.dst, r.src_value, r.dst_value, r.edge_value) for r in g.get_triplets().collect()}
    assert (0, 1, 0, 10, 1.0) in t and len(t) == 5
    assert dict(g.out_degrees().collect()) == {0: 2, 1: 1, 2: 1, 3: 1}
    assert dict(g.in_degrees().collect()) == {0: 1, 1: 1, 2: 2, 3: 1}
    assert dict(g.get_degrees().collect()) == {0: 3, 1: 2, 2: 3, 3: 2}
    # isolated vertices keep degree 0 (coGroup semantics, Graph.java:764)
    iso = Graph(
        spark.createDataFrame([(9, None)], "id long, value long"),
        spark.createDataFrame([], "src long, dst long, value long"),
    )
    assert dict(iso.out_degrees().collect()) == {9: 0}


def test_map_translate_and_edge_joins(spark):
    g = _g(spark)
    assert dict(g.map_vertices(F.col("value") + 1).vertices.collect()) == {
        0: 1, 1: 11, 2: 21, 3: 31,
    }
    g2 = g.translate_graph_ids(lambda c: c + 100)
    assert {r.src for r in g2.edges.collect()} == {100, 101, 102, 103}
    upd = spark.createDataFrame([(0, 5), (9, 9)], "id long, v long")
    j = g.join_with_vertices(upd, lambda old, new: old + new)
    assert dict(j.vertices.collect()) == {0: 5, 1: 10, 2: 20, 3: 30}  # unmatched keep value
    esrc = spark.createDataFrame([(0, 10.0)], "src long, v double")
    je = g.join_with_edges_on_source(esrc, lambda old, new: old * new)
    got = {(r.src, r.dst): r.value for r in je.edges.collect()}
    assert got[(0, 1)] == 10.0 and got[(0, 2)] == 50.0 and got[(1, 2)] == 2.0


def test_subgraph_revalidates_endpoints(spark):
    g = _g(spark)
    sub = g.filter_on_vertices(F.col("id") != 3)
    assert {(r.src, r.dst) for r in sub.edges.collect()} == {(0, 1), (1, 2), (0, 2)}
    sub2 = g.subgraph(F.col("id") != 3, F.col("value") < 5.0)
    assert {(r.src, r.dst) for r in sub2.edges.collect()} == {(0, 1), (1, 2)}
    assert g.filter_on_edges(F.col("value") >= 4.0).number_of_edges() == 2


def test_reverse_undirected_add_remove(spark):
    g = _g(spark)
    assert {(r.src, r.dst) for r in g.reverse().edges.collect()} == {
        (1, 0), (2, 1), (3, 2), (0, 3), (2, 0),
    }
    assert g.get_undirected().number_of_edges() == 10
    added = g.add_vertices(spark.createDataFrame([(0, 99), (7, 70)], "id long, value long"))
    got = dict(added.vertices.collect())
    assert got[0] == 0 and got[7] == 70  # existing vertex wins on collision
    ae = g.add_edges(spark.createDataFrame([(7, 8, None)], "src long, dst long, value double"))
    assert ae.number_of_edges() == 6 and ae.validate()
    rm = g.remove_vertices(spark.createDataFrame([(0, None)], "id long, value long"))
    assert rm.number_of_vertices() == 3
    assert {(r.src, r.dst) for r in rm.edges.collect()} == {(1, 2), (2, 3)}
    re = g.remove_edges(spark.createDataFrame([(0, 2)], "src long, dst long"))
    assert re.number_of_edges() == 4


def test_set_operations_reference_semantics(spark):
    g = _g(spark)
    h = Graph(
        spark.createDataFrame([(2, 20), (3, 30), (5, 50)], "id long, value long"),
        spark.createDataFrame([(2, 3, 3.0), (2, 3, 3.0), (5, 2, 9.0)], "src long, dst long, value double"),
    )
    u = g.union(h)
    assert u.number_of_vertices() == 5  # (2,20)/(3,30) dedup against g's
    assert u.number_of_edges() == 8  # edge duplicates kept
    d = g.difference(h)
    assert {r.id for r in d.vertices.collect()} == {0, 1}
    assert {(r.src, r.dst) for r in d.edges.collect()} == {(0, 1)}
    i = g.intersect(h, distinct_edges=True)
    assert {(r.src, r.dst) for r in i.edges.collect()} == {(2, 3)}
    assert {r.id for r in i.vertices.collect()} == {2, 3}
    # pairwise: g has one (2,3,3.0) copy, h has two → exactly one match
    ip = g.intersect(h, distinct_edges=False)
    assert ip.number_of_edges() == 1


def test_validate_and_neighborhood_aggregations(spark):
    g = _g(spark)
    assert g.validate()
    bad = Graph(g.vertices, g.edges.union(
        spark.createDataFrame([(0, 42, 0.0)], "src long, dst long, value double")
    ))
    assert not bad.validate()
    # min incident edge value, Gelly's reduceOnEdges example
    assert dict(g.reduce_on_edges(F.min, "out").collect()) == {0: 1.0, 1: 2.0, 2: 3.0, 3: 4.0}
    assert dict(g.reduce_on_edges(F.max, "all").collect()) == {0: 5.0, 1: 2.0, 2: 5.0, 3: 4.0}
    # sum of out-neighbor values, Gelly's reduceOnNeighbors example
    assert dict(g.reduce_on_neighbors(F.sum, "out").collect()) == {
        0: 30, 1: 20, 2: 30, 3: 0,
    }


def test_group_reduce_on_edges_arrow_path(spark):
    g = _g(spark)

    def top_edge(pdf):
        m = pdf.loc[pdf["value"].idxmax()]
        return pdf.iloc[:1].assign(id=pdf["id"].iloc[0], nb=m["nb"], value=m["value"])

    out = g.group_reduce_on_edges(top_edge, "id long, nb long, value double", "out")
    assert {(r.id, r.nb) for r in out.collect()} == {(0, 2), (1, 2), (2, 3), (3, 0)}


def test_vertex_centric_through_facade(spark):
    # min-id propagation over the square: all converge to 0
    g = Graph(
        spark.createDataFrame([(i, i) for i in range(4)], "id long, value long"),
        spark.createDataFrame(
            [(0, 1, None), (1, 2, None), (2, 3, None), (3, 0, None)],
            "src long, dst long, value string",
        ),
    ).get_undirected()

    def message_fn(state, edges):
        return (
            edges.select("src", "dst")
            .join(state.select(F.col("id").alias("src"), F.col("value").alias("v")), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("v").alias("m"))
        )

    def update_fn(state, msgs):
        return state.join(msgs, "id", "left").select(
            "id", F.least("value", "m").alias("value")
        )

    out = g.run_vertex_centric_iteration(message_fn, update_fn, 4)
    assert {r.value for r in out.collect()} == {0}


def test_from_csv_and_run(spark, tmp_path):
    ep = str(tmp_path / "edges.csv")
    with open(ep, "w") as f:
        f.write("0,1\n1,2\n2,0\n")
    g = Graph.from_csv(spark, ep)
    assert g.number_of_vertices() == 3 and g.number_of_edges() == 3
    # run() a library algorithm over the facade graph
    from flink_1_6_0_spark.operators.graph import vertex_metrics

    r = g.run(lambda v, e: vertex_metrics(e)).collect()[0]
    assert (r.vertex_count, r.edge_count) == (3, 3)


def test_intersect_null_values_match(spark):
    # facade-default graphs carry NULL edge values; NullValue compares equal
    # in the reference, so intersect must be null-safe (review finding)
    e1 = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    e2 = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    g1, g2 = Graph.from_dataset(e1), Graph.from_dataset(e2)
    assert {(r.src, r.dst) for r in g1.intersect(g2).edges.collect()} == {(1, 2)}
    assert g1.intersect(g2, distinct_edges=False).number_of_edges() == 1


def test_join_with_vertices_duplicate_and_null_inputs(spark):
    g = _g(spark)
    # duplicate input ids must not duplicate vertices (one arbitrary row applies)
    dup = spark.createDataFrame([(0, 1), (0, 2)], "id long, v long")
    j = g.join_with_vertices(dup, lambda old, new: old + new)
    assert j.number_of_vertices() == 4
    assert dict(j.vertices.collect())[0] in (1, 2)  # 0 + one of the inputs
    # a matched row with NULL value still counts as a match
    nul = spark.createDataFrame([(0, None)], "id long, v string")
    jn = g.join_with_vertices(nul, lambda old, new: F.lit(-1))
    assert dict(jn.vertices.collect())[0] == -1
