"""Embedding hygiene screen (operators/embedding_qa.py)."""

import math

from pyspark.sql import functions as F

from mcp_synaptic_spark.operators.embedding_qa import embedding_screen


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_screen_flags_each_failure_mode(spark):
    good = [0.5] * 4
    rows = [
        (1, good),                          # valid (norm 1.0)
        (2, [float("nan"), 0.5, 0.5, 0.5]),  # nonfinite
        (3, [float("inf"), 0.5, 0.5, 0.5]),  # nonfinite
        (4, [0.0, 0.0, 0.0, 0.0]),           # zero (also norm_low)
        (5, [0.1, 0.0, 0.0, 0.0]),           # norm_low
        (6, [9.0, 0.0, 0.0, 0.0]),           # norm_high
        (7, [0.5, 0.5, 0.5]),                # bad_dim
        (8, None),                           # bad_dim, NULL norm
        (9, [None, 0.5, 0.5, 0.5]),          # NULL component = nonfinite
        (10, []),                            # empty: bad_dim, NOT zero
    ]
    out = {r.vec_id: r for r in embedding_screen(_emb(spark, rows), dim=4).collect()}
    assert out[1].is_valid and out[1].norm == 1.0
    assert out[2].nonfinite and out[2].norm is None and not out[2].is_valid
    assert out[3].nonfinite and not out[3].is_valid
    assert out[4].zero and out[4].norm_low and not out[4].is_valid
    assert out[5].norm_low and not out[5].zero and not out[5].is_valid
    assert out[6].norm_high and not out[6].is_valid
    assert out[7].bad_dim and out[7].n_dims == 3 and not out[7].is_valid
    assert out[8].bad_dim and out[8].n_dims == -1 and out[8].norm is None
    assert out[9].nonfinite and out[9].norm is None and not out[9].is_valid
    assert out[10].bad_dim and not out[10].zero and not out[10].is_valid
    assert out[5].norm == round(0.1, 6)
    assert out[6].norm == 9.0


def test_screen_zero_shuffle_single_scan(spark, tmp_path):
    path = str(tmp_path / "emb")
    _emb(spark, [(1, [1.0, 0.0])]).write.parquet(path)
    df = embedding_screen(spark.read.parquet(path), dim=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1
    assert df.collect()[0].is_valid


def test_screen_norm_matches_math(spark):
    rows = [(i, [float(i + 1) / 10] * 4) for i in range(5)]
    out = embedding_screen(_emb(spark, rows), dim=4, min_norm=0.0, max_norm=99.0)
    for r in out.collect():
        v = (r.vec_id + 1) / 10
        assert r.norm == round(math.sqrt(4 * v * v), 6)
        assert r.is_valid or r.zero


def test_dims_profile_detects_dead_and_constant(spark):
    from mcp_synaptic_spark.operators.embedding_qa import dims_profile

    rows = [
        (1, [1.0, 0.0, 5.0, 0.25]),
        (2, [2.0, 0.0, 5.0, 0.75]),
        (3, None),
        (4, [3.0, 0.0, 5.0, 0.50]),
        (5, [float("nan"), None, 5.0, float("inf")]),  # damaged components
    ]
    out = {r.dim: r for r in dims_profile(_emb(spark, rows)).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(r.n == 4 for r in out.values())
    assert out[1].is_dead and out[1].n_nonzero == 0          # all-zero dim
    assert out[2].is_dead and out[2].min_x == out[2].max_x    # constant dim
    assert not out[0].is_dead and not out[3].is_dead
    # damaged values excluded from moments, counted separately
    assert out[0].n_damaged == 1 and out[1].n_damaged == 1
    assert out[2].n_damaged == 0 and out[3].n_damaged == 1
    assert out[0].mean_x == 2.0 and out[3].mean_x == 0.5
    assert (out[0].min_x, out[0].max_x) == (1.0, 3.0)


def test_embedding_screen_runs_as_streaming_gate(spark, tmp_path):
    """The screen is a stateless projection, so it lifts onto readStream
    unchanged — pin that the composition actually runs as a stream."""
    path = str(tmp_path / "emb")
    _emb(spark, [(1, [1.0, 0.0]), (2, [float("nan"), 1.0])]).write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    name = f"emb_screen_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        embedding_screen(stream, dim=2)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.vec_id: r.is_valid for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got == {1: True, 2: False}


def test_oracle_parity_on_damaged_table(spark, tmp_path):
    """The sf0.01 table is clean, so the driver's hash gate never exercises
    the damage paths — run the REAL oracle SQL against a synthetic damaged
    table and require bit-equality with the Spark query (this is the r9
    review fix: NULL components, empty arrays, and NaN decimal casts all
    diverged engine-vs-oracle before)."""
    import duckdb

    import __spark_entry__ as entry
    from tools.parity import norm_rows

    rows = [
        (1, [0.5] * 64),
        (2, [None] + [0.5] * 63),
        (3, [float("nan")] + [0.5] * 63),
        (4, [float("inf")] + [0.5] * 63),
        (5, [0.0] * 64),
        (6, []),
        (7, None),
        (8, [0.5] * 63),
    ]
    _emb(spark, rows).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    for q in ("embedding_screen", "dims_profile"):
        sdf = entry.queries()[q](spark, str(tmp_path))
        scols, srows = norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.execute(entry.oracle_sql()[q]).fetchall()
        ocols, orows = norm_rows([d[0] for d in con.description], res)
        assert scols == ocols, q
        assert srows == orows, q
