"""Driver-side row store for inline VALUES relations (r10 §5: the
mutation hot path was 90% py4j round trips — `_tiny_rows` collected
tables the driver itself had just rendered as VALUES literals).

Invariant under test: ``df._rg_inline_rows`` must be EXACTLY what
``df.collect()`` returns, or absent. Every consumer (`_tiny_rows`,
`_try_tiny_agg`) treats the cached rows as the table's contents."""

import pytest

from redisgraph_spark.session import inline_df


def _as_tuples(rows):
    return sorted(tuple(r) for r in rows)


class TestAttachMatchesCollect:
    def test_scalar_round_trip(self, spark):
        rows = [(1, "a", 2.5, True), (2, None, float("-0.0"), None)]
        schema = [("k", "bigint"), ("s", "string"),
                  ("d", "double"), ("b", "boolean")]
        df = inline_df(spark, rows, schema)
        cached = getattr(df, "_rg_inline_rows", None)
        assert cached is not None
        assert _as_tuples([tuple(v) for v in cached[0]]) \
            == _as_tuples(df.collect())
        assert cached[1] == ["k", "s", "d", "b"]

    def test_int_in_double_column_normalized(self, spark):
        # _append_tiny merges int literals into a widened double column;
        # collect returns floats, so the cache must too
        df = inline_df(spark, [(5,), (2.5,)], [("x", "double")])
        cached = df._rg_inline_rows
        vals = [v[0] for v in cached[0]]
        assert vals == [5.0, 2.5]
        assert all(isinstance(v, float) for v in vals)
        assert vals == [r[0] for r in df.collect()]

    def test_float32_column_not_cached(self, spark):
        # CAST(3.14 AS float) collects as 3.140000104904175 — a
        # driver-side copy can't reproduce it, so no attach
        df = inline_df(spark, [(3.14,)], [("x", "float")])
        assert getattr(df, "_rg_inline_rows", None) is None

    def test_type_mismatch_aborts_attach(self, spark):
        # int value in a string column renders via CAST — collect
        # would return "7", not 7; the attach must refuse
        df = inline_df(spark, [(7,)], [("s", "string")])
        assert getattr(df, "_rg_inline_rows", None) is None
        assert df.collect()[0][0] == "7"

    def test_empty_relation_cached(self, spark):
        df = inline_df(spark, [], [("k", "bigint")])
        assert getattr(df, "_rg_inline_rows", None) == ([], ["k"])
        assert df.collect() == []


class TestTinyRowsServedFromCache:
    @pytest.fixture()
    def g(self, spark):
        from redisgraph_spark import Graph
        return Graph.from_tpch(spark, "/root/testdata/sf0.001")

    def test_mutation_script_never_collects(self, spark, g, monkeypatch):
        """A tiny-table mutation script must read table rows from the
        driver-side store, not the JVM: fail the test if `_tiny_rows`
        falls back to a collect once the table is inline."""
        import redisgraph_spark.planner.mutations as M
        g.query("CREATE (:Region {r_regionkey: 880, r_name: 'X1'})")
        # table is now an inline relation with the row store attached
        calls = {"cache": 0, "collect": 0}
        orig = M._tiny_rows

        def spy(gg, kind, name, tbl, swap=True):
            if getattr(tbl, "_rg_inline_rows", None) is not None:
                calls["cache"] += 1
            else:
                calls["collect"] += 1
            return orig(gg, kind, name, tbl, swap)

        monkeypatch.setattr(M, "_tiny_rows", spy)
        g.query("MATCH (r:Region {r_name: 'X1'}) SET r.r_regionkey = 881")
        g.query("MATCH (r:Region {r_name: 'X1'}) DELETE r")
        assert calls["cache"] > 0
        assert calls["collect"] == 0

    def test_cached_rows_equal_real_collect(self, spark, g):
        """Differential: after a mutation script, the row store on the
        committed table equals a genuine JVM collect of it."""
        g.query("CREATE (:Region {r_regionkey: 885, r_name: 'Y1'})")
        g.query("MATCH (r:Region {r_regionkey: 885}) SET r.flag = 2.5")
        tbl = g.node_tables["Region"]
        cached = getattr(tbl, "_rg_inline_rows", None)
        assert cached is not None
        assert _as_tuples([tuple(v) for v in cached[0]]) \
            == _as_tuples(tbl.collect())

    def test_roundtrip_result_unchanged(self, spark, g):
        g.query("CREATE (:Region {r_regionkey: 990, r_name: 'ATLANTIS'})")
        g.query("MATCH (r:Region {r_name: 'ATLANTIS'}) "
                "SET r.r_regionkey = 991")
        g.query("CREATE (:Region {r_regionkey: 992, r_name: 'LEMURIA'})")
        g.query("MATCH (r:Region {r_name: 'LEMURIA'}) DELETE r")
        out = g.query("MATCH (r:Region) RETURN count(*) AS n, "
                      "max(r.r_regionkey) AS mk").collect()
        # 5 base regions + ATLANTIS(991); X1/Y1 graphs are separate
        # fixtures (fresh Graph per test) so only this script's rows
        assert out[0]["n"] >= 6
        assert out[0]["mk"] == 991
