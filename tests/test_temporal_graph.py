"""Graph-level (end-to-end Cypher) tests for the openCypher temporal
API — the constant-folding path, the columnar path over stored
properties, and the native parquet date/timestamp conversion path.
Kernel-level unit coverage lives in test_temporal_kernel.py."""

import pytest

from redisgraph_spark import Graph


@pytest.fixture(scope="module")
def tg(spark):
    g = Graph(spark, {}, {})
    g.query("CREATE (:Ev {name: 'a', at: datetime('2024-03-09T23:30"
            "-05:00[America/New_York]'), d: date('2024-03-09')}), "
            "(:Ev {name: 'b', at: datetime('2024-03-10T03:30-04:00"
            "[America/New_York]'), d: date('2024-03-10')})")
    return g


def collect1(g, q):
    return [tuple(r) for r in g.query(q).collect()]


def test_literal_folding_renders_iso(tg):
    assert collect1(tg, "RETURN date({year: 2017, week: 10, "
                        "dayOfWeek: 3}) AS d") == [("2017-03-08",)]
    assert collect1(tg, "RETURN duration({days: 1, hours: 36}) AS d") \
        == [("P1DT36H",)]


def test_stored_temporal_roundtrip_and_accessors(tg):
    rows = collect1(tg, "MATCH (e:Ev) RETURN e.name, toString(e.at), "
                        "e.at.epochSeconds AS es, e.d.weekYear AS wy "
                        "ORDER BY e.name")
    assert rows[0][1] == "2024-03-09T23:30-05:00[America/New_York]"
    assert rows[1][1] == "2024-03-10T03:30-04:00[America/New_York]"
    # the two instants straddle the DST gap: exactly 3h apart
    assert rows[1][2] - rows[0][2] == 3 * 3600
    assert rows[0][3] == 2024


def test_stored_temporal_comparison_and_order(tg):
    rows = collect1(tg, "MATCH (e:Ev) WHERE e.at < datetime("
                        "'2024-03-10T05:00Z') RETURN e.name")
    assert rows == [("a",)]
    rows = collect1(tg, "MATCH (e:Ev) RETURN e.name ORDER BY e.at "
                        "DESC")
    assert [r[0] for r in rows] == ["b", "a"]


def test_columnar_arithmetic_on_stored(tg):
    rows = collect1(tg, "MATCH (e:Ev) WITH e.d AS d ORDER BY d LIMIT 1"
                        " RETURN toString(d + duration('P1M2D')) AS x")
    assert rows == [("2024-04-11",)]
    rows = collect1(tg, "MATCH (a:Ev {name:'a'}), (b:Ev {name:'b'}) "
                        "RETURN duration.inSeconds(a.at, b.at).seconds"
                        " AS s")
    assert rows == [(10800,)]


def test_group_by_truncated_temporal(tg):
    rows = collect1(tg, "MATCH (e:Ev) RETURN toString(date.truncate("
                        "'month', e.d)) AS m, count(*) AS n")
    assert rows == [("2024-03-01", 2)]


def test_temporal_in_list_property(spark):
    g = Graph(spark, {}, {})
    g.query("CREATE ({times: [localtime('09:00'), localtime('17:30')]"
            "})")
    rows = g.query("MATCH (n) RETURN n.times").collect()
    assert rows[0][0] == ["09:00", "17:30"]


def test_temporal_errors(tg):
    with pytest.raises(Exception, match="[Mm]onth"):
        tg.query("RETURN date({year: 2024, month: 13, day: 1})")
    with pytest.raises(Exception, match="duration"):
        tg.query("RETURN duration('not-a-duration')")
    with pytest.raises(Exception, match="[Tt]ype mismatch|duration"):
        tg.query("RETURN date('2024-01-01') * 2")


def test_statement_clock_consistency(tg):
    rows = collect1(tg, "RETURN duration.between(datetime(), "
                        "datetime()) AS z, date() <= date() AS eq")
    assert rows == [("PT0S", True)]


def test_set_temporal_on_native_column_stays_typed(spark):
    """SET n.d = <temporal expr> over a NATIVE date/timestamp column
    must store a typed temporal, not the struct's string rendering
    (r10 latent bug: the heterogeneous-SET fallback demoted the column
    to string and later temporal ops raised CompileError)."""
    import datetime
    ev = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 5)), (2, datetime.date(2024, 3, 1))],
        ["_id", "d"])
    g = Graph(spark, {"ev": ev}, {}, name="set_temporal_native")
    g.query("MATCH (e:ev) SET e.d = date(e.d) + duration({days: 1})")
    from redisgraph_spark.planner.temporal_cols import is_temporal_type
    assert is_temporal_type(g.node_tables["ev"].schema["d"].dataType)
    rows = sorted(tuple(r) for r in g.query(
        "MATCH (e:ev) RETURN toString(e.d) AS s, "
        "toString(e.d + duration({days: 1})) AS s2").collect())
    assert rows == [("2024-01-06", "2024-01-07"),
                    ("2024-03-02", "2024-03-03")]


def test_set_temporal_partial_update_preserves_unmatched(spark):
    """A filtered temporal SET lifts the column but unmatched rows keep
    their exact original value; a later SET of a native value into the
    lifted column converts instead of demoting."""
    import datetime
    ev = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 5)), (2, datetime.date(2024, 3, 1))],
        ["_id", "d"])
    g = Graph(spark, {"ev": ev}, {}, name="set_temporal_partial")
    g.query("MATCH (e:ev) WHERE id(e) = 1 "
            "SET e.d = date(e.d) + duration({days: 10})")
    rows = sorted(r["s"] for r in g.query(
        "MATCH (e:ev) RETURN toString(e.d) AS s").collect())
    assert rows == ["2024-01-15", "2024-03-01"]
    # native date into the now-temporal column
    g.query("MATCH (e:ev) WHERE id(e) = 2 SET e.d = date('2030-06-01')")
    rows = sorted(r["s"] for r in g.query(
        "MATCH (e:ev) RETURN toString(e.d) AS s").collect())
    assert rows == ["2024-01-15", "2030-06-01"]
