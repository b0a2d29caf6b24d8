"""Columnar (JVM-side) operations over temporal struct columns.

A temporal value (see ``functions/temporal_kernel.py`` for the Python
twin and the semantics source) is the struct

    struct<_tt: tinyint,      -- 1=date 2=localtime 3=time
           _days: long,       -- 4=localdatetime 5=datetime 6=duration
           _nanos: long,      -- local wall clock / duration nanos
           _months: long,     -- duration only
           _offset: int,      -- seconds east (time / datetime)
           _zone: string>     -- IANA zone name (datetime)

All six temporal kinds share ONE Spark type, so a property column can
hold dates on some rows and durations on others without the variant
union.  Everything here is built from ``pyspark.sql.functions`` —
whole-stage-codegen expressions, no Python UDFs — so temporal
accessors, comparisons, arithmetic, and rendering run at scan speed
on 100 TB-scale tables.  Literal-argument temporal expressions never
reach this module: the compiler constant-folds them through the
Python kernel at plan time (exact nanosecond + full zone-database
semantics) and emits a struct literal.

One documented divergence of the columnar path: duration arithmetic
on a zone-NAMED datetime column keeps the stored UTC offset rather
than re-resolving a DST change (re-resolution needs the zone database
per row; the constant-folded path handles it exactly).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, functions as F, types as T

from ..functions import temporal_kernel as TK

TEMPORAL_FIELDS = ("_tt", "_days", "_nanos", "_months", "_offset",
                   "_zone")

TEMPORAL_TYPE = T.StructType([
    T.StructField("_tt", T.ByteType()),
    T.StructField("_days", T.LongType()),
    T.StructField("_nanos", T.LongType()),
    T.StructField("_months", T.LongType()),
    T.StructField("_offset", T.IntegerType()),
    T.StructField("_zone", T.StringType()),
])

NS_SEC = 1_000_000_000
NS_MIN = 60 * NS_SEC
NS_HOUR = 3600 * NS_SEC
NS_DAY = 86400 * NS_SEC

_EPOCH = _dt.date(1970, 1, 1)


def is_temporal_type(dt: T.DataType) -> bool:
    return isinstance(dt, T.StructType) and \
        tuple(f.name for f in dt.fields) == TEMPORAL_FIELDS


def is_temporal_array_type(dt: T.DataType) -> bool:
    return isinstance(dt, T.ArrayType) and \
        is_temporal_type(dt.elementType)


def temporal_lit(v) -> Column:
    """Kernel value → struct literal Column."""
    tt, days, nanos, months, offset, zone = TK.to_row(v)
    for field, val in (("days", days), ("nanos", nanos),
                       ("months", months)):
        if not -(2**63) <= val < 2**63:
            raise TK.TemporalError(
                f"temporal {field} component {val} exceeds the 64-bit "
                f"storage range (±292 years of nanoseconds)")
    n = F.lit(None)
    return F.struct(
        F.lit(tt).cast("tinyint").alias("_tt"),
        F.lit(days).cast("long").alias("_days"),
        F.lit(nanos).cast("long").alias("_nanos"),
        F.lit(months).cast("long").alias("_months"),
        (F.lit(offset) if offset is not None
         else n).cast("int").alias("_offset"),
        (F.lit(zone) if zone is not None
         else n).cast("string").alias("_zone"))


def from_native(col: Column, dt: T.DataType) -> Column:
    """Spark-native DATE/TIMESTAMP column → temporal struct (date /
    localdatetime at microsecond precision)."""
    inull = F.lit(None).cast("int")
    snull = F.lit(None).cast("string")
    if isinstance(dt, T.DateType):
        out = pack(F.lit(TK.TT_DATE),
                   F.datediff(col, F.lit(_EPOCH)).cast("long"),
                   F.lit(0), F.lit(0), inull, snull)
        return F.when(col.isNull(),
                      F.lit(None).cast(TEMPORAL_TYPE)).otherwise(out)
    d = F.to_date(col)
    nanos = ((F.hour(col).cast("long") * 3600
              + F.minute(col).cast("long") * 60
              + F.second(col).cast("long")) * F.lit(NS_SEC)
             + F.date_format(col, "SSSSSS").cast("long") * 1000)
    out = pack(F.lit(TK.TT_LOCALDATETIME),
               F.datediff(d, F.lit(_EPOCH)).cast("long"),
               nanos, F.lit(0), inull, snull)
    return F.when(col.isNull(),
                  F.lit(None).cast(TEMPORAL_TYPE)).otherwise(out)


def pack(tt: Column, days: Column, nanos: Column, months: Column,
         offset: Column, zone: Column) -> Column:
    return F.struct(tt.cast("tinyint").alias("_tt"),
                    days.cast("long").alias("_days"),
                    nanos.cast("long").alias("_nanos"),
                    months.cast("long").alias("_months"),
                    offset.cast("int").alias("_offset"),
                    zone.cast("string").alias("_zone"))


# ----------------------------------------------------------- date helpers

def _as_date(days: Column) -> Column:
    """epoch-day long → Spark DateType (valid for years 1..9999, the
    kernel-validated storage range)."""
    return F.date_add(F.lit(_EPOCH), days.cast("int"))


def _iso_dow(days: Column) -> Column:
    """ISO day-of-week 1=Mon..7=Sun from epoch days (1970-01-01 was a
    Thursday) — pure arithmetic, no date conversion."""
    return F.pmod(days + F.lit(3), F.lit(7)) + F.lit(1)


def _week_year(days: Column) -> Column:
    # year of the Thursday of this ISO week
    return F.year(_as_date(days + (F.lit(4) - _iso_dow(days))))


def _iso_week(days: Column) -> Column:
    return F.weekofyear(_as_date(days))


def _days_from_date(d: Column) -> Column:
    return F.datediff(d, F.lit(_EPOCH)).cast("long")


def add_months_clamped(days: Column, months: Column) -> Column:
    """Calendar month addition with end-of-month clamp — Spark's
    add_months already implements exactly these semantics."""
    return _days_from_date(F.add_months(_as_date(days),
                                        months.cast("int")))


# -------------------------------------------------------------- accessors

def _tdiv(a: Column, b: int) -> Column:
    """Truncate-toward-zero division (duration hours/minutes)."""
    pos = F.floor(a / F.lit(b)).cast("long")
    neg = -F.floor(-a / F.lit(b)).cast("long")
    return F.when(a < 0, neg).otherwise(pos)


def _fdiv(a: Column, b: int) -> Column:
    """Floor division (duration seconds and finer, openCypher)."""
    return F.floor(a / F.lit(b)).cast("long")


def component(col: Column, key: str) -> Column:
    """Temporal component accessor ``x.year`` … — static key, runtime
    tag dispatch.  Returns null for a component the row's kind doesn't
    carry (schemaless property-access convention)."""
    k = key.lower()
    tt = col.getField("_tt")
    days = col.getField("_days")
    nanos = col.getField("_nanos")
    months = col.getField("_months")
    offset = col.getField("_offset")
    zone = col.getField("_zone")
    has_date = tt.isin(TK.TT_DATE, TK.TT_LOCALDATETIME, TK.TT_DATETIME)
    has_time = tt.isin(TK.TT_LOCALTIME, TK.TT_TIME, TK.TT_LOCALDATETIME,
                       TK.TT_DATETIME)
    is_dur = tt == TK.TT_DURATION
    zoned = tt.isin(TK.TT_TIME, TK.TT_DATETIME)
    d = _as_date(days)
    date_table = {
        "year": lambda: F.year(d),
        "quarter": lambda: F.quarter(d),
        "month": lambda: F.month(d),
        "week": lambda: _iso_week(days),
        "weekyear": lambda: _week_year(days),
        "day": lambda: F.dayofmonth(d),
        "ordinalday": lambda: F.dayofyear(d),
        "weekday": lambda: _iso_dow(days),
        "dayofweek": lambda: _iso_dow(days),
        "dayofquarter": lambda: F.datediff(
            d, F.trunc(d, "quarter")) + F.lit(1),
    }
    time_table = {
        "hour": lambda: F.floor(nanos / F.lit(NS_HOUR)),
        "minute": lambda: F.floor(nanos / F.lit(NS_MIN)) % 60,
        "second": lambda: F.floor(nanos / F.lit(NS_SEC)) % 60,
        "millisecond": lambda: (nanos % NS_SEC) / F.lit(1_000_000),
        "microsecond": lambda: (nanos % NS_SEC) / F.lit(1000),
        "nanosecond": lambda: nanos % NS_SEC,
    }
    if k in date_table:
        return F.when(has_date,
                      date_table[k]().cast("long")).otherwise(
            F.lit(None).cast("long"))
    if k in time_table:
        return F.when(has_time, F.floor(time_table[k]()).cast("long")) \
            .otherwise(F.lit(None).cast("long"))
    if k == "timezone":
        return F.when(zoned & zone.isNotNull(), zone) \
            .when(zoned, _offset_render(offset)) \
            .otherwise(F.lit(None).cast("string"))
    if k == "offset":
        return F.when(zoned, _offset_render(offset)) \
            .otherwise(F.lit(None).cast("string"))
    if k == "offsetminutes":
        return F.when(zoned, (offset / 60).cast("long")) \
            .otherwise(F.lit(None).cast("long"))
    if k == "offsetseconds":
        return F.when(zoned, offset.cast("long")) \
            .otherwise(F.lit(None).cast("long"))
    if k in ("epochseconds", "epochmillis"):
        esec = (days * 86400 + F.floor(nanos / F.lit(NS_SEC))
                - offset).cast("long")
        val = esec if k == "epochseconds" else \
            (esec * 1000 + F.floor((nanos % NS_SEC) / F.lit(1_000_000))
             ).cast("long")
        return F.when(tt == TK.TT_DATETIME, val) \
            .otherwise(F.lit(None).cast("long"))
    dur_table = {
        "years": lambda: _tdiv(months, 12),
        "quarters": lambda: _tdiv(months, 3),
        "months": lambda: months,
        "weeks": lambda: _tdiv(days, 7),
        "days": lambda: days,
        "hours": lambda: _tdiv(nanos, NS_HOUR),
        "minutes": lambda: _tdiv(nanos, NS_MIN),
        "seconds": lambda: _fdiv(nanos, NS_SEC),
        "milliseconds": lambda: _fdiv(nanos, 1_000_000),
        "microseconds": lambda: _fdiv(nanos, 1000),
        "nanoseconds": lambda: nanos,
        "quartersofyear": lambda: _signed_mod(_tdiv(months, 3), 4,
                                              months),
        "monthsofquarter": lambda: _signed_mod(months, 3, months),
        "monthsofyear": lambda: _signed_mod(months, 12, months),
        "daysofweek": lambda: _signed_mod(days, 7, days),
        "minutesofhour": lambda: _tdiv(nanos, NS_MIN)
        - 60 * _tdiv(nanos, NS_HOUR),
        "secondsofminute": lambda: _tdiv(nanos, NS_SEC)
        - 60 * _tdiv(nanos, NS_MIN),
        "millisecondsofsecond": lambda: _tdiv(nanos, 1_000_000)
        - 1000 * _tdiv(nanos, NS_SEC),
        "microsecondsofsecond": lambda: _tdiv(nanos, 1000)
        - 1_000_000 * _tdiv(nanos, NS_SEC),
        "nanosecondsofsecond": lambda: nanos
        - NS_SEC * _fdiv(nanos, NS_SEC),
    }
    if k in dur_table:
        return F.when(is_dur, dur_table[k]().cast("long")) \
            .otherwise(F.lit(None).cast("long"))
    return None  # not a temporal component name


def _signed_mod(v: Column, m: int, sign_src: Column) -> Column:
    """|v| mod m with the sign of sign_src (duration xxxOfYyy)."""
    a = F.abs(v) % F.lit(m)
    return F.when(sign_src < 0, -a).otherwise(a).cast("long")


COMPONENT_KEYS = frozenset(
    ["year", "quarter", "month", "week", "weekyear", "day",
     "ordinalday", "weekday", "dayofweek", "dayofquarter",
     "hour", "minute", "second", "millisecond", "microsecond",
     "nanosecond", "timezone", "offset", "offsetminutes",
     "offsetseconds", "epochseconds", "epochmillis",
     "years", "quarters", "months", "weeks", "days", "hours",
     "minutes", "seconds", "milliseconds", "microseconds",
     "nanoseconds", "quartersofyear", "monthsofquarter",
     "monthsofyear", "daysofweek", "minutesofhour", "secondsofminute",
     "millisecondsofsecond", "microsecondsofsecond",
     "nanosecondsofsecond"])


# -------------------------------------------------------------- rendering

def _pad2(c: Column) -> Column:
    return F.lpad(c.cast("string"), 2, "0")


def _frac_render(ns: Column) -> Column:
    """nanos-of-second → '.123456789' with trailing zeros stripped,
    '' when zero."""
    return F.when(ns == 0, F.lit("")).otherwise(
        F.concat(F.lit("."),
                 F.regexp_replace(F.lpad(ns.cast("string"), 9, "0"),
                                  "0+$", "")))


def _time_render(nanos: Column) -> Column:
    h = F.floor(nanos / F.lit(NS_HOUR)).cast("long")
    mi = (F.floor(nanos / F.lit(NS_MIN)) % 60).cast("long")
    s = (F.floor(nanos / F.lit(NS_SEC)) % 60).cast("long")
    ns = (nanos % NS_SEC).cast("long")
    base = F.concat(_pad2(h), F.lit(":"), _pad2(mi))
    return F.when((s == 0) & (ns == 0), base).otherwise(
        F.concat(base, F.lit(":"), _pad2(s), _frac_render(ns)))


def _date_render(days: Column) -> Column:
    return F.date_format(_as_date(days), "yyyy-MM-dd")


def _offset_render(offset: Column) -> Column:
    a = F.abs(offset)
    h = F.floor(a / 3600).cast("long")
    m = (F.floor(a / 60) % 60).cast("long")
    s = (a % 60).cast("long")
    body = F.concat(F.when(offset < 0, F.lit("-")).otherwise(F.lit("+")),
                    _pad2(h), F.lit(":"), _pad2(m),
                    F.when(s != 0, F.concat(F.lit(":"), _pad2(s)))
                    .otherwise(F.lit("")))
    return body


def _offset_render_z(offset: Column) -> Column:
    return F.when(offset == 0, F.lit("Z")).otherwise(
        _offset_render(offset))


def _dur_render(months: Column, days: Column, nanos: Column) -> Column:
    y = _tdiv(months, 12)
    m = months - y * 12
    sign = F.when(nanos < 0, F.lit(-1)).otherwise(F.lit(1))
    a = F.abs(nanos)
    h = F.floor(a / F.lit(NS_HOUR)).cast("long")
    mi = (F.floor(a / F.lit(NS_MIN)) % 60).cast("long")
    s = (F.floor(a / F.lit(NS_SEC)) % 60).cast("long")
    ns = (a % NS_SEC).cast("long")
    neg = F.when(nanos < 0, F.lit("-")).otherwise(F.lit(""))
    tpart = F.concat(
        F.when(h != 0, F.concat((sign * h).cast("string"), F.lit("H")))
        .otherwise(F.lit("")),
        F.when(mi != 0, F.concat((sign * mi).cast("string"),
                                 F.lit("M"))).otherwise(F.lit("")),
        F.when((s != 0) | (ns != 0),
               F.concat(neg, s.cast("string"), _frac_render(ns),
                        F.lit("S"))).otherwise(F.lit("")))
    body = F.concat(
        F.when(y != 0, F.concat(y.cast("string"), F.lit("Y")))
        .otherwise(F.lit("")),
        F.when(m != 0, F.concat(m.cast("string"), F.lit("M")))
        .otherwise(F.lit("")),
        F.when(days != 0, F.concat(days.cast("string"), F.lit("D")))
        .otherwise(F.lit("")),
        F.when(tpart != "", F.concat(F.lit("T"), tpart))
        .otherwise(F.lit("")))
    return F.when(body == "", F.lit("PT0S")).otherwise(
        F.concat(F.lit("P"), body))


def render(col: Column) -> Column:
    """Temporal struct → its ISO-8601 string (the user-facing RETURN
    form and the toString() value)."""
    tt = col.getField("_tt")
    days = col.getField("_days")
    nanos = col.getField("_nanos")
    months = col.getField("_months")
    offset = col.getField("_offset")
    zone = col.getField("_zone")
    dt_body = F.concat(_date_render(days), F.lit("T"),
                       _time_render(nanos))
    return F.when(col.isNull(), F.lit(None).cast("string")) \
        .when(tt == TK.TT_DATE, _date_render(days)) \
        .when(tt == TK.TT_LOCALTIME, _time_render(nanos)) \
        .when(tt == TK.TT_TIME,
              F.concat(_time_render(nanos), _offset_render_z(offset))) \
        .when(tt == TK.TT_LOCALDATETIME, dt_body) \
        .when(tt == TK.TT_DATETIME,
              F.concat(dt_body, _offset_render_z(offset),
                       F.when(zone.isNotNull(),
                              F.concat(F.lit("["), zone, F.lit("]")))
                       .otherwise(F.lit("")))) \
        .otherwise(_dur_render(months, days, nanos))


# ------------------------------------------------------------- comparison

def instant_key(col: Column) -> tuple[Column, Column]:
    """(seconds, nanos-of-second) on a per-kind timeline — total order
    WITHIN one temporal kind."""
    tt = col.getField("_tt")
    days = col.getField("_days")
    nanos = col.getField("_nanos")
    months = col.getField("_months")
    offset = F.coalesce(col.getField("_offset"), F.lit(0))
    sec = F.when(tt == TK.TT_DURATION,
                 months * 2_629_746 + days * 86400
                 + F.floor(nanos / F.lit(NS_SEC))) \
        .otherwise(days * 86400 + F.floor(nanos / F.lit(NS_SEC))
                   - offset)
    return sec.cast("long"), F.pmod(nanos, F.lit(NS_SEC)).cast("long")


def sort_key(col: Column) -> Column:
    """ORDER BY key: kind first (stable grouping), then timeline."""
    sec, ns = instant_key(col)
    return F.struct(col.getField("_tt").alias("k"), sec.alias("s"),
                    ns.alias("n"))


def eq(l: Column, r: Column) -> Column:
    """Ternary '=' — same kind, same timeline point, same offset (the
    TCK only equates identical-offset values; durations compare by
    exact components)."""
    nullb = F.lit(None).cast("boolean")
    lt, rt = l.getField("_tt"), r.getField("_tt")
    ls, ln = instant_key(l)
    rs, rn = instant_key(r)
    loff = F.coalesce(l.getField("_offset"), F.lit(0))
    roff = F.coalesce(r.getField("_offset"), F.lit(0))
    dur_eq = (l.getField("_months").eqNullSafe(r.getField("_months"))
              & l.getField("_days").eqNullSafe(r.getField("_days"))
              & l.getField("_nanos").eqNullSafe(r.getField("_nanos")))
    base = F.when(lt != rt, F.lit(False)) \
        .when(lt == TK.TT_DURATION, dur_eq) \
        .otherwise((ls == rs) & (ln == rn) & (loff == roff))
    return F.when(l.isNull() | r.isNull(), nullb).otherwise(base)


def cmp(l: Column, r: Column, op: str) -> Column:
    """Ternary comparison: null for cross-kind or duration ordering
    (openCypher: incomparable)."""
    if op == "=":
        return eq(l, r)
    if op == "<>":
        e = eq(l, r)
        return F.when(e.isNull(), e).otherwise(~e)
    nullb = F.lit(None).cast("boolean")
    lt, rt = l.getField("_tt"), r.getField("_tt")
    ls, ln = instant_key(l)
    rs, rn = instant_key(r)
    c3 = F.when(ls < rs, -1).when(ls > rs, 1) \
        .when(ln < rn, -1).when(ln > rn, 1).otherwise(0)
    base = {"<": c3 < 0, "<=": c3 <= 0, ">": c3 > 0, ">=": c3 >= 0}[op]
    return F.when(l.isNull() | r.isNull(), nullb) \
        .when((lt != rt) | (lt == TK.TT_DURATION), nullb) \
        .otherwise(base)


# ------------------------------------------------------------- arithmetic

def _dur_fields(c: Column) -> tuple[Column, Column, Column]:
    return (c.getField("_months"), c.getField("_days"),
            c.getField("_nanos"))


def add_duration(v: Column, dur: Column, sign: int = 1) -> Column:
    """temporal + duration at the column level.  Zone-named datetimes
    keep their stored offset (see module docstring)."""
    mo, dd, nn = _dur_fields(dur)
    if sign < 0:
        mo, dd, nn = -mo, -dd, -nn
    tt = v.getField("_tt")
    days = v.getField("_days")
    nanos = v.getField("_nanos")
    months = v.getField("_months")
    offset = v.getField("_offset")
    zone = v.getField("_zone")
    # date: months + days + whole days inside the time part
    date_days = add_months_clamped(days, mo) + dd + _tdiv(nn, NS_DAY)
    # time kinds: nanos wrap within the day
    wrapped = F.pmod(nanos + nn, F.lit(NS_DAY))
    # datetime kinds: full carry
    total = nanos + nn
    carry_days = F.floor(total / F.lit(NS_DAY)).cast("long")
    day_nanos = F.pmod(total, F.lit(NS_DAY))
    ldt_days = add_months_clamped(days, mo) + dd + carry_days
    null_l = F.lit(None).cast("long")
    out = F.when(
        tt == TK.TT_DATE,
        pack(tt, date_days, F.lit(0), F.lit(0), offset, zone)) \
        .when(tt.isin(TK.TT_LOCALTIME, TK.TT_TIME),
              pack(tt, F.lit(0), wrapped, F.lit(0), offset, zone)) \
        .when(tt.isin(TK.TT_LOCALDATETIME, TK.TT_DATETIME),
              pack(tt, ldt_days, day_nanos, F.lit(0), offset, zone)) \
        .when(tt == TK.TT_DURATION,
              pack(tt, days + dd, nanos + nn, months + mo,
                   null_l.cast("int"), null_l.cast("string")))
    return F.when(v.isNull() | dur.isNull(),
                  F.lit(None).cast(TEMPORAL_TYPE)).otherwise(out)


def dur_add(a: Column, b: Column, sign: int = 1) -> Column:
    am, ad, an = _dur_fields(a)
    bm, bd, bn = _dur_fields(b)
    out = pack(F.lit(TK.TT_DURATION), ad + sign * bd, an + sign * bn,
               am + sign * bm, F.lit(None).cast("int"),
               F.lit(None).cast("string"))
    return F.when(a.isNull() | b.isNull(),
                  F.lit(None).cast(TEMPORAL_TYPE)).otherwise(out)


def dur_scale(a: Column, k: Column, divide: bool = False) -> Column:
    """duration * number / duration ÷ number — the kernel's
    normalization: the month remainder becomes avg-month seconds of
    which whole days extract into the day component; the day remainder
    goes to seconds (Temporal8 [7])."""
    am, ad, an = _dur_fields(a)
    kd = k.cast("double")
    if divide:
        kd = F.lit(1.0) / kd
    mf = am * kd
    df_ = ad * kd
    m2 = mf.cast("long")
    d2 = df_.cast("long")
    sec_m_ns = F.bround((mf - m2) * F.lit(TK.AVG_SEC_PER_MONTH
                                          * NS_SEC)).cast("long")
    d_extra = _tdiv(sec_m_ns, NS_DAY)
    n2 = (F.bround(an * kd).cast("long")
          + sec_m_ns - d_extra * F.lit(NS_DAY)
          + F.bround((df_ - d2) * F.lit(86400 * NS_SEC)).cast("long"))
    out = pack(F.lit(TK.TT_DURATION), d2 + d_extra, n2, m2,
               F.lit(None).cast("int"), F.lit(None).cast("string"))
    return F.when(a.isNull() | k.isNull(),
                  F.lit(None).cast(TEMPORAL_TYPE)).otherwise(out)


def dur_neg(a: Column) -> Column:
    am, ad, an = _dur_fields(a)
    out = pack(F.lit(TK.TT_DURATION), -ad, -an, -am,
               F.lit(None).cast("int"), F.lit(None).cast("string"))
    return F.when(a.isNull(), F.lit(None).cast(TEMPORAL_TYPE)) \
        .otherwise(out)


def is_duration(col: Column) -> Column:
    return col.getField("_tt") == TK.TT_DURATION


# -------------------------------------------- columnar truncate / between

_TRUNC_NS = {"hour": NS_HOUR, "minute": NS_MIN, "second": NS_SEC,
             "millisecond": 1_000_000, "microsecond": 1000}


def truncate_col(kind: str, unit: str, col: Column) -> Column:
    """X.truncate(unit, col) over a per-row temporal column (no
    component overrides — those demand a constant value and fold
    through the kernel)."""
    u = unit.lower()
    if u not in TK._TRUNC_UNITS:
        raise ValueError(f"unknown truncation unit: {unit}")
    tt = col.getField("_tt")
    days = col.getField("_days")
    nanos = col.getField("_nanos")
    offset = col.getField("_offset")
    zone = col.getField("_zone")
    d = _as_date(days)
    if u in ("millennium", "century", "decade"):
        span = {"millennium": 1000, "century": 100, "decade": 10}[u]
        y = F.year(d)
        y0 = (y - F.pmod(y, F.lit(span))).cast("int")
        days2 = _days_from_date(F.make_date(y0, F.lit(1), F.lit(1)))
        nanos2 = F.lit(0)
    elif u == "year":
        days2 = _days_from_date(F.trunc(d, "year"))
        nanos2 = F.lit(0)
    elif u == "weekyear":
        wy = _week_year(days).cast("int")
        jan4 = _days_from_date(F.make_date(wy, F.lit(1), F.lit(4)))
        days2 = jan4 - (_iso_dow(jan4) - 1)
        nanos2 = F.lit(0)
    elif u == "quarter":
        days2 = _days_from_date(F.trunc(d, "quarter"))
        nanos2 = F.lit(0)
    elif u == "month":
        days2 = _days_from_date(F.trunc(d, "month"))
        nanos2 = F.lit(0)
    elif u == "week":
        days2 = days - (_iso_dow(days) - 1)
        nanos2 = F.lit(0)
    elif u == "day":
        days2 = days
        nanos2 = F.lit(0)
    else:
        days2 = days
        nanos2 = nanos - F.pmod(nanos, F.lit(_TRUNC_NS[u]))
    tt_out = {"date": TK.TT_DATE, "localtime": TK.TT_LOCALTIME,
              "time": TK.TT_TIME, "localdatetime": TK.TT_LOCALDATETIME,
              "datetime": TK.TT_DATETIME}[kind]
    has_date = tt.isin(TK.TT_DATE, TK.TT_LOCALDATETIME, TK.TT_DATETIME)
    null_out = F.lit(None).cast(TEMPORAL_TYPE)
    inull = F.lit(None).cast("int")
    snull = F.lit(None).cast("string")
    zero = F.lit(0)
    if kind == "date":
        out = pack(F.lit(tt_out), days2, zero, zero, inull, snull)
        return F.when(col.isNull() | ~has_date, null_out).otherwise(out)
    if kind in ("localtime", "time"):
        off = F.coalesce(offset, F.lit(0)) if kind == "time" else inull
        out = pack(F.lit(tt_out), zero, nanos2, zero, off, snull)
        ok = tt.isin(TK.TT_LOCALTIME, TK.TT_TIME, TK.TT_LOCALDATETIME,
                     TK.TT_DATETIME) if u not in (
            "millennium", "century", "decade", "year", "weekyear",
            "quarter", "month", "week") else F.lit(False)
        return F.when(col.isNull() | ~ok, null_out).otherwise(out)
    off = F.coalesce(offset, F.lit(0)) if kind == "datetime" else inull
    zz = zone if kind == "datetime" else snull
    out = pack(F.lit(tt_out), F.when(has_date, days2).otherwise(0),
               nanos2, zero, off, zz)
    return F.when(col.isNull() | ~has_date, null_out).otherwise(out)


def from_epoch_col(sec: Column, ns: Column) -> Column:
    """datetime.fromepoch(seconds, nanos) over per-row numerics (UTC)."""
    total = sec * F.lit(NS_SEC) + ns
    days = F.floor(total / F.lit(NS_DAY)).cast("long")
    nanos = F.pmod(total, F.lit(NS_DAY)).cast("long")
    out = pack(F.lit(TK.TT_DATETIME), days, nanos, F.lit(0), F.lit(0),
               F.lit(None).cast("string"))
    return F.when(sec.isNull() | ns.isNull(),
                  F.lit(None).cast(TEMPORAL_TYPE)).otherwise(out)


def between_col(l: Column, r: Column, mode: str | None,
                binder=None) -> Column:
    """duration.between / inMonths / inDays / inSeconds over per-row
    temporal columns — full calendar months first (add_months clamp
    semantics), then full days, then the exact nanosecond remainder.
    Zone-named datetimes use their stored offsets (fixed-offset
    semantics at the column level; constant operands fold through the
    kernel with full DST handling).

    ``binder(col, dtype_str)`` (optional) aliases an intermediate to a
    named projection column — the month/day guess-and-adjust stages
    otherwise re-reference each other and grow the full-mode
    expression to ~150KB of plan text."""
    if binder is None:
        def binder(c, _dt):
            return c
    lt, rt = l.getField("_tt"), r.getField("_tt")

    def eff_days(a, b):
        a_has = a.getField("_tt").isin(TK.TT_DATE, TK.TT_LOCALDATETIME,
                                       TK.TT_DATETIME)
        b_has = b.getField("_tt").isin(TK.TT_DATE, TK.TT_LOCALDATETIME,
                                       TK.TT_DATETIME)
        return F.when(a_has, a.getField("_days")) \
            .when(b_has, b.getField("_days")).otherwise(F.lit(0))

    def eff_nanos(a):
        return F.when(a.getField("_tt") == TK.TT_DATE, F.lit(0)) \
            .otherwise(a.getField("_nanos"))

    loff = F.coalesce(l.getField("_offset"), r.getField("_offset"),
                      F.lit(0))
    roff = F.coalesce(r.getField("_offset"), l.getField("_offset"),
                      F.lit(0))
    ld, rd = eff_days(l, r), eff_days(r, l)
    ln, rn = eff_nanos(l), eff_nanos(r)
    # timeline positions (seconds + nanos-of-second, offset applied)
    lsec = ld * 86400 + F.floor(ln / F.lit(NS_SEC)) - loff
    rsec = rd * 86400 + F.floor(rn / F.lit(NS_SEC)) - roff
    lns = F.pmod(ln, F.lit(NS_SEC))
    rns = F.pmod(rn, F.lit(NS_SEC))
    total_ns = (rsec - lsec) * F.lit(NS_SEC) + (rns - lns)
    time_only = lt.isin(TK.TT_LOCALTIME, TK.TT_TIME) \
        & rt.isin(TK.TT_LOCALTIME, TK.TT_TIME)
    inull = F.lit(None).cast("int")
    snull = F.lit(None).cast("string")
    null_out = F.lit(None).cast(TEMPORAL_TYPE)
    valid = ~lt.isin(TK.TT_DURATION) & ~rt.isin(TK.TT_DURATION)
    if mode == "seconds":
        out = pack(F.lit(TK.TT_DURATION), F.lit(0), total_ns, F.lit(0),
                   inull, snull)
        return F.when(l.isNull() | r.isNull() | ~valid, null_out) \
            .otherwise(out)

    def pos_after(days2: Column) -> Column:
        """timeline ns after moving the start to local day `days2`."""
        return ((days2 * 86400 + F.floor(ln / F.lit(NS_SEC)) - loff)
                * F.lit(NS_SEC) + lns)

    target = binder(rsec * F.lit(NS_SEC) + rns, "long")
    start = binder(lsec * F.lit(NS_SEC) + lns, "long")
    fwd = target >= start
    if mode == "days":
        d_guess = F.floor((target - start) / F.lit(NS_DAY)).cast("long")
        # floor guess can overshoot backward moves by one local day
        d_fix = F.when(fwd & (pos_after(ld + d_guess) > target),
                       d_guess - 1) \
            .when(~fwd & (pos_after(ld + d_guess) < target),
                  d_guess + 1).otherwise(d_guess)
        d_fix = F.when(time_only, F.lit(0)).otherwise(d_fix)
        out = pack(F.lit(TK.TT_DURATION), d_fix, F.lit(0), F.lit(0),
                   inull, snull)
        return F.when(l.isNull() | r.isNull() | ~valid, null_out) \
            .otherwise(out)
    # full months: calendar guess, adjust by one
    ldt_, rdt_ = _as_date(ld), _as_date(rd)
    m_guess = binder(((F.year(rdt_) * 12 + F.month(rdt_))
                      - (F.year(ldt_) * 12 + F.month(ldt_)))
                     .cast("long"), "long")

    def pos_after_m(m: Column) -> Column:
        return pos_after(add_months_clamped(ld, m))

    m_adj = F.when(fwd & (pos_after_m(m_guess) > target), m_guess - 1) \
        .when(~fwd & (pos_after_m(m_guess) < target), m_guess + 1) \
        .otherwise(m_guess)
    m_adj = binder(F.when(time_only, F.lit(0)).otherwise(m_adj), "long")
    if mode == "months":
        out = pack(F.lit(TK.TT_DURATION), F.lit(0), F.lit(0), m_adj,
                   inull, snull)
        return F.when(l.isNull() | r.isNull() | ~valid, null_out) \
            .otherwise(out)
    md = binder(add_months_clamped(ld, m_adj), "long")
    after_m = pos_after(md)
    d_guess = binder(
        F.floor((target - after_m) / F.lit(NS_DAY)).cast("long"),
        "long")
    d_adj = F.when(fwd & (pos_after(md + d_guess) > target),
                   d_guess - 1) \
        .when(~fwd & (pos_after(md + d_guess) < target),
              d_guess + 1).otherwise(d_guess)
    d_adj = binder(F.when(time_only, F.lit(0)).otherwise(d_adj),
                   "long")
    rem = target - pos_after(md + d_adj)
    rem = F.when(time_only, target - start).otherwise(rem)
    out = pack(F.lit(TK.TT_DURATION), d_adj, rem, m_adj, inull, snull)
    return F.when(l.isNull() | r.isNull() | ~valid, null_out) \
        .otherwise(out)
