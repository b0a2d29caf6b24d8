"""Unit tests for the pure-Python temporal kernel
(``functions/temporal_kernel.py``) against facts taken verbatim from
the openCypher TCK temporal features (Temporal1-10) — the reference
declares these types but never implements them (src/value.h:28-33).
No Spark session needed: the kernel is plain integer math."""

import pytest

from redisgraph_spark.functions.temporal_kernel import (
    KDuration, TemporalError, add_duration, construct as K, dur_add,
    dur_divide, dur_neg, dur_scale, duration_between, equals,
    get_component, sort_key, truncate,
)


def chk(got, exp):
    assert str(got) == exp, f"{got!s} != {exp}"


# --------------------------------------------------- map construction

def test_week_date_construction():
    chk(K("date", {"year": 1816, "week": 1}), "1816-01-01")
    chk(K("date", {"year": 1817, "week": 1}), "1816-12-30")
    chk(K("date", {"year": 1818, "week": 53}), "1818-12-28")
    chk(K("date", {"dayOfWeek": 2, "year": 1817, "week": 1}),
        "1816-12-31")
    chk(K("date", {"date": K("date", "1816-12-30"), "week": 2,
                   "dayOfWeek": 3}), "1817-01-08")
    chk(K("date", {"date": K("date", "1816-12-31"), "week": 2}),
        "1817-01-07")
    chk(K("localdatetime", {"year": 1816, "week": 1}),
        "1816-01-01T00:00")


def test_quarter_and_ordinal_dates():
    chk(K("date", {"year": 1984, "quarter": 3, "dayOfQuarter": 45}),
        "1984-08-14")
    chk(K("date", {"year": 1984, "ordinalDay": 202}), "1984-07-20")


# ------------------------------------------------- string construction

@pytest.mark.parametrize("kind,s,exp", [
    ("date", "2015-07-21", "2015-07-21"),
    ("date", "20150721", "2015-07-21"),
    ("date", "2015-07", "2015-07-01"),
    ("date", "201507", "2015-07-01"),
    ("date", "2015-W30-2", "2015-07-21"),
    ("date", "2015W302", "2015-07-21"),
    ("date", "2015-W30", "2015-07-20"),
    ("date", "2015W30", "2015-07-20"),
    ("date", "2015-202", "2015-07-21"),
    ("date", "2015202", "2015-07-21"),
    ("date", "2015", "2015-01-01"),
    ("localtime", "21:40:32.142", "21:40:32.142"),
    ("localtime", "214032.142", "21:40:32.142"),
    ("localtime", "21:40:32", "21:40:32"),
    ("localtime", "214032", "21:40:32"),
    ("localtime", "21:40", "21:40"),
    ("localtime", "2140", "21:40"),
    ("localtime", "21", "21:00"),
    ("time", "21:40:32.142+0100", "21:40:32.142+01:00"),
    ("time", "214032.142Z", "21:40:32.142Z"),
    ("time", "21:40:32+01:00", "21:40:32+01:00"),
    ("time", "214032-0100", "21:40:32-01:00"),
    ("time", "21:40-01:30", "21:40-01:30"),
    ("time", "2140-00:00", "21:40Z"),
    ("time", "2140-02", "21:40-02:00"),
    ("time", "22+18:00", "22:00+18:00"),
    ("localdatetime", "2015-07-21T21:40:32.142",
     "2015-07-21T21:40:32.142"),
    ("localdatetime", "2015-W30-2T214032.142",
     "2015-07-21T21:40:32.142"),
    ("localdatetime", "2015-202T21:40:32", "2015-07-21T21:40:32"),
    ("localdatetime", "2015T214032", "2015-01-01T21:40:32"),
    ("localdatetime", "20150721T21:40", "2015-07-21T21:40"),
    ("localdatetime", "2015-W30T2140", "2015-07-20T21:40"),
    ("localdatetime", "2015202T21", "2015-07-21T21:00"),
    ("datetime", "2015-07-21T21:40:32.142+0100",
     "2015-07-21T21:40:32.142+01:00"),
    ("datetime", "2015-07-21T21:40:32.142Z",
     "2015-07-21T21:40:32.142Z"),
    ("datetime", "2015-07-21T21:40:32.142[Europe/London]",
     "2015-07-21T21:40:32.142+01:00[Europe/London]"),
])
def test_string_construction(kind, s, exp):
    chk(K(kind, s), exp)


# ------------------------------------------------------------ accessors

def test_date_accessors():
    d = K("date", {"year": 1984, "month": 10, "day": 11})
    exp = {"year": 1984, "quarter": 4, "month": 10, "week": 41,
           "weekYear": 1984, "day": 11, "ordinalDay": 285,
           "weekDay": 4, "dayOfQuarter": 11}
    for name, want in exp.items():
        assert get_component(d, name) == want, name


def test_week_year_boundary():
    d = K("date", {"year": 1984, "month": 1, "day": 1})
    assert get_component(d, "year") == 1984
    assert get_component(d, "weekYear") == 1983
    assert get_component(d, "week") == 52
    assert get_component(d, "weekDay") == 7


def test_datetime_accessors_with_zone():
    dt = K("datetime", {"year": 1984, "month": 11, "day": 11,
                        "hour": 12, "minute": 31, "second": 14,
                        "nanosecond": 645876123,
                        "timezone": "Europe/Stockholm"})
    assert get_component(dt, "epochSeconds") == 469020674
    assert get_component(dt, "epochMillis") == 469020674645
    assert get_component(dt, "timezone") == "Europe/Stockholm"
    assert get_component(dt, "offset") == "+01:00"
    assert get_component(dt, "offsetMinutes") == 60
    assert get_component(dt, "offsetSeconds") == 3600


def test_duration_accessors():
    dur = K("duration", {"years": 1, "months": 4, "days": 10,
                         "hours": 1, "minutes": 1, "seconds": 1,
                         "nanoseconds": 111111111})
    exp = {"years": 1, "quarters": 5, "months": 16, "weeks": 1,
           "days": 10, "hours": 1, "minutes": 61, "seconds": 3661,
           "milliseconds": 3661111, "microseconds": 3661111111,
           "nanoseconds": 3661111111111, "quartersOfYear": 1,
           "monthsOfQuarter": 1, "monthsOfYear": 4, "daysOfWeek": 3,
           "minutesOfHour": 1, "secondsOfMinute": 1,
           "millisecondsOfSecond": 111, "microsecondsOfSecond": 111111,
           "nanosecondsOfSecond": 111111111}
    for name, want in exp.items():
        assert get_component(dur, name) == want, name


# ------------------------------------------------------------ rendering

@pytest.mark.parametrize("mp,exp", [
    ({"years": 12, "months": 5, "days": 14, "hours": 16,
      "minutes": 12, "seconds": 70, "nanoseconds": 1},
     "P12Y5M14DT16H13M10.000000001S"),
    ({"years": 12, "months": 5, "days": -14, "hours": 16},
     "P12Y5M-14DT16H"),
    ({"minutes": 12, "seconds": -60}, "PT11M"),
    ({"seconds": 2, "milliseconds": -1}, "PT1.999S"),
    ({"seconds": -2, "milliseconds": 1}, "PT-1.999S"),
    ({"seconds": -2, "milliseconds": -1}, "PT-2.001S"),
    ({"days": 1, "milliseconds": 1}, "P1DT0.001S"),
    ({"days": 1, "milliseconds": -1}, "P1DT-0.001S"),
    ({"seconds": 60, "milliseconds": -1}, "PT59.999S"),
    ({"seconds": -60, "milliseconds": 1}, "PT-59.999S"),
    ({"seconds": -60, "milliseconds": -1}, "PT-1M-0.001S"),
])
def test_duration_rendering(mp, exp):
    chk(K("duration", mp), exp)
    # toString/parse roundtrip (Temporal6 [6])
    assert equals(K("duration", exp), K("duration", mp))


def test_zone_rendering():
    chk(K("datetime", {"year": 2017, "month": 8, "day": 8, "hour": 12,
                       "minute": 31, "second": 14,
                       "nanosecond": 645876123,
                       "timezone": "Europe/Stockholm"}),
        "2017-08-08T12:31:14.645876123+02:00[Europe/Stockholm]")


# ----------------------------------------------------------- arithmetic

def test_date_plus_duration():
    x = K("date", {"year": 1984, "month": 10, "day": 11})
    dur = K("duration", {"years": 12, "months": 5, "days": 14,
                         "hours": 16})
    chk(add_duration(x, dur), "1997-03-25")
    chk(add_duration(x, dur, -1), "1972-04-27")


def test_localtime_plus_duration_wraps():
    lt = K("localtime", {"hour": 12, "minute": 31, "second": 14,
                         "nanosecond": 1})
    dur = K("duration", {"hours": 16, "minutes": 12, "seconds": 70,
                         "nanoseconds": 2})
    chk(add_duration(lt, dur), "04:44:24.000000003")
    chk(add_duration(lt, dur, -1), "20:18:03.999999999")


def test_duration_add_sub():
    d1 = K("duration", {"years": 12, "months": 5, "days": 14,
                        "hours": 16, "minutes": 12, "seconds": 70,
                        "nanoseconds": 1})
    chk(dur_add(d1, d1), "P24Y10M28DT32H26M20.000000002S")
    chk(dur_add(d1, d1, -1), "PT0S")
    chk(dur_neg(K("duration", {"days": 14, "hours": 16})),
        "P-14DT-16H")


def test_duration_scale():
    chk(dur_scale(K("duration", {"days": 14, "hours": 16}), 2),
        "P28DT32H")
    chk(dur_divide(K("duration", {"days": 14, "hours": 16}), 2),
        "P7DT8H")


# -------------------------------------------------------------- between

def test_between_localdatetimes():
    a = K("localdatetime", "2018-01-01T12:00")
    b = K("localdatetime", "2018-01-02T10:00")
    chk(duration_between(a, b), "PT22H")
    chk(duration_between(b, a), "PT-22H")


def test_between_negative_floor_accessors():
    a = K("localdatetime", "2018-01-01T10:00:00.2")
    b = K("localdatetime", "2018-01-02T10:00:00.1")
    d = duration_between(a, b)
    chk(d, "PT23H59M59.9S")
    assert get_component(d, "seconds") == 86399
    assert get_component(d, "nanosecondsOfSecond") == 900000000
    d2 = duration_between(b, a)
    chk(d2, "PT-23H-59M-59.9S")
    assert get_component(d2, "seconds") == -86400
    assert get_component(d2, "nanosecondsOfSecond") == 100000000


def test_between_dst_transition():
    a = K("datetime", "2017-10-28T23:00+02:00[Europe/Stockholm]")
    b = K("datetime", "2017-10-29T04:00+01:00[Europe/Stockholm]")
    chk(duration_between(a, b), "PT6H")
    chk(duration_between(b, a), "PT-6H")


def test_between_dates():
    chk(duration_between(K("date", "1984-10-11"),
                         K("date", "2015-06-24")), "P30Y8M13D")
    chk(duration_between(K("date", "1984-10-11"),
                         K("localdatetime", "2016-07-21T21:45:22.142")),
        "P31Y9M10DT21H45M22.142S")


# ------------------------------------------------------------- truncate

def test_truncate():
    chk(truncate("date", "millennium",
                 K("date", {"year": 2017, "month": 10, "day": 11}),
                 {"day": 2}), "2000-01-02")
    chk(truncate("date", "century",
                 K("date", {"year": 1984, "month": 10, "day": 11})),
        "1900-01-01")
    chk(truncate("date", "millennium",
                 K("datetime", {"year": 2017, "month": 10, "day": 11,
                                "hour": 12, "minute": 31, "second": 14,
                                "nanosecond": 645876123,
                                "timezone": "+01:00"})), "2000-01-01")
    chk(truncate("date", "decade",
                 K("date", {"year": 1984, "month": 10, "day": 11})),
        "1980-01-01")
    chk(truncate("localdatetime", "hour",
                 K("localdatetime", "2017-11-11T12:31:14.645876123")),
        "2017-11-11T12:00")


# ---------------------------------------------- conversion / projection

def test_date_projection_with_overrides():
    o = K("date", {"year": 1984, "month": 11, "day": 11})
    chk(K("date", {"date": o, "week": 1}), "1984-01-08")
    chk(K("date", {"date": o, "ordinalDay": 28}), "1984-01-28")
    chk(K("date", {"date": o, "quarter": 3}), "1984-08-11")
    chk(K("date", {"date": o, "year": 28}), "0028-11-11")


def test_time_zone_conversion_on_override():
    t = K("time", {"hour": 12, "minute": 31, "second": 14,
                   "microsecond": 645876, "timezone": "+01:00"})
    chk(K("localtime", t), "12:31:14.645876")
    chk(K("time", {"time": t, "timezone": "+05:00"}),
        "16:31:14.645876+05:00")
    chk(K("time", {"time": t, "second": 42, "timezone": "+05:00"}),
        "16:31:42.645876+05:00")
    lt = K("localtime", {"hour": 12, "minute": 31, "second": 14,
                         "nanosecond": 645876123})
    chk(K("time", {"time": lt, "timezone": "+05:00"}),
        "12:31:14.645876123+05:00")
    chk(K("time", lt), "12:31:14.645876123Z")


def test_datetime_from_date_and_components():
    ldt = K("localdatetime", {"year": 1984, "week": 10, "dayOfWeek": 3,
                              "hour": 12, "minute": 31, "second": 14,
                              "millisecond": 645})
    chk(K("datetime", {"date": ldt, "hour": 10, "minute": 10,
                       "second": 10, "timezone": "+05:00"}),
        "1984-03-07T10:10:10+05:00")


def test_epoch_construction():
    chk(K("datetime", {"epochSeconds": 416779, "nanosecond": 999}),
        "1970-01-05T19:46:19.000000999Z")


# ------------------------------------------------------------ comparison

def test_sort_and_equality():
    assert sort_key(K("date", "1980-12-24")) < \
        sort_key(K("date", "1984-10-11"))
    x = K("time", {"hour": 10, "minute": 0, "timezone": "+01:00"})
    d = K("time", {"hour": 9, "minute": 35, "second": 14,
                   "nanosecond": 645876123, "timezone": "+00:00"})
    assert sort_key(x) < sort_key(d)
    assert not equals(x, d)
    assert equals(K("date", "1984-10-11"), K("date", "1984-10-11"))
    assert not equals(K("duration", {"days": 1}),
                      K("date", "1984-10-11"))
    with pytest.raises(TemporalError):
        sort_key(KDuration(0, 1, 0))


def test_errors():
    with pytest.raises(TemporalError):
        K("date", {"year": 1984, "day": 11})      # day without month
    with pytest.raises(TemporalError):
        K("date", {"month": 5, "day": 11})        # no year
    with pytest.raises(TemporalError):
        K("date", {"year": 1984, "month": 13, "day": 1})
    with pytest.raises(TemporalError):
        K("date", "not a date")
    with pytest.raises(TemporalError):
        K("date", {"year": 1984, "week": 2, "month": 5})  # mixed
    with pytest.raises(TemporalError):
        dur_divide(K("duration", {"days": 1}), 0)
