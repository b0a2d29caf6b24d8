"""Per-value variant property encoding.

The reference is schemaless: one property key can hold an int on one
node and a string on another (``SIValue``, src/value.h:16-41; schema is
"attributes encountered over time", src/schema/schema.h:20-28). Spark
columns are typed, so when a single label table ends up with
conflicting value types for one property we encode that column as a
tagged struct — a poor man's union type:

    struct<_vt: tinyint, _i: bigint, _d: double, _s: string, _b: boolean>

Exactly one payload field is set per row; the whole struct is NULL when
the property is absent (schemaless missing-property semantics,
src/graph/entities/graph_entity.h:48-58). Tags: 1=int 2=float 3=string
4=bool.

Semantics mirrored from the reference:
- cross-type ``=`` is false, cross-type ``<`` is null (DISJOINT,
  src/value.h:76-77,189-192); int and double cross-compare by value
  (src/value.h:58-60)
- ORDER BY uses the global type order — string < bool < numeric —
  derived from the SIType enum ordering (src/value.h:19-41)
- arithmetic uses the numeric interpretation (non-numerics → null)

Only scalar property types participate; conflicts involving arrays
keep the older string demotion (arrays are not valid variant payloads
here — matches ``SI_VALID_PROPERTY_VALUE`` being broader than what we
union, documented in COVERAGE.md).
"""
from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

VARIANT_FIELDS = ("_vt", "_i", "_d", "_s", "_b")

VARIANT_TYPE = T.StructType([
    T.StructField("_vt", T.ByteType()),
    T.StructField("_i", T.LongType()),
    T.StructField("_d", T.DoubleType()),
    T.StructField("_s", T.StringType()),
    T.StructField("_b", T.BooleanType()),
])

TAG_INT, TAG_FLOAT, TAG_STRING, TAG_BOOL = 1, 2, 3, 4

_INT_TYPES = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
_FLOAT_TYPES = (T.DoubleType, T.FloatType, T.DecimalType)


def is_variant_type(dt: T.DataType) -> bool:
    return isinstance(dt, T.StructType) and \
        tuple(f.name for f in dt.fields) == VARIANT_FIELDS


def _pack(tag: int, i=None, d=None, s=None, b=None) -> Column:
    n = F.lit(None)
    return F.struct(
        F.lit(tag).cast("tinyint").alias("_vt"),
        (i if i is not None else n.cast("long")).alias("_i"),
        (d if d is not None else n.cast("double")).alias("_d"),
        (s if s is not None else n.cast("string")).alias("_s"),
        (b if b is not None else n.cast("boolean")).alias("_b"))


def to_variant(col: Column, dt: T.DataType) -> Column:
    """Encode a plain typed column as a variant (variants pass through;
    null values stay null)."""
    if is_variant_type(dt):
        return col
    if isinstance(dt, _INT_TYPES):
        packed = _pack(TAG_INT, i=col.cast("long"))
    elif isinstance(dt, _FLOAT_TYPES):
        packed = _pack(TAG_FLOAT, d=col.cast("double"))
    elif isinstance(dt, T.BooleanType):
        packed = _pack(TAG_BOOL, b=col)
    else:
        packed = _pack(TAG_STRING, s=col.cast("string"))
    return F.when(col.isNotNull(), packed)


def num_view(v: Column) -> Column:
    """Numeric interpretation (int/double cross-comparable,
    src/value.h:58-60); non-numeric → null."""
    return F.when(v["_vt"] == TAG_INT, v["_i"].cast("double")) \
            .when(v["_vt"] == TAG_FLOAT, v["_d"])


def str_view(v: Column) -> Column:
    return F.when(v["_vt"] == TAG_STRING, v["_s"])


def bool_view(v: Column) -> Column:
    return F.when(v["_vt"] == TAG_BOOL, v["_b"])


def render(v: Column) -> Column:
    """Lossy string rendering for the final RETURN surface (a DataFrame
    column must have ONE type; mid-query semantics stay typed)."""
    return F.when(v["_vt"] == TAG_INT, v["_i"].cast("string")) \
            .when(v["_vt"] == TAG_FLOAT, v["_d"].cast("string")) \
            .when(v["_vt"] == TAG_STRING, v["_s"]) \
            .when(v["_vt"] == TAG_BOOL, v["_b"].cast("string"))


def add(l: Column, r: Column) -> Column:
    """Per-row Cypher ``+`` over two VARIANT columns, returning a
    variant: a string payload on either side concatenates (Cypher
    ``'a' + 1 = 'a1'``), numeric payloads add (int+int stays int, any
    float → float, src/value.h:176-187), anything else → null.
    Normalize a typed operand with ``to_variant`` before calling."""
    either_str = (l["_vt"] == TAG_STRING) | (r["_vt"] == TAG_STRING)
    num_sum = num_view(l) + num_view(r)
    both_int = (l["_vt"] == TAG_INT) & (r["_vt"] == TAG_INT)
    return (
        F.when(l.isNull() | r.isNull(), F.lit(None).cast(VARIANT_TYPE))
         .when(either_str,
               _pack(TAG_STRING, s=F.concat(render(l), render(r))))
         .when(both_int, _pack(TAG_INT, i=num_sum.cast("long")))
         .when(num_sum.isNotNull(), _pack(TAG_FLOAT, d=num_sum)))


def sort_key(v: Column) -> Column:
    """Global-type-order sort key (string < bool < numeric, from the
    SIType enum ordering src/value.h:19-41). Rows of equal rank carry
    identical null patterns in the payload fields, so struct comparison
    falls through the inactive (null==null) fields to the active one."""
    rank = (F.when(v["_vt"] == TAG_STRING, 1)
             .when(v["_vt"] == TAG_BOOL, 2)
             .when(v["_vt"].isin(TAG_INT, TAG_FLOAT), 3)).cast("tinyint")
    key = F.struct(rank.alias("r"), v["_s"].alias("s"),
                   v["_b"].alias("b"), num_view(v).alias("n"))
    # a null variant must yield a NULL key (not a struct of nulls) so
    # asc_nulls_last/desc_nulls_first see it as a null value
    return F.when(v.isNotNull(), key)
