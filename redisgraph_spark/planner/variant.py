"""Per-value variant property encoding.

The reference is schemaless: one property key can hold an int on one
node and a string on another (``SIValue``, src/value.h:16-41; schema is
"attributes encountered over time", src/schema/schema.h:20-28). Spark
columns are typed, so when a single label table ends up with
conflicting value types for one property we encode that column as a
tagged struct — a poor man's union type:

    struct<_vt: tinyint, _i: bigint, _d: double, _s: string,
           _b: boolean, _a: array<struct<_vt,_i,_d,_s,_b>>>

Exactly one payload field is set per row; the whole struct is NULL when
the property is absent (schemaless missing-property semantics,
src/graph/entities/graph_entity.h:48-58). Tags: 1=int 2=float 3=string
4=bool 5=array. Array payloads hold one level of heterogeneous scalar
elements (the element struct is the scalar prefix of the variant, so
the encoding does not recurse — nested arrays demote to string, the
documented residual gap).

Semantics mirrored from the reference:
- cross-type ``=`` is false, cross-type ``<`` is null (DISJOINT,
  src/value.h:76-77,189-192); int and double cross-compare by value
  (src/value.h:58-60)
- ORDER BY uses the global type order — array < string < bool <
  numeric — derived from the SIType enum ordering (src/value.h:19-41)
- arithmetic uses the numeric interpretation (non-numerics → null);
  ``+`` with an array payload concatenates/appends
  (SIValue_ConcatList, src/value.c:380-410)
- arrays compare elementwise with length tie-break
  (SIArray_Compare, src/value.c:455-501)
"""
from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

ELEM_FIELDS = ("_vt", "_i", "_d", "_s", "_b")
VARIANT_FIELDS = ELEM_FIELDS + ("_a",)

ELEM_TYPE = T.StructType([
    T.StructField("_vt", T.ByteType()),
    T.StructField("_i", T.LongType()),
    T.StructField("_d", T.DoubleType()),
    T.StructField("_s", T.StringType()),
    T.StructField("_b", T.BooleanType()),
])

# array-payload element: a scalar OR itself a one-level array of
# scalars — so a variant list can mix scalars with nested lists
# ([1, 'a', [1, 2]]), one nesting level deep
MID_TYPE = T.StructType(
    list(ELEM_TYPE.fields) + [T.StructField("_a", T.ArrayType(ELEM_TYPE))])

VARIANT_TYPE = T.StructType(
    list(ELEM_TYPE.fields) + [T.StructField("_a", T.ArrayType(MID_TYPE))])

TAG_INT, TAG_FLOAT, TAG_STRING, TAG_BOOL, TAG_ARRAY = 1, 2, 3, 4, 5

_INT_TYPES = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
_FLOAT_TYPES = (T.DoubleType, T.FloatType, T.DecimalType)
_SCALAR_TYPES = _INT_TYPES + _FLOAT_TYPES + (T.BooleanType, T.StringType)


def is_variant_type(dt: T.DataType) -> bool:
    return isinstance(dt, T.StructType) and \
        tuple(f.name for f in dt.fields) == VARIANT_FIELDS


def variantable(dt: T.DataType) -> bool:
    """Type can be a variant payload: scalar, array of scalars, array
    of scalar-arrays (one nesting level), or already a variant."""
    if isinstance(dt, _SCALAR_TYPES) or is_variant_type(dt):
        return True
    if not isinstance(dt, T.ArrayType):
        return False
    et = dt.elementType
    if isinstance(et, _SCALAR_TYPES):
        return True
    return isinstance(et, T.ArrayType) and \
        isinstance(et.elementType, _SCALAR_TYPES)


def _pack_elem(tag: int, i=None, d=None, s=None, b=None) -> Column:
    n = F.lit(None)
    return F.struct(
        F.lit(tag).cast("tinyint").alias("_vt"),
        (i if i is not None else n.cast("long")).alias("_i"),
        (d if d is not None else n.cast("double")).alias("_d"),
        (s if s is not None else n.cast("string")).alias("_s"),
        (b if b is not None else n.cast("boolean")).alias("_b"))


def _pack(tag: int, i=None, d=None, s=None, b=None, a=None) -> Column:
    n = F.lit(None)
    return F.struct(
        F.lit(tag).cast("tinyint").alias("_vt"),
        (i if i is not None else n.cast("long")).alias("_i"),
        (d if d is not None else n.cast("double")).alias("_d"),
        (s if s is not None else n.cast("string")).alias("_s"),
        (b if b is not None else n.cast("boolean")).alias("_b"),
        (a if a is not None
         else n.cast(T.ArrayType(MID_TYPE))).alias("_a"))


def _pack_mid(tag: int, i=None, d=None, s=None, b=None, a=None) -> Column:
    n = F.lit(None)
    return F.struct(
        F.lit(tag).cast("tinyint").alias("_vt"),
        (i if i is not None else n.cast("long")).alias("_i"),
        (d if d is not None else n.cast("double")).alias("_d"),
        (s if s is not None else n.cast("string")).alias("_s"),
        (b if b is not None else n.cast("boolean")).alias("_b"),
        (a if a is not None
         else n.cast(T.ArrayType(ELEM_TYPE))).alias("_a"))


def _elem_encode(col: Column, dt: T.DataType) -> Column:
    """Encode one scalar value as a scalar array-element struct (null
    in → null element)."""
    if isinstance(dt, _INT_TYPES):
        packed = _pack_elem(TAG_INT, i=col.cast("long"))
    elif isinstance(dt, _FLOAT_TYPES):
        packed = _pack_elem(TAG_FLOAT, d=col.cast("double"))
    elif isinstance(dt, T.BooleanType):
        packed = _pack_elem(TAG_BOOL, b=col)
    else:
        packed = _pack_elem(TAG_STRING, s=col.cast("string"))
    return F.when(col.isNotNull(), packed)


def _mid_encode(col: Column, dt: T.DataType) -> Column:
    """Encode one value as a MID array-element struct: scalars as-is,
    arrays of scalars as a nested TAG_ARRAY payload."""
    if isinstance(dt, T.ArrayType):
        et = dt.elementType
        packed = _pack_mid(
            TAG_ARRAY, a=F.transform(col, lambda x: _elem_encode(x, et)))
        return F.when(col.isNotNull(), packed)
    if isinstance(dt, _INT_TYPES):
        packed = _pack_mid(TAG_INT, i=col.cast("long"))
    elif isinstance(dt, _FLOAT_TYPES):
        packed = _pack_mid(TAG_FLOAT, d=col.cast("double"))
    elif isinstance(dt, T.BooleanType):
        packed = _pack_mid(TAG_BOOL, b=col)
    else:
        packed = _pack_mid(TAG_STRING, s=col.cast("string"))
    return F.when(col.isNotNull(), packed)


def elem_to_variant(e: Column) -> Column:
    """Widen a MID array-element struct back to a full variant
    (subscript / UNWIND result surface)."""
    widened = F.struct(
        e["_vt"].alias("_vt"), e["_i"].alias("_i"), e["_d"].alias("_d"),
        e["_s"].alias("_s"), e["_b"].alias("_b"),
        F.transform(
            e["_a"],
            lambda x: F.when(x.isNotNull(), F.struct(
                x["_vt"].alias("_vt"), x["_i"].alias("_i"),
                x["_d"].alias("_d"), x["_s"].alias("_s"),
                x["_b"].alias("_b"),
                F.lit(None).cast(T.ArrayType(ELEM_TYPE)).alias("_a")))
        ).alias("_a"))
    return F.when(e.isNotNull(), widened)


def elem_of(v: Column) -> Column:
    """MID form of a variant — the element used when appending a
    variant onto an array payload. Payload nesting deeper than MID
    supports (arrays inside the array) truncates to the scalar prefix
    of each inner element."""
    mid = F.struct(
        v["_vt"].alias("_vt"), v["_i"].alias("_i"),
        v["_d"].alias("_d"), v["_s"].alias("_s"), v["_b"].alias("_b"),
        F.transform(
            v["_a"],
            lambda x: F.when(x.isNotNull(), F.struct(
                x["_vt"].alias("_vt"), x["_i"].alias("_i"),
                x["_d"].alias("_d"), x["_s"].alias("_s"),
                x["_b"].alias("_b")))).alias("_a"))
    return F.when(v.isNotNull(), mid)


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
    elif isinstance(dt, T.ArrayType) and \
            (isinstance(dt.elementType, _SCALAR_TYPES)
             or (isinstance(dt.elementType, T.ArrayType)
                 and isinstance(dt.elementType.elementType,
                                _SCALAR_TYPES))):
        et = dt.elementType
        packed = _pack(TAG_ARRAY,
                       a=F.transform(col, lambda x: _mid_encode(x, et)))
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


def arr_view(v: Column) -> Column:
    return F.when(v["_vt"] == TAG_ARRAY, v["_a"])


def _scalar_render(e: Column) -> Column:
    return F.when(e["_vt"] == TAG_INT, e["_i"].cast("string")) \
            .when(e["_vt"] == TAG_FLOAT, e["_d"].cast("string")) \
            .when(e["_vt"] == TAG_STRING, e["_s"]) \
            .when(e["_vt"] == TAG_BOOL, e["_b"].cast("string"))


def _elem_render(e: Column) -> Column:
    return F.when(
        e["_vt"] == TAG_ARRAY,
        F.concat(F.lit("["),
                 F.array_join(F.transform(e["_a"], _scalar_render),
                              ", ", "null"),
                 F.lit("]"))).otherwise(_scalar_render(e))


def render(v: Column) -> Column:
    """Lossy string rendering for the final RETURN surface (a DataFrame
    column must have ONE type; mid-query semantics stay typed). Arrays
    render ``[e1, e2]`` (SIArray_ToString shape, src/value.c:287)."""
    return F.when(v["_vt"] == TAG_INT, v["_i"].cast("string")) \
            .when(v["_vt"] == TAG_FLOAT, v["_d"].cast("string")) \
            .when(v["_vt"] == TAG_STRING, v["_s"]) \
            .when(v["_vt"] == TAG_BOOL, v["_b"].cast("string")) \
            .when(v["_vt"] == TAG_ARRAY,
                  F.concat(F.lit("["),
                           F.array_join(
                               F.transform(v["_a"], _elem_render),
                               ", ", "null"),
                           F.lit("]")))


def add(l: Column, r: Column) -> Column:
    """Per-row Cypher ``+`` over two VARIANT columns, returning a
    variant. Branch order mirrors SIValue_Add (src/value.c:408-418):
    null → null; an array payload on either side concatenates/appends
    (SIValue_ConcatList, src/value.c:380-406); then a string payload
    concatenates (``'a' + 1 = 'a1'``); numeric payloads add (int+int
    stays int, any float → float); anything else → null. Normalize a
    typed operand with ``to_variant`` before calling."""
    either_arr = (l["_vt"] == TAG_ARRAY) | (r["_vt"] == TAG_ARRAY)
    either_str = (l["_vt"] == TAG_STRING) | (r["_vt"] == TAG_STRING)
    num_sum = num_view(l) + num_view(r)
    both_int = (l["_vt"] == TAG_INT) & (r["_vt"] == TAG_INT)
    # scalar side wraps into a one-element list before concat
    l_arr = F.when(l["_vt"] == TAG_ARRAY, l["_a"]) \
             .otherwise(F.array(elem_of(l)))
    r_arr = F.when(r["_vt"] == TAG_ARRAY, r["_a"]) \
             .otherwise(F.array(elem_of(r)))
    return (
        F.when(l.isNull() | r.isNull(), F.lit(None).cast(VARIANT_TYPE))
         .when(either_arr, _pack(TAG_ARRAY, a=F.concat(l_arr, r_arr)))
         .when(either_str,
               _pack(TAG_STRING, s=F.concat(render(l), render(r))))
         # int+int adds in LONG — routing through the double num_view
         # would silently round int64 values beyond 2^53
         .when(both_int, _pack(TAG_INT, i=l["_i"] + r["_i"]))
         .when(num_sum.isNotNull(), _pack(TAG_FLOAT, d=num_sum)))


def _scalar_canon(e: Column) -> Column:
    """Canonical comparable form of a scalar array element: (type-rank,
    payload) so struct comparison orders by type first (disjoint elems
    order by type delta, src/value.c:553) then value, with int/double

    Known precision limit: the numeric payload canonicalizes to double
    so int-vs-float compares work (3 = 3.0); int64 values beyond 2^53
    therefore compare at double precision here (arithmetic — add —
    stays exact in long).
    unified by numeric value (src/value.h:58-60)."""
    rank = (F.when(e["_vt"] == TAG_STRING, 1)
             .when(e["_vt"] == TAG_BOOL, 2)
             .when(e["_vt"].isin(TAG_INT, TAG_FLOAT), 3)).cast("tinyint")
    num = F.when(e["_vt"] == TAG_INT, e["_i"].cast("double")) \
           .when(e["_vt"] == TAG_FLOAT, e["_d"])
    key = F.struct(rank.alias("r"), e["_s"].alias("s"),
                   e["_b"].alias("b"), num.alias("n"))
    # null elements carry an explicit max rank so they sort LAST in
    # ascending array order (openCypher null ordering; Spark's native
    # null-element handling in array comparison is nulls-first)
    null_key = F.struct(F.lit(9).cast("tinyint").alias("r"),
                        F.lit(None).cast("string").alias("s"),
                        F.lit(None).cast("boolean").alias("b"),
                        F.lit(None).cast("double").alias("n"))
    # a degraded null element (struct of nulls after an array widening
    # round-trip) canonicalizes like a true NULL element
    return F.when(e.isNotNull() & e["_vt"].isNotNull(),
                  key).otherwise(null_key)


def _elem_canon(e: Column) -> Column:
    """Canonical form of a MID element: arrays rank below every scalar
    (global type order, src/value.h:19-41) and compare element-wise."""
    rank = (F.when(e["_vt"] == TAG_ARRAY, 0)
             .when(e["_vt"] == TAG_STRING, 1)
             .when(e["_vt"] == TAG_BOOL, 2)
             .when(e["_vt"].isin(TAG_INT, TAG_FLOAT), 3)).cast("tinyint")
    num = F.when(e["_vt"] == TAG_INT, e["_i"].cast("double")) \
           .when(e["_vt"] == TAG_FLOAT, e["_d"])
    arr = F.when(e["_vt"] == TAG_ARRAY,
                 F.transform(e["_a"], _scalar_canon))
    key = F.struct(rank.alias("r"), arr.alias("a"), e["_s"].alias("s"),
                   e["_b"].alias("b"), num.alias("n"))
    null_key = F.struct(
        F.lit(9).cast("tinyint").alias("r"),
        F.lit(None).cast(
            T.ArrayType(_scalar_canon_type())).alias("a"),
        F.lit(None).cast("string").alias("s"),
        F.lit(None).cast("boolean").alias("b"),
        F.lit(None).cast("double").alias("n"))
    return F.when(e.isNotNull() & e["_vt"].isNotNull(),
                  key).otherwise(null_key)


def _scalar_canon_type() -> T.StructType:
    return T.StructType([
        T.StructField("r", T.ByteType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("n", T.DoubleType())])


def arr_canon(v: Column) -> Column:
    """Canonical comparable array from a variant's array payload —
    Spark's array ordering (elementwise, then length) matches
    SIArray_Compare's common-range-then-lenDiff shape
    (src/value.c:455-501). Null elements compare equal-to-each-other
    under Spark's canonical ordering, so comparison OPERATORS use the
    ternary ``arr_eq3``/``arr_cmp3`` instead; this canonical form
    remains for IN-membership and ORDER BY keys, where a total order
    is required."""
    return F.when(v["_vt"] == TAG_ARRAY, F.transform(v["_a"], _elem_canon))


def _elem_cmp3(a: Column, b: Column) -> Column:
    """Ternary comparison of two MID elements: −1/0/1 int, or null when
    either element is null or the types are disjoint (SIValue_Compare
    COMPARED_NULL/DISJOINT propagation, src/value.c:553-600)."""
    nulli = F.lit(None).cast("int")

    def num(e):
        return F.when(e["_vt"] == TAG_INT, e["_i"].cast("double")) \
                .when(e["_vt"] == TAG_FLOAT, e["_d"])

    def sgn(x, y):
        return F.when(x < y, -1).when(x > y, 1).otherwise(0)

    an, bn = num(a), num(b)
    return (
        F.when(a.isNull() | b.isNull(), nulli)
         .when(an.isNotNull() & bn.isNotNull(), sgn(an, bn))
         .when((a["_vt"] == TAG_STRING) & (b["_vt"] == TAG_STRING),
               sgn(a["_s"], b["_s"]))
         .when((a["_vt"] == TAG_BOOL) & (b["_vt"] == TAG_BOOL),
               sgn(a["_b"].cast("int"), b["_b"].cast("int")))
         .when((a["_vt"] == TAG_ARRAY) & (b["_vt"] == TAG_ARRAY),
               sgn(F.transform(a["_a"], _scalar_canon),
                   F.transform(b["_a"], _scalar_canon)))
         .otherwise(nulli))


def _elem_eq3(a: Column, b: Column) -> Column:
    """Ternary equality of two MID elements: null when either element
    is null, FALSE when the types are disjoint (definitively unequal,
    AR_EQ boolean_funcs.c:143-163), else value equality."""
    nullb = F.lit(None).cast("boolean")

    def num(e):
        return F.when(e["_vt"] == TAG_INT, e["_i"].cast("double")) \
                .when(e["_vt"] == TAG_FLOAT, e["_d"])

    an, bn = num(a), num(b)
    return (
        F.when(a.isNull() | b.isNull(), nullb)
         .when(an.isNotNull() & bn.isNotNull(), an == bn)
         .when((a["_vt"] == TAG_STRING) & (b["_vt"] == TAG_STRING),
               a["_s"] == b["_s"])
         .when((a["_vt"] == TAG_BOOL) & (b["_vt"] == TAG_BOOL),
               a["_b"] == b["_b"])
         .when((a["_vt"] == TAG_ARRAY) & (b["_vt"] == TAG_ARRAY),
               F.transform(a["_a"], _scalar_canon) ==
               F.transform(b["_a"], _scalar_canon))
         .otherwise(F.lit(False)))


def arr_eq3(l_elems: Column, r_elems: Column) -> Column:
    """Ternary list equality over MID element arrays (openCypher:
    length mismatch or any definitely-unequal pair → false; else a
    null-involving pair → null; else true)."""
    nullb = F.lit(None).cast("boolean")
    n = F.least(F.size(l_elems), F.size(r_elems))
    pair = F.zip_with(F.slice(l_elems, 1, n), F.slice(r_elems, 1, n),
                      _elem_eq3)
    any_false = F.exists(pair, lambda x: ~F.coalesce(x, F.lit(True)))
    any_null = F.exists(pair, lambda x: x.isNull())
    return F.when(l_elems.isNull() | r_elems.isNull(), nullb) \
            .when(F.size(l_elems) != F.size(r_elems), F.lit(False)) \
            .when(any_false, F.lit(False)) \
            .when(any_null, nullb) \
            .otherwise(F.lit(True))


def arr_cmp3(l_elems: Column, r_elems: Column) -> Column:
    """Ternary lexicographic ordering over two arrays of MID elements:
    −1/0/1, null when the first non-equal pair involves a null element
    or disjoint types (SIArray_Compare, src/value.c:455-501 — compare
    the common range element-wise, then the length difference)."""
    n = F.least(F.size(l_elems), F.size(r_elems))
    pair = F.zip_with(F.slice(l_elems, 1, n), F.slice(r_elems, 1, n),
                      _elem_cmp3)
    deciding = F.filter(pair, lambda x: x.isNull() | (x != 0))
    return F.when(l_elems.isNull() | r_elems.isNull(),
                  F.lit(None).cast("int")) \
            .when(F.size(deciding) > 0, F.element_at(deciding, 1)) \
            .otherwise(F.when(F.size(l_elems) < F.size(r_elems), -1)
                        .when(F.size(l_elems) > F.size(r_elems), 1)
                        .otherwise(0))


def arr_canon_plain(col: Column, dt: T.ArrayType) -> Column:
    """Canonical comparable array from a plain typed array column (the
    non-variant side of a comparison)."""
    et = dt.elementType
    return F.transform(col, lambda x: _elem_canon(_mid_encode(x, et)))


def sort_key(v: Column) -> Column:
    """Global-type-order sort key (array < string < bool < numeric,
    from the SIType enum ordering src/value.h:19-41). Rows of equal
    rank carry identical null patterns in the payload fields, so struct
    comparison falls through the inactive (null==null) fields to the
    active one."""
    rank = (F.when(v["_vt"] == TAG_ARRAY, 0)
             .when(v["_vt"] == TAG_STRING, 1)
             .when(v["_vt"] == TAG_BOOL, 2)
             .when(v["_vt"].isin(TAG_INT, TAG_FLOAT), 3)).cast("tinyint")
    key = F.struct(rank.alias("r"), arr_canon(v).alias("a"),
                   v["_s"].alias("s"), v["_b"].alias("b"),
                   num_view(v).alias("n"))
    # a null variant must yield a NULL key (not a struct of nulls) so
    # asc_nulls_last/desc_nulls_first see it as a null value
    return F.when(v.isNotNull(), key)
