"""Cross-type total order for heterogeneous keys.

The reference orders apples and oranges in one skip list: ``less-than``
(utilities.lisp:237-309) defines a total order across types — null < t
(boolean) < number < timestamp < uuid < symbol < string < list — with the
natural within-type comparison (numeric, chronological, lexicographic,
element-wise recursive for lists).  The Prolog engine has the companion
"standard order of terms" ``%term-<`` (prolog-functors.lisp:437-463):
Var < Number < Char < Symbol < String < Node < Cons.

Spark columns are statically typed, so a *heterogeneous* key surfaces as a
variant struct with one non-null branch per row::

    struct<bool_v: boolean, num_v: double, ts_v: timestamp,
           str_v: string, arr_v: array<...>>

``variant_key(...)`` builds that struct from per-type expressions, and
``variant_sort_key(col)`` lowers it to a flat, engine-portable composite
``struct<rank: int, num_k: double, str_k: string>`` that any ORDER BY /
window / range-partitioner can consume — all pure Catalyst expressions, no
UDFs, so sorting stays inside whole-stage codegen and a range shuffle on the
composite behaves exactly like the reference's skip-list ordering at any
scale.

Rank assignment (``TYPE_RANKS``) mirrors utilities.lisp's effective order;
types the Parquet data model does not distinguish (symbol, uuid) collapse
into the string rank, exactly as SURVEY §7.3 documents.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# utilities.lisp:237-309 effective order (sentinels excluded — min/max
# sentinels are skip-list internals with no data-model analog).
TYPE_RANKS = {
    "null": 0,
    "boolean": 1,
    "number": 2,
    "timestamp": 3,
    "string": 4,   # symbols/uuids collapse here (SURVEY §7.3)
    "array": 5,    # lists sort last, element-wise
}

# Prolog standard order of terms (prolog-functors.lisp:437-438): used by
# setof/2 result sorting.  Vars never reach materialized output (a static
# plan grounds or fails), chars/nodes collapse into string rank.
PROLOG_TERM_RANKS = {
    "var": 0, "number": 1, "char": 2, "symbol": 3, "string": 4,
    "node": 5, "cons": 6, "other": 7,
}

_VARIANT_FIELDS = ("bool_v", "num_v", "ts_v", "str_v", "arr_v")


def variant_key(bool_v: Column | None = None, num_v: Column | None = None,
                ts_v: Column | None = None, str_v: Column | None = None,
                arr_v: Column | None = None) -> Column:
    """Build the canonical variant struct for a heterogeneous key.  Each
    argument is an expression that is non-null exactly when the row's key
    has that type (at most one branch non-null per row; all-null = null
    key, the minimum of the order)."""
    typed = {
        "bool_v": F.lit(None).cast("boolean") if bool_v is None else bool_v.cast("boolean"),
        "num_v": F.lit(None).cast("double") if num_v is None else num_v.cast("double"),
        "ts_v": F.lit(None).cast("timestamp") if ts_v is None else ts_v.cast("timestamp"),
        "str_v": F.lit(None).cast("string") if str_v is None else str_v.cast("string"),
        "arr_v": (F.lit(None).cast("array<double>") if arr_v is None
                  else arr_v.cast("array<double>")),
    }
    return F.struct(*(typed[f].alias(f) for f in _VARIANT_FIELDS))


def _array_str_key(arr: Column) -> Column:
    """Element-wise list order lowered to one string key (utilities.lisp
    list method: compare heads, recurse on tails; a strict prefix sorts
    first).  Each element is rendered as a sign digit ('0' negative, '1'
    non-negative) plus a zero-padded fixed-width decimal — negatives via a
    complement computed in EXACT decimal arithmetic (a double-domain offset
    would lose sub-1e-4 precision at the 1e15 scale).  Elements are joined
    with ',' (below '0' in ASCII) so a prefix list sorts before its
    extensions.  Domain: |e| < 1e15 at 6-decimal resolution; out-of-range
    elements render as the '~overflow' sentinel (sorts after all in-range
    values) rather than disappearing from the key."""
    offset = F.lit(10 ** 15).cast("decimal(22,6)")

    def enc(e):
        # try_cast: ANSI mode would otherwise throw on overflow instead of
        # falling through to the sentinel
        d = e.try_cast("decimal(22,6)")
        body = F.when(e < 0, (offset + d).cast("string")) \
                .otherwise(d.cast("string"))
        sign = F.when(e < 0, F.lit("0")).otherwise(F.lit("1"))
        return F.coalesce(F.concat(sign, F.lpad(body, 23, "0")),
                          F.lit("~overflow"))

    return F.array_join(F.transform(arr, enc), ",")


def variant_sort_key(v: Column) -> Column:
    """Lower a variant struct to the flat composite ``(rank, num_k, str_k)``
    implementing less-than (utilities.lisp:237-309):

    - rank: TYPE_RANKS by the non-null branch (all-null → 0)
    - num_k: booleans as 0/1, numbers as themselves, timestamps as epoch
      micros — one double lane so within-rank numeric order is native
    - str_k: strings as themselves, arrays via the element-wise encoding

    Sorting/partitioning on this struct (Spark structs compare field-by-
    field) reproduces the reference's cross-type view order."""
    rank = (F.when(v["bool_v"].isNotNull(), F.lit(TYPE_RANKS["boolean"]))
            .when(v["num_v"].isNotNull(), F.lit(TYPE_RANKS["number"]))
            .when(v["ts_v"].isNotNull(), F.lit(TYPE_RANKS["timestamp"]))
            .when(v["str_v"].isNotNull(), F.lit(TYPE_RANKS["string"]))
            .when(v["arr_v"].isNotNull(), F.lit(TYPE_RANKS["array"]))
            .otherwise(F.lit(TYPE_RANKS["null"])))
    num_k = (F.when(v["bool_v"].isNotNull(), v["bool_v"].cast("double"))
             .when(v["num_v"].isNotNull(), v["num_v"])
             .when(v["ts_v"].isNotNull(),
                   F.unix_micros(v["ts_v"]).cast("double"))
             .otherwise(F.lit(0.0)))
    str_k = (F.when(v["str_v"].isNotNull(), v["str_v"])
             .when(v["arr_v"].isNotNull(), _array_str_key(v["arr_v"]))
             .otherwise(F.lit("")))
    return F.struct(rank.alias("rank"), num_k.alias("num_k"),
                    str_k.alias("str_k"))


def variant_lit(value) -> Column:
    """Encode a driver-side Python value as a variant-key literal, for
    exact-key / range lookups against a mixed-key view.  bool must be
    tested before int (bool is an int subtype in Python)."""
    import datetime as _dt

    if value is None:
        return variant_key()
    if isinstance(value, bool):
        return variant_key(bool_v=F.lit(value))
    if isinstance(value, (int, float)):
        return variant_key(num_v=F.lit(float(value)))
    if isinstance(value, _dt.datetime):
        return variant_key(ts_v=F.lit(value))
    if isinstance(value, str):
        return variant_key(str_v=F.lit(value))
    if isinstance(value, (list, tuple)):
        return variant_key(arr_v=F.array(*(F.lit(float(x)) for x in value)))
    raise TypeError(f"no variant encoding for {type(value).__name__}")


