"""Nested-column shredding: struct and map columns → flat leaf columns.

The reference shreds arbitrary nesting to leaf paths with Dremel levels
(marshal/marshal.go:227-343; max DL/RL per path schema/schemahandler.go:
92-150; MAP converted type common/common.go:330-525). Spark-first, the
same model costs nothing at runtime — shredding is a projection of
JVM-side expressions, no UDF, no shuffle:

  * struct s{a, b}   →  columns s__a, s__b (recursive), plus s__valid
                        when the struct itself is nullable (null-struct vs
                        struct-of-nulls, the DL distinction)
  * map<k, v> m      →  columns m__keys: array<k>, m__vals: array<v> —
                        two aligned list columns sharing one length vector
                        (the reference's key_value repeated group); null
                        map → null lists, empty map → empty lists
  * array / scalar   →  unchanged

`unshred_projection` inverts it after decode (struct(), map_from_arrays(),
when(valid)). Round trip is exact for any nesting of struct/map over the
engine's leaf types, including NULL MAP VALUES / null list elements
(the chunk format's per-element validity, chunk.py F_ELEM_NULLS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

SEP = "__"
VALID = SEP + "valid"


def _seg(field_name: str) -> str:
    """Path segment for a flat column name. Dots are sanitized: a literal
    '.' inside a field name would read as a nested-field reference in every
    downstream column lookup."""
    return field_name.replace(".", "__dot__")


def _shred(base, name: str, dtype, nullable: bool, out: list) -> None:
    if isinstance(dtype, T.StructType):
        if nullable:
            out.append(base.isNotNull().alias(name + VALID))
        for f in dtype.fields:
            _shred(base.getField(f.name), name + SEP + _seg(f.name),
                   f.dataType, f.nullable, out)
    elif isinstance(dtype, T.MapType):
        out.append(F.map_keys(base).alias(name + SEP + "keys"))
        out.append(F.map_values(base).alias(name + SEP + "vals"))
    elif (isinstance(dtype, T.ArrayType)
          and isinstance(dtype.elementType, T.StructType)):
        # array<struct{f…}> → one array column per subfield (aligned
        # lengths) + an element-validity array when struct elements can be
        # null (struct-of-nulls vs null-struct at element level)
        st = dtype.elementType
        if dtype.containsNull:
            out.append(F.transform(base, lambda x: x.isNotNull())
                       .alias(name + SEP + "evalid"))

        def getter(fname):  # NOT a default-arg lambda: pyspark reads the
            return lambda x: x.getField(fname)  # lambda's arity

        for f in st.fields:
            out.append(F.transform(base, getter(f.name))
                       .alias(name + SEP + _seg(f.name)))
    else:
        out.append(base.alias(name))


def shred_df(df: DataFrame) -> DataFrame:
    """Flatten every struct/map column to engine-ready leaf columns."""
    out: list = []
    for f in df.schema.fields:
        _shred(F.col(f"`{f.name}`"), _seg(f.name), f.dataType, f.nullable, out)
    return df.select(*out)


def _unshred(name: str, dtype, nullable: bool):
    if isinstance(dtype, T.StructType):
        st = F.struct(*[
            _unshred(name + SEP + _seg(f.name), f.dataType, f.nullable)
            .alias(f.name)
            for f in dtype.fields])
        if nullable:
            st = F.when(F.col(f"`{name + VALID}`"), st)
        return st
    if isinstance(dtype, T.MapType):
        mk = F.col(f"`{name + SEP}keys`")
        mv = F.col(f"`{name + SEP}vals`")
        return F.when(mk.isNotNull(), F.map_from_arrays(mk, mv))
    if (isinstance(dtype, T.ArrayType)
            and isinstance(dtype.elementType, T.StructType)):
        st = dtype.elementType
        cols = [F.col(f"`{name + SEP + _seg(f.name)}`") for f in st.fields]
        # positional field rename; decode makes every field nullable
        relaxed = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in st.fields])
        zipped = F.arrays_zip(*cols).cast(T.ArrayType(relaxed, containsNull=True))
        if dtype.containsNull:
            ev = F.col(f"`{name + SEP}evalid`")
            zipped = F.transform(
                zipped, lambda x, i: F.when(F.get(ev, i), x))
        return zipped
    return F.col(f"`{name}`")


def unshred_projection(schema: T.StructType) -> list:
    """Column expressions reassembling `schema` from its shredded columns."""
    return [_unshred(_seg(f.name), f.dataType, f.nullable).alias(f.name)
            for f in schema.fields]


def unshred_df(df: DataFrame, schema: T.StructType) -> DataFrame:
    return df.select(*unshred_projection(schema))
