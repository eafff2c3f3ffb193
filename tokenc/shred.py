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
          and isinstance(dtype.elementType, T.ArrayType)):
        # array<array<prim>> (repeated-of-repeated): outer structure as an
        # inner-length array (null element = null inner array) + flattened
        # elements. Reassembly is pure offset arithmetic — linear, done in
        # Arrow inside unshred_df's mapInArrow pass (Spark expressions
        # would need a per-row prefix-sum scan, which is O(n²) in HOFs).
        out.append(F.transform(base, lambda x: F.when(x.isNotNull(), F.size(x)))
                   .alias(name + SEP + "olens"))
        out.append(F.flatten(F.transform(
            base, lambda x: F.coalesce(x, F.array())))
            .alias(name + SEP + "flat"))
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


def _is_aa(dtype) -> bool:
    return (isinstance(dtype, T.ArrayType)
            and isinstance(dtype.elementType, T.ArrayType))


def _rebuild_aa(olens, flat):
    """(olens: list<int>, flat: list<prim>) → list<list<prim>> — pure
    offset arithmetic on the Arrow buffers, linear and copy-free for the
    element data."""
    import numpy as np
    import pyarrow as pa

    olens = olens.combine_chunks() if isinstance(olens, pa.ChunkedArray) else olens
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    n = len(olens)
    row_mask = None
    if olens.null_count:
        import pyarrow.compute as pc

        row_mask = pc.is_null(olens)
    o_off = np.asarray(olens.offsets, np.int64)
    lens_child = olens.values  # int array, null = null inner array
    total = int(o_off[-1] - o_off[0])
    lc = lens_child.slice(o_off[0], total)
    inner_valid = np.asarray(lc.is_valid()) if lc.null_count else None
    fill = lc.fill_null(0) if lc.null_count else lc
    lens_np = np.asarray(fill).astype(np.int64)
    if inner_valid is not None:
        lens_np = np.where(inner_valid, lens_np, 0)
    io = np.zeros(total + 1, dtype=np.int32)
    np.cumsum(lens_np, out=io[1:])
    f_off = np.asarray(flat.offsets, np.int64)
    child = flat.values.slice(f_off[0], int(f_off[-1] - f_off[0]))
    inner = pa.ListArray.from_arrays(
        pa.array(io, pa.int32()), child,
        mask=pa.array(~inner_valid) if inner_valid is not None else None)
    outer = pa.ListArray.from_arrays(
        pa.array((o_off - o_off[0]).astype(np.int32), pa.int32()), inner,
        mask=row_mask)
    return outer


def unshred_df(df: DataFrame, schema: T.StructType) -> DataFrame:
    aa = [f.name for f in schema.fields if _is_aa(f.dataType)]
    if not aa:
        return df.select(*unshred_projection(schema))
    # array<array> reassembly can't be a linear Spark expression (needs a
    # per-row prefix scan) — project everything else, then one mapInArrow
    # pass rebuilds the nested lists from (olens, flat) offsets
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    exprs = []
    for f in schema.fields:
        if _is_aa(f.dataType):
            base = _seg(f.name)
            exprs.append(F.col(f"`{base + SEP}olens`"))
            exprs.append(F.col(f"`{base + SEP}flat`"))
        else:
            exprs.append(_unshred(_seg(f.name), f.dataType, f.nullable)
                         .alias(f.name))
    mid = df.select(*exprs)
    relaxed = T.StructType([T.StructField(f.name, f.dataType, True)
                            for f in schema.fields])
    out_schema = to_arrow_schema(relaxed)

    def fn(batches):
        for b in batches:
            tbl = pa.Table.from_batches([b])
            cols = []
            for f in schema.fields:
                if _is_aa(f.dataType):
                    base = _seg(f.name)
                    arr = _rebuild_aa(tbl.column(base + SEP + "olens"),
                                      tbl.column(base + SEP + "flat"))
                    cols.append(arr.cast(out_schema.field(f.name).type))
                else:
                    c = tbl.column(f.name)
                    cols.append(c.combine_chunks()
                                if isinstance(c, pa.ChunkedArray) else c)
            yield pa.RecordBatch.from_arrays(cols, schema=out_schema)

    return mid.mapInArrow(fn, relaxed)
