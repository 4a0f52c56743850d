"""Packed-binary token codec: ``tokens array<int32>`` ⇄ one fixed-width
little-endian ``binary`` blob (4 bytes/token).

Why: parquet stores an int array as a repeated LIST — the scan must decode
per-element repetition levels and materialize a JVM array object per row,
which is the measured hot spot of token validation (BENCH/BASELINE.md). A
BINARY column decodes as one contiguous byte run per row, and Arrow hands a
whole batch to Python as ONE buffer + offsets — so the element checks run as
numpy ``reduceat`` over the raw buffer with zero per-row Python objects
(``mapInArrow``, not a row loop). Same information, ~flat decode cost.

This is an OPTIONAL acceleration layout for token tables at rest (the
engine's canonical input stays ``array<int32>`` per the reference's data
model); ``pack_tokens``/``unpack_tokens`` convert losslessly.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "pack_tokens_udf",
    "unpack_tokens_udf",
    "packed_n_tok",
    "packed_token_stats",
]


def pack_tokens_udf():
    """array<int32> → binary (little-endian int32, 4 B/token). One-time ETL
    step; vectorized per Arrow batch via numpy."""

    @F.pandas_udf(T.BinaryType())
    def _pack(col):
        import numpy as np
        import pandas as pd

        return pd.Series(
            [
                None if v is None else np.asarray(v, dtype="<i4").tobytes()
                for v in col
            ],
            dtype=object,
        )

    return _pack


def unpack_tokens_udf():
    """binary → array<int32> (inverse of pack_tokens_udf)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _unpack(col):
        import numpy as np
        import pandas as pd

        return pd.Series(
            [
                None if v is None else np.frombuffer(v, dtype="<i4")
                for v in col
            ],
            dtype=object,
        )

    return _unpack


def packed_n_tok(col: Column | str) -> Column:
    """Token count of a packed blob — pure codegen (length/4), no decode."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) / 4).cast("int")


def packed_token_stats(
    df: DataFrame,
    packed_col: str = "tokens_bin",
    id_col: str | None = None,
) -> DataFrame:
    """Per-row (n_tok, min_tok, max_tok) over the packed column WITHOUT any
    per-row Python: ``mapInArrow`` receives each Arrow batch's binary column
    as one contiguous data buffer + offsets; one ``np.frombuffer`` views the
    whole batch and ``np.minimum/maximum.reduceat`` computes per-row extrema
    at memory-bandwidth speed. Rows with empty/NULL blobs yield NULL extrema.

    The element-range check (north-star ``tokens__element_range``) is then a
    plain Column predicate over (min_tok, max_tok).
    """
    import pyarrow as pa

    out_fields = []
    if id_col is not None:
        out_fields.append(T.StructField(id_col, df.schema[id_col].dataType, True))
    out_fields += [
        T.StructField("n_tok_bin", T.IntegerType(), True),
        T.StructField("min_tok", T.IntegerType(), True),
        T.StructField("max_tok", T.IntegerType(), True),
    ]
    out_schema = T.StructType(out_fields)

    cols = ([id_col] if id_col else []) + [packed_col]

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import numpy as np
        import pyarrow as _pa

        for batch in batches:
            bin_arr = batch.column(len(batch.schema) - 1)
            if isinstance(bin_arr, _pa.ChunkedArray):  # pragma: no cover
                bin_arr = bin_arr.combine_chunks()
            # LargeBinary/Binary layout: buffers = [validity, offsets, data]
            validity, offsets_buf, data_buf = bin_arr.buffers()
            off_dtype = (
                np.int64 if _pa.types.is_large_binary(bin_arr.type) else np.int32
            )
            offsets = np.frombuffer(offsets_buf, dtype=off_dtype)[
                bin_arr.offset : bin_arr.offset + len(bin_arr) + 1
            ]
            # bound the token view at the last offset: the Arrow data buffer
            # may carry padding past the array's bytes, and reduceat's final
            # segment runs to the end of whatever array it is given
            toks = np.frombuffer(data_buf, dtype="<i4")[: int(offsets[-1]) // 4]
            starts = (offsets[:-1] // 4).astype("int64")
            ends = (offsets[1:] // 4).astype("int64")
            n = (ends - starts).astype("int32")
            mins = np.zeros(len(n), dtype="int32")
            maxs = np.zeros(len(n), dtype="int32")
            nonempty = n > 0
            if nonempty.any():
                idx = starts[nonempty]
                mins[nonempty] = np.minimum.reduceat(toks, idx)
                maxs[nonempty] = np.maximum.reduceat(toks, idx)
            if validity is not None:
                invalid = ~np.unpackbits(
                    np.frombuffer(validity, dtype=np.uint8), bitorder="little"
                )[bin_arr.offset : bin_arr.offset + len(bin_arr)].astype(bool)
            else:
                invalid = np.zeros(len(n), dtype=bool)
            # NULL blob → all three NULL; empty (non-null) blob → n=0 with
            # NULL extrema (no values to aggregate)
            ext_mask = invalid | ~nonempty
            arrs, names = [], []
            if id_col is not None:
                arrs.append(batch.column(0))
                names.append(id_col)
            arrs.append(_pa.array(n, type=_pa.int32(), mask=invalid))
            names.append("n_tok_bin")
            arrs.append(_pa.array(mins, type=_pa.int32(), mask=ext_mask))
            names.append("min_tok")
            arrs.append(_pa.array(maxs, type=_pa.int32(), mask=ext_mask))
            names.append("max_tok")
            yield _pa.RecordBatch.from_arrays(arrs, names=names)

    return df.select(*cols).mapInArrow(run, out_schema)
