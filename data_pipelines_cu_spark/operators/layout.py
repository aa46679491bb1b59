"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the fastest query is the one that skips most of the table:
parquet row-group min/max statistics prune scans only when rows with
similar column values sit in the same files. Sorting clusters ONE column;
a space-filling curve (Z-order/Morton, the Delta/Iceberg OPTIMIZE ZORDER
technique) interleaves the bits of several columns so range predicates on
ANY of them touch a bounded fraction of files. The curve key is pure
integer bit-algebra — engine-portable and oracle-gated like every other
operator here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into one
    Z-order key: result bit 2i = bit i of ``a``, bit 2i+1 = bit i of
    ``b``. Built-in shift/mask algebra — whole-stage codegen, no UDF.
    The interleaved terms occupy disjoint bit positions, so plain
    ADDITION assembles the key exactly (PySpark's ``|`` is logical, not
    bitwise)."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = (
            acc
            + F.shiftleft(F.shiftright(a.cast("long"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(b.cast("long"), i) % 2, 2 * i + 1)
        )
    return acc


def morton_code_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of morton_code (same shifts, same disjoint-bit sum)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) % 2) << {2 * i})")
        terms.append(f"((({b} >> {i}) % 2) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_key(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    x_max: int,
    y_max: int,
    id_cols: list[str],
    bits: int = 16,
    out: str = "zorder",
) -> DataFrame:
    """(id_cols..., zorder): each dimension scaled to [0, 2^bits) by its
    stated max (exact integer arithmetic: v * 2^bits // (max + 1)), then
    bit-interleaved. Values beyond the stated max CLAMP to the top cell —
    without the clamp they would overflow past bit ``bits`` and silently
    alias onto the LOWEST cells (non-monotone clustering), which no
    correctness gate can see because any twin computing the same formula
    aliases identically. Rows near each other in BOTH dimensions get
    nearby keys, so a range-partitioned write clusters them into the same
    files and min/max pruning works for predicates on either column."""
    scale = 1 << bits
    xs = (
        F.least(x_col.cast("long"), F.lit(x_max)) * scale / F.lit(x_max + 1)
    ).cast("long")
    ys = (
        F.least(y_col.cast("long"), F.lit(y_max)) * scale / F.lit(y_max + 1)
    ).cast("long")
    return df.select(*id_cols, morton_code(xs, ys, bits).alias(out))


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    x_max: int,
    y_max: int,
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet range-partitioned by the Z-order key of
    (x_col, y_col): each output file covers a compact curve segment, so
    row-group min/max stats on BOTH columns are tight and predicates on
    either prune files. The key is dropped from the stored schema."""
    scale = 1 << bits
    xs = (
        F.least(F.col(x_col).cast("long"), F.lit(x_max))
        * scale
        / F.lit(x_max + 1)
    ).cast("long")
    ys = (
        F.least(F.col(y_col).cast("long"), F.lit(y_max))
        * scale
        / F.lit(y_max + 1)
    ).cast("long")
    keyed = df.withColumn("_z", morton_code(xs, ys, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
