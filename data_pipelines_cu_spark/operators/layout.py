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


def _clamp(col: Column, max_val: int) -> Column:
    """Clamp to [0, max_val] on longs. BOTH bounds matter: above the max
    the scaled value overflows past bit ``bits`` and aliases onto low
    cells; BELOW ZERO shiftright/% on negative longs produce negative
    Morton terms and a corrupt, non-monotone key. Either failure is
    invisible to an identical-formula oracle twin, so the clamp is the
    contract."""
    return F.greatest(
        F.lit(0).cast("long"), F.least(col.cast("long"), F.lit(max_val))
    )


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
    stated max (exact integer arithmetic: v * 2^bits div (max + 1) on
    longs — SQL ``div``, never double division), then bit-interleaved.
    Values outside [0, max] CLAMP to the edge cells — above the max they
    would overflow past bit ``bits`` and silently alias onto the LOWEST
    cells; below zero the shift/mod algebra yields negative Morton terms
    and a non-monotone key. Neither failure is visible to a correctness
    gate because any twin computing the same formula aliases identically.
    Rows near each other in BOTH dimensions get
    nearby keys, so a range-partitioned write clusters them into the same
    files and min/max pruning works for predicates on either column."""
    scale = 1 << bits
    clamped = df.select(
        *id_cols,
        _clamp(x_col, x_max).alias("_zx"),
        _clamp(y_col, y_max).alias("_zy"),
    )
    xs = F.expr(f"_zx * {scale}L div {x_max + 1}L")
    ys = F.expr(f"_zy * {scale}L div {y_max + 1}L")
    return clamped.select(*id_cols, morton_code(xs, ys, bits).alias(out))


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
    keyed = (
        df.withColumn("_zx", _clamp(F.col(x_col), x_max))
        .withColumn("_zy", _clamp(F.col(y_col), y_max))
        .withColumn(
            "_z",
            morton_code(
                F.expr(f"_zx * {scale}L div {x_max + 1}L"),
                F.expr(f"_zy * {scale}L div {y_max + 1}L"),
                bits,
            ),
        )
        .drop("_zx", "_zy")
    )
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
