"""Data-layout optimization: Z-order clustering for min-max scan pruning.

At 100 TB the fastest scan is the one that never happens: engines skip
parquet files/row-groups whose column min-max ranges exclude the
predicate (Spark does this at the row-group level; Delta/Iceberg at the
file level via stats). Skipping only works if the WRITE-TIME layout
keeps each file's ranges narrow for the columns queries filter on —
single-column sorting narrows one column and scrambles the rest;
Z-ordering (bit-interleaving the sort key) bounds BOTH.

`zorder_pruning` measures that property deterministically: lineitem rows
are bucketed into "files" two ways — natural insertion order (orderkey
ranges: correlated with nothing else) and Z-range cells of the
interleaved (l_partkey, l_suppkey) key — and the query reports the
average per-file key span for both layouts. A predicate on l_partkey
prunes a file iff the value falls outside its span, so avg span IS the
expected fraction of files read: the Z layout's spans are smaller on
both dimensions at once, which is the quad-tree cell guarantee (a
Z-range prefix cell covers a bounded rectangle in key space).

Plan shape: the whole computation is MAP-SIDE — the z-value is a flat
sum of shift/mask terms (one codegen expression), the file id is a
z-prefix (high bits), and the only exchanges are the two tiny per-file
aggregations. No global sort: Z-RANGE bucketing (file = z >> k) gives
the curve's locality without the single-reducer row_number a
rows-per-file split would need; production writers range-partition by z
and write within partitions, which this models exactly.

Reference parity: the reference stores events row-ordered by lsn
(SURVEY §1.2) and has no layout optimizer; this is part of the
scan-efficiency surface a 100 TB analytics engine needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from event_store_spark.plans.registry import register
from event_store_spark.tables import load_table

ZBITS = 16  # per-dimension bits after range normalization
ZFILE_SHIFT = 22  # file id = z >> shift → 2^(32-22) = 1024 max z-cells
NAT_ROWS_PER_FILE = 4096  # natural layout: orderkey-range "files"


def zvalue(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Bit-interleaved (Morton) key of two non-negative ints: bit i of
    `a` lands at position 2i, bit i of `b` at 2i+1. A flat sum of
    2*bits shift/mask terms — one whole-stage-codegen expression, no
    loop state."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _zvalue_sql(a: str, b: str, bits: int = ZBITS) -> str:
    """The identical interleave as a DuckDB expression string."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "zorder_pruning",
    oracle=f"""
    WITH lens AS (SELECT length(bin(MAX(l_partkey))) AS lp,
                         length(bin(MAX(l_suppkey))) AS ls
                  FROM lineitem),
    st AS (SELECT CASE WHEN lp >= {ZBITS} THEN 1
                       ELSE 1 << ({ZBITS} - lp) END AS p_up,
                  CASE WHEN lp > {ZBITS} THEN 1 << (lp - {ZBITS})
                       ELSE 1 END AS p_dn,
                  CASE WHEN ls >= {ZBITS} THEN 1
                       ELSE 1 << ({ZBITS} - ls) END AS s_up,
                  CASE WHEN ls > {ZBITS} THEN 1 << (ls - {ZBITS})
                       ELSE 1 END AS s_dn
           FROM lens),
    keys AS (SELECT l_orderkey, l_partkey, l_suppkey,
                    {_zvalue_sql('((l_partkey // st.p_dn) * st.p_up)',
                                 '((l_suppkey // st.s_dn) * st.s_up)')}
                        AS z
             FROM lineitem, st),
    zf AS (SELECT z >> {ZFILE_SHIFT} AS f,
                  MAX(l_partkey) - MIN(l_partkey) AS pspan,
                  MAX(l_suppkey) - MIN(l_suppkey) AS sspan
           FROM keys GROUP BY 1),
    nf AS (SELECT l_orderkey // {NAT_ROWS_PER_FILE} AS f,
                  MAX(l_partkey) - MIN(l_partkey) AS pspan,
                  MAX(l_suppkey) - MIN(l_suppkey) AS sspan
           FROM keys GROUP BY 1),
    za AS (SELECT COUNT(*) AS z_files,
                  ROUND(AVG(pspan), 2) AS z_part_span,
                  ROUND(AVG(sspan), 2) AS z_supp_span
           FROM zf),
    na AS (SELECT COUNT(*) AS nat_files,
                  ROUND(AVG(pspan), 2) AS nat_part_span,
                  ROUND(AVG(sspan), 2) AS nat_supp_span
           FROM nf)
    SELECT z_files, z_part_span, z_supp_span,
           nat_files, nat_part_span, nat_supp_span
    FROM za, na
    """,
)
def zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average per-file (l_partkey, l_suppkey) min-max spans under the
    Z-order layout vs natural insertion order — the expected scan
    fraction a point predicate on either column pays in each layout.

    The two key ranges are unequal (20× at any TPC-H sf), so each is
    normalized to ZBITS by a left shift derived from its MAX — without
    this the narrow column's bits never reach the cell prefix and its
    spans stay unconstrained (measured: supp span 999 = the full range,
    vs 31 normalized). Production Z-order writers read exactly these
    column stats before encoding; the one-row MAX aggregate is the
    in-plan form of that stats read (O(1) driver state, same pattern as
    the IVF centroids)."""
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    ).head()

    def norm(col: str, max_val: int):
        # wide keys keep their HIGH bits (zvalue reads the low ZBITS):
        # right-shift down when the range exceeds ZBITS, left-shift up
        # otherwise — found the hard way: the 10× corpus re-keys parts
        # past 2^16 and a negative left shift is an error (oracle) or
        # silent garbage (JVM masks the shift count)
        bits = max_val.bit_length()
        if bits > ZBITS:
            return F.shiftright(col, bits - ZBITS)
        return F.shiftleft(col, ZBITS - bits)

    keys = li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        zvalue(
            norm("l_partkey", int(mx["mp"])), norm("l_suppkey", int(mx["ms"]))
        ).alias("z"),
    )
    span = [
        (F.max("l_partkey") - F.min("l_partkey")).alias("pspan"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("sspan"),
    ]
    zf = keys.groupBy(F.shiftright("z", ZFILE_SHIFT).alias("f")).agg(*span)
    nf = keys.groupBy(
        (F.col("l_orderkey") / NAT_ROWS_PER_FILE).cast("bigint").alias("f")
    ).agg(*span)
    za = zf.agg(
        F.count(F.lit(1)).alias("z_files"),
        F.round(F.avg("pspan"), 2).alias("z_part_span"),
        F.round(F.avg("sspan"), 2).alias("z_supp_span"),
    )
    na = nf.agg(
        F.count(F.lit(1)).alias("nat_files"),
        F.round(F.avg("pspan"), 2).alias("nat_part_span"),
        F.round(F.avg("sspan"), 2).alias("nat_supp_span"),
    )
    return za.crossJoin(F.broadcast(na))
