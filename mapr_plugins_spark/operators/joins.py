"""Custom join strategies Spark lacks natively.

* :func:`asof_join` — "last value at or before t" time-series join
  (SURVEY §2 Part B, custom row). Implemented as union + running
  last-non-null window: ONE shuffle on (key), no pair blow-up, no
  Python. This is the plan that survives scale — a naive range join
  would be O(left × right) within key; this is O((left+right) log)
  via sort within key partitions.

* :func:`range_join_binned` — non-equi interval join accelerated by
  bucketing the range dimension so the join has an equi component
  (bin), turning BNLJ into a hash join; Catalyst prunes the residual
  predicate. Correctness is identical to the plain non-equi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right-side values at or
    before (``direction="backward"``, default) or at or after
    (``"forward"``) the left ``on``, within the same ``by`` group —
    pandas ``merge_asof`` semantics, as one union + running
    last-non-null window (ONE shuffle on the key, no pair blow-up, no
    Python at any group size).

    ``tolerance_us`` nulls the attached values when the matched right
    row is farther than the tolerance — the merge_asof ``tolerance``
    contract: the row still appears, unmatched. Units: microseconds
    for timestamp ``on`` columns; the column's OWN units for integral
    ``on`` columns; any other ``on`` type raises (a silent
    ``cast("timestamp")`` would read numerics as seconds and mis-scale
    the gap by 1e6).

    ``right`` must be unique per (by, on) — pre-aggregate if not.
    Ties at equal ``on`` resolve to the right row (inclusive)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    l = left.select(*lcols, F.lit(1).alias("__is_left"))
    rv_cols = [*value_cols, *([on] if tolerance_us is not None else [])]
    r = right.select(
        F.col(by),
        F.col(on),
        *[F.col(c) for c in value_cols],
        F.lit(0).alias("__is_left"),
    )
    # align schemas: left rows carry null right-values, and vice versa
    for c in value_cols:
        l = l.withColumn(f"__rv_{c}", F.lit(None).cast(right.schema[c].dataType))
    if tolerance_us is not None:
        l = l.withColumn(f"__rv_{on}", F.lit(None).cast(right.schema[on].dataType))
    r2 = r.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in (by, on) else F.col(c)
            for c in lcols
        ],
        F.col("__is_left"),
        *[F.col(c).alias(f"__rv_{c}") for c in rv_cols],
    )
    unioned = l.select(*lcols, "__is_left", *[f"__rv_{c}" for c in rv_cols]).unionByName(r2)

    # scan order: backward ascends, forward descends — either way the
    # running last-non-null is the nearest eligible right row, and
    # right rows sort before left rows at equal ``on`` → inclusive
    on_sorted = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(by)
        .orderBy(on_sorted, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"__rv_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in rv_cols
        ],
    )
    out = filled.filter(F.col("__is_left") == 1)
    if tolerance_us is not None:
        from pyspark.sql import types as T

        on_type = right.schema[on].dataType
        if isinstance(on_type, (T.TimestampType, T.TimestampNTZType)):
            lus = F.unix_micros(F.col(on).cast("timestamp"))
            rus = F.unix_micros(F.col(f"{on}{suffix}").cast("timestamp"))
        elif isinstance(on_type, T.IntegralType):
            # numeric ``on``: compare in the column's own units — a
            # timestamp cast would interpret the value as SECONDS and
            # mis-scale the microsecond tolerance by 1e6 silently
            lus = F.col(on).cast("long")
            rus = F.col(f"{on}{suffix}").cast("long")
        else:
            raise TypeError(
                f"asof_join tolerance requires a timestamp or integral 'on' "
                f"column; got {on_type.simpleString()} for {on!r}"
            )
        gap = (lus - rus) if direction == "backward" else (rus - lus)
        ok = F.col(f"{on}{suffix}").isNotNull() & (gap <= F.lit(int(tolerance_us)))
        out = out.select(
            *lcols,
            "__is_left",
            *[f"__rv_{c}" for c in rv_cols],
            f"{on}{suffix}",
            *[
                F.when(ok, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in value_cols
            ],
        ).drop(f"{on}{suffix}")
    return out.drop("__is_left", *[f"__rv_{c}" for c in rv_cols])


def overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width: int,
) -> DataFrame:
    """Interval-overlap join ([lo, hi) vs [lo, hi)) with a bin equi-key.

    Both sides explode their span to overlapping bins; the hash join on
    the bin replaces the BNLJ a plain ``l_lo < r_hi AND r_lo < l_hi``
    predicate would get. A pair sharing k bins would appear k times, so
    instead of a dedup shuffle we keep each pair only in its canonical
    bin — the bin of ``greatest(l_lo, r_lo)`` (the overlap start, which
    by construction lies in both spans): exact semantics, zero extra
    exchanges beyond the one hash join.
    """

    def bins(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    (F.col(lo) / bin_width).cast("long"), (F.col(hi) / bin_width).cast("long")
                )
            ),
        )

    lb, rb = bins(left, l_lo, l_hi), bins(right, r_lo, r_hi)
    canonical = (F.greatest(F.col(l_lo), F.col(r_lo)) / bin_width).cast("long")
    return (
        lb.join(rb, "__bin")
        .filter((F.col(l_lo) < F.col(r_hi)) & (F.col(r_lo) < F.col(l_hi)))
        .filter(F.col("__bin") == canonical)
        .drop("__bin")
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
) -> DataFrame:
    """Join left points into right [lo, hi) intervals using bin buckets
    as an equi key. Interval spans are exploded to every overlapping
    bin; the residual predicate keeps exact semantics.

    Requires interval width mostly ≤ a few bins for the explode to stay
    cheap — pick ``bin_width`` near the median interval length.
    """
    lb = left.withColumn("__bin", (F.col(left_point) / bin_width).cast("long"))
    rb = right.withColumn(
        "__bins",
        F.sequence(
            (F.col(right_lo) / bin_width).cast("long"),
            (F.col(right_hi) / bin_width).cast("long"),
        ),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")
    return lb.join(rb, "__bin").filter(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    ).drop("__bin")


def spatial_join_gridded(
    pts: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All point pairs within ``radius`` (planar euclidean) via
    GRID-CELL bucketing — the classic fixed-grid spatial join. Each
    point lands in cell (x div r, y div r); any pair within r is
    either in the same cell or in adjacent cells, so candidates come
    from an EQUI join of one side (exploded to its 3×3 neighborhood)
    against the other side's home cell, and the exact squared-distance
    filter prunes the residual. Coordinates are integers, so dist_sq
    is exact BIGINT arithmetic — engine-portable bit-for-bit.

    Scale shape: the O(n²) cross join becomes one hash/sort-merge
    shuffle on the cell key; the 9× neighbor explode multiplies only
    the probe-side row count, never the pair space. Skewed cells
    (urban hotspots) are the known hazard — AQE skew-join or a finer
    grid splits them. Each qualifying pair is emitted exactly once
    (``id_a < id_b``)."""
    p = pts.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    r = int(radius)
    home = p.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr(f"x DIV {r}").alias("cx"),
        F.expr(f"y DIV {r}").alias("cy"),
    )
    cells = ", ".join(
        f"struct({ox} AS ox, {oy} AS oy)" for ox in (-1, 0, 1) for oy in (-1, 0, 1)
    )
    offsets = F.expr(f"explode(array({cells}))")
    probe = p.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        offsets.alias("o"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.expr("xa DIV " + str(r)) + F.col("o.ox")).alias("cx"),
        (F.expr("ya DIV " + str(r)) + F.col("o.oy")).alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(home, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_sq", d2.cast("long"))
        .filter(F.col("dist_sq") <= r * r)
        .select("id_a", "id_b", "dist_sq")
    )
