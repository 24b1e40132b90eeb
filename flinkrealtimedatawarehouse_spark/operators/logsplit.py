"""Log parsing, routing and splitting (SURVEY.md §2.3 P1-P3, §2.5 A6).

Reference shape: BaseLogApp parses raw JSON with a dirty side-output
(rt/app/dwd/BaseLogApp.java:46-62), corrects the `is_new` flag against
keyed first-seen state (:64-92), then splits one stream three ways with a
per-element `displays` explode (:94-144). All of it is expressible as
filtered projections of one parsed DataFrame — no custom operators, and
Catalyst collapses the shared parse across the branches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def parse_or_dirty(raw: DataFrame, json_col: str, schema) -> tuple[DataFrame, DataFrame]:
    """P1: parse-or-dirty router (BaseLogApp.java:46-62).

    Returns (clean, dirty) — the same rows the reference routes to its
    "Dirty" side output. PERMISSIVE ``from_json`` does NOT null the struct
    on corrupt input (it yields an all-null struct), so corrupt detection
    uses ``columnNameOfCorruptRecord``: a ``_corrupt`` field is appended to
    the schema and is non-null exactly for unparseable rows.
    """
    from pyspark.sql import types as T

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    with_corrupt = T.StructType(list(schema.fields) + [T.StructField("_corrupt", T.StringType())])
    parsed = raw.withColumn(
        "parsed",
        F.from_json(
            F.col(json_col),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    is_dirty = F.col("parsed").isNull() | F.col("parsed._corrupt").isNotNull()
    clean = parsed.filter(~is_dirty).select(F.col(json_col), F.col("parsed.*")).drop("_corrupt")
    dirty = parsed.filter(is_dirty).select(F.col(json_col))
    return clean, dirty


def delete_filter(cdc: DataFrame, type_col: str = "type") -> DataFrame:
    """P2: drop CDC delete rows (rt/app/dwd/BaseDBApp.java:58-66)."""
    return cdc.filter(F.col(type_col) != F.lit("delete"))


def three_way_split(
    parsed: DataFrame, start_col: Column, displays_col: str | None = "displays"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """P3: start / page / display split (BaseLogApp.java:94-144).

    start  = rows where the start payload is present;
    page   = the complement;
    display = page rows with `displays` exploded (page_id travels with each
    display row, as the reference injects it at :121).
    """
    start = parsed.filter(start_col.isNotNull())
    page = parsed.filter(start_col.isNull())
    if displays_col is None:
        display = page.limit(0)
    else:
        display = page.filter(F.col(displays_col).isNotNull()).select(
            "*", F.explode(displays_col).alias("display")
        )
    return start, page, display


def correct_is_new(
    events: DataFrame,
    key: str,
    ts_col: str,
    is_new_col: str = "is_new",
    tiebreak: str | None = None,
) -> DataFrame:
    """A6: first-seen correction (BaseLogApp.java:64-92).

    Reference semantics, exactly: keyed ValueState is written only by the
    first ``is_new='1'`` event of the key; any later ``is_new='1'`` event
    finds the state set and is rewritten to '0'; an ``is_new='0'`` event is
    never touched (and never writes state). Batch form: among each key's
    '1'-rows, only the earliest keeps '1' — one row_number window over the
    '1'-rows, no join, and '0'-rows pass through untouched (the round-1
    min-date form wrongly *upgraded* pre-existing users).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key, F.col(is_new_col)).orderBy(*order)
    rn = F.row_number().over(w)
    return events.withColumn(
        "is_new_corrected",
        F.when(F.col(is_new_col) != F.lit("1"), F.col(is_new_col)).otherwise(
            F.when(rn == 1, F.lit("1")).otherwise(F.lit("0"))
        ),
    )


def first_seen_table(events: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Compacted first-seen state for A6 at scale: one row per key with its
    earliest '1'-event timestamp — the batch image of the reference's keyed
    ValueState (BaseLogApp.java:67-72; only '1' events write state).

    An incremental pipeline keeps this table instead of re-scanning
    history: `update_first_seen` folds a new batch in with one
    groupBy+merge on the key, so the per-batch cost is O(batch + keys
    touched), not O(history).
    """
    return (
        events.filter(F.col("is_new") == "1")
        .groupBy(key)
        .agg(F.min(ts_col).alias("first_seen_ts"))
    )


def update_first_seen(state: DataFrame, batch: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Fold a new batch into the first-seen table — FIRST WRITE WINS,
    exactly the reference's ValueState (BaseLogApp.java:80-89 never
    overwrites existing state), so a late batch carrying an older event
    does not retroactively change the key's recorded first visit."""
    delta = first_seen_table(batch, key, ts_col)
    return (
        state.withColumnRenamed("first_seen_ts", "_old")
        .join(delta.withColumnRenamed("first_seen_ts", "_new"), key, "full_outer")
        .select(key, F.coalesce("_old", "_new").alias("first_seen_ts"))
    )


def correct_is_new_incremental(
    batch: DataFrame, state: DataFrame, key: str, ts_col: str, is_new_col: str = "is_new"
) -> DataFrame:
    """A6 against the compacted state: a '1' event is kept '1' only if it
    is the key's recorded first-seen '1' event (earliest in its batch AND
    matching the state timestamp); everything else follows the reference
    rules ('0' never upgraded). Matches batch `correct_is_new` on a
    time-ordered replay (tested); under cross-batch event-time disorder it
    matches the reference's arrival-order ValueState instead — the state
    is first-write-wins, so a late-arriving older '1' is demoted exactly
    as BaseLogApp.java:80-89 would demote it."""
    st = state.select(F.col(key), F.col("first_seen_ts"))
    w = Window.partitionBy(key, F.col(is_new_col)).orderBy(F.col(ts_col).asc())
    return (
        batch.join(st, key, "left")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "is_new_corrected",
            F.when(F.col(is_new_col) != F.lit("1"), F.col(is_new_col)).otherwise(
                F.when(
                    (F.col("_rn") == 1)  # ties within a batch: one winner
                    & (
                        F.col("first_seen_ts").isNull()
                        | (F.col(ts_col) == F.col("first_seen_ts"))
                    ),
                    F.lit("1"),
                ).otherwise(F.lit("0"))
            ),
        )
        .drop("first_seen_ts", "_rn")
    )
