"""Map-access and click filters (SURVEY.md §2.3 P6/P7).

P6: the reference filters on map-typed DDL columns in Flink SQL —
``page['last_page_id']='search' AND page['item'] IS NOT NULL``
(rt/app/dws/KeywordStatsApp.java:55-62). Identical syntax works in Spark
SQL over a MapType column; the DataFrame form is below.

P7: keep page views of one page with one item_type —
``page_id='good_detail' and item_type='sku_id'``
(rt/app/dws/ProductStatsApp.java:117-123).

Both are pure narrow filters: pushed to the scan by Catalyst when the map
is a real column, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_access_filter(df: DataFrame, map_col: str, eq: dict[str, str],
                      not_null: list[str] | None = None) -> DataFrame:
    """P6: equality predicates + IS NOT NULL predicates on map keys."""
    cond: Column = F.lit(True)
    for k, v in eq.items():
        cond = cond & (F.col(map_col)[k] == F.lit(v))
    for k in not_null or []:
        cond = cond & F.col(map_col)[k].isNotNull()
    return df.filter(cond)


def click_filter(df: DataFrame, page_id_col: str, item_type_col: str,
                 page_id: str, item_type: str) -> DataFrame:
    """P7: the good_detail/sku_id click filter."""
    return df.filter((F.col(page_id_col) == page_id) & (F.col(item_type_col) == item_type))
