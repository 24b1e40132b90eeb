"""Canonical layer/table naming (SURVEY.md §3.2 / §7.2 item 6).

The reference has a live topic-name mismatch: `OrderWideApp` WRITES
``dwd_order_wide`` (rt/app/dwd/OrderWideApp.java:48) while
`ProvinceStatsSQLApp` READS ``dwm_order_wide``
(rt/app/dws/ProvinceStatsSQLApp.java:49); its README likewise calls the
unique-visit / user-jump outputs ``dwm_*`` while the apps write
``dwd_*``. Working by string convention across nine separate JVMs is
exactly how that happens. Here every inter-stage name is defined ONCE;
pipeline compositions route writes and reads through these constants
(see tests/test_gmall_log_pipeline.py's multi_sink stage), so a rename
is one edit and a producer/consumer mismatch cannot arise silently.

Chosen names follow the reference's intended semantics (``dwm_`` for the
derived middle-layer streams, per its own README) mapped onto medallion
layers: ods -> bronze, dwd/dwm -> silver, dws -> gold, ads -> serving
views.
"""

from __future__ import annotations

# bronze: raw ingests
ODS_BASE_LOG = "ods_base_log"
ODS_BASE_DB = "ods_base_db"

# silver: parsed facts + derived middle-layer streams
DWD_START_LOG = "dwd_start_log"
DWD_PAGE_LOG = "dwd_page_log"
DWD_DISPLAY_LOG = "dwd_display_log"
DWM_UNIQUE_VISIT = "dwm_unique_visit"       # reference app writes dwd_*; README says dwm_*
DWM_USER_JUMP_DETAIL = "dwm_user_jump_detail"
DWM_ORDER_WIDE = "dwm_order_wide"           # the mismatched pair, fixed on the dwm_ side
DWM_PAYMENT_WIDE = "dwm_payment_wide"

# gold: the four stat tables
DWS_VISITOR_STATS = "dws_visitor_stats"
DWS_PRODUCT_STATS = "dws_product_stats"
DWS_PROVINCE_STATS = "dws_province_stats"
DWS_KEYWORD_STATS = "dws_keyword_stats"

LAYER_OF = {
    **{t: "bronze" for t in (ODS_BASE_LOG, ODS_BASE_DB)},
    **{
        t: "silver"
        for t in (
            DWD_START_LOG, DWD_PAGE_LOG, DWD_DISPLAY_LOG,
            DWM_UNIQUE_VISIT, DWM_USER_JUMP_DETAIL,
            DWM_ORDER_WIDE, DWM_PAYMENT_WIDE,
        )
    },
    **{
        t: "gold"
        for t in (
            DWS_VISITOR_STATS, DWS_PRODUCT_STATS,
            DWS_PROVINCE_STATS, DWS_KEYWORD_STATS,
        )
    },
}

# the reference names each constant replaces (producer-side vs consumer-side
# where they disagreed) — kept for parity auditing
REFERENCE_ALIASES = {
    DWM_ORDER_WIDE: ("dwd_order_wide", "dwm_order_wide"),
    DWM_UNIQUE_VISIT: ("dwd_unique_visit", "dwm_unique_visit"),
    DWM_USER_JUMP_DETAIL: ("dwd_user_jump_detail", "dwm_user_jump_detail"),
}
