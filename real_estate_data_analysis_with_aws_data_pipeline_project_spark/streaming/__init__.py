from .jobs import (
    QUANTILE_ACCURACY,
    RATE_LIMIT_THRESHOLD,
    SESSION_GAP_US,
    streaming_click_purchase_join,
    streaming_dedup_events,
    streaming_ohlc_bars,
    streaming_rate_limit_windows,
    streaming_session_window,
    streaming_stateful_user_stats,
    streaming_tumbling_counts,
    streaming_user_activity_tws,
    streaming_window_quantiles,
)

__all__ = [
    "QUANTILE_ACCURACY",
    "RATE_LIMIT_THRESHOLD",
    "SESSION_GAP_US",
    "streaming_click_purchase_join",
    "streaming_dedup_events",
    "streaming_ohlc_bars",
    "streaming_rate_limit_windows",
    "streaming_session_window",
    "streaming_stateful_user_stats",
    "streaming_tumbling_counts",
    "streaming_user_activity_tws",
    "streaming_window_quantiles",
]
