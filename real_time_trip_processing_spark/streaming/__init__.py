from .matcher import stream_match_start_end  # noqa: F401
from .kpis import streaming_kpi_daily  # noqa: F401
from .sources import stream_trip_events, split_start_end  # noqa: F401
