from .matcher import stream_match_start_end  # noqa: F401
from .kpis import streaming_kpi_daily  # noqa: F401
from .sources import (  # noqa: F401
    finite_replay,
    split_start_end,
    stamp_ascending_mtimes,
    stream_trip_events,
)
