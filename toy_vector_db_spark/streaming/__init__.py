from .events import (  # noqa: F401
    EVENTS_DDL, dedup_stream, hourly_rollup_stream, read_event_stream,
    run_to_memory, sessionize_stream,
)
from .index_ingest import (  # noqa: F401
    encode_index_stream, load_fresh, start_index_ingest,
)
from .search import (  # noqa: F401
    read_search_results, score_query_stream, start_streaming_search,
)
