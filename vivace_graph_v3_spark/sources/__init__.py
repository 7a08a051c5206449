"""Storage layout connectors: plain parquet projections (graph.py), the
bucketed layout for shuffle-free adjacency joins at scale, JSONL/CSV
interchange (formats.py), and the WARC web-archive Python Data Source
(warc.py)."""

from vivace_graph_v3_spark.sources.bucketed import (  # noqa: F401
    load_bucketed_graph, save_bucketed_graph,
)
from vivace_graph_v3_spark.sources.formats import (  # noqa: F401
    read_documents, write_documents,
)
from vivace_graph_v3_spark.sources.warc import WarcDataSource  # noqa: F401
