from .availablenow import stream_crawl_log  # noqa: F401
from .dedup_stream import dedup_docs_stream, stream_dedup_documents  # noqa: F401
