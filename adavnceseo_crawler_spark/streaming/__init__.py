from .availablenow import stream_crawl_log  # noqa: F401
