from . import htmlparse, scoring, textstats, urls  # noqa: F401
